package graft.mirror

import java.nio.charset.StandardCharsets.UTF_8

import graft.cdc.CaptureEndpoint

/** Schema migration for PG→PG mirrors: stream a schema-only `pg_dump`
  * of the source straight into `psql` on the destination — the
  * destination gets the FULL source schema (constraints, defaults,
  * indexes, sequences) instead of the engine's minimal generated
  * tables. Restates the reference's pg_dump activity
  * (flow/connectors/postgres/pgdump_schema.go:1-397; wired by
  * setup_flow.go:249-275 for PG-type pairs):
  *
  *  - `pg_dump --schema-only --no-owner --no-privileges` — ownership
  *    and grants never transfer (the destination role owns
  *    everything), so dumps from no-privilege sources apply cleanly;
  *  - `psql --single-transaction -v ON_ERROR_STOP=1 --quiet` —
  *    partial failures roll back (safely retryable) AND a failed
  *    statement actually fails the run (psql otherwise exits 0 with
  *    errors on stderr);
  *  - newer pg_dump emits statements older destinations reject
  *    (`SET transaction_timeout` is PG17+; `\restrict`/`\unrestrict`
  *    are pg_dump 17.6+ replay guards) — they are session/replay
  *    housekeeping, dropped on the wire so ON_ERROR_STOP stays armed
  *    for genuine DDL failures.
  *
  * The dump rides the OS binaries' own connections, so peers behind
  * the engine's in-process SSH tunnel cannot use it — [[migrate]]
  * returns false (skipped) and callers fall back to engine-created
  * tables, exactly the reference's SshConfig/non-password skip.
  */
object PgDumpSchema {

  /** Dropped-on-the-wire statements (pgdump_schema.go:21-30). */
  private[mirror] def incompatible(line: String): Boolean =
    line.matches("(?s)^(SET\\s+transaction_timeout\\s*=.*|" +
      "\\\\(?:un)?restrict(\\s.*|))$")

  private def args(bin: String, ep: CaptureEndpoint,
      extra: Seq[String]): Seq[String] =
    Seq(bin) ++ extra ++ Seq(
      "-h", ep.host, "-p", ep.port.toString, "-d", ep.database) ++
      (if (ep.user.nonEmpty) Seq("-U", ep.user) else Nil)

  /** Drain a stream on its own thread (a full pipe would deadlock the
    * child). */
  private def drain(in: java.io.InputStream): (Thread, StringBuilder) = {
    val sb = new StringBuilder
    val t = new Thread(() => {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        sb.append(new String(buf, 0, n, UTF_8)); n = in.read(buf)
      }
    })
    t.setDaemon(true); t.start()
    (t, sb)
  }

  /** Run the migration; true = ran to completion, false = skipped
    * (tunneled peer or binaries absent). Throws on a non-zero exit
    * from either side, with its stderr. */
  def migrate(srcUrl: String, dstUrl: String,
      pgDumpBin: String = "pg_dump", psqlBin: String = "psql"): Boolean = {
    val src = CaptureEndpoint.parse(srcUrl)
    val dst = CaptureEndpoint.parse(dstUrl)
    if (src.params.contains("ssh") || dst.params.contains("ssh"))
      return false

    val dumpCmd = args(pgDumpBin, src,
      Seq("--schema-only", "--no-owner", "--no-privileges"))
    val psqlCmd = args(psqlBin, dst, Seq("--single-transaction",
      "-v", "ON_ERROR_STOP=1", "--quiet"))

    val pbSrc = new ProcessBuilder(dumpCmd: _*)
    pbSrc.environment.put("PGPASSWORD", src.password)
    val pbDst = new ProcessBuilder(psqlCmd: _*)
    pbDst.environment.put("PGPASSWORD", dst.password)

    // destination first, so it is ready to read when the dump streams
    val pDst =
      try pbDst.start()
      catch { case _: java.io.IOException => return false } // no psql
    val pSrc =
      try pbSrc.start()
      catch {
        case _: java.io.IOException => // no pg_dump
          pDst.destroy(); return false
      }
    val (dumpErrT, dumpErr) = drain(pSrc.getErrorStream)
    val (psqlErrT, psqlErr) = drain(pDst.getErrorStream)
    val (psqlOutT, _) = drain(pDst.getInputStream)

    // the filter bridge: dump stdout → (line filter) → psql stdin;
    // closing psql's stdin at EOF is what lets it finish
    val br = new java.io.BufferedReader(
      new java.io.InputStreamReader(pSrc.getInputStream, UTF_8))
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(pDst.getOutputStream, UTF_8))
    try {
      var line = br.readLine()
      while (line != null) {
        if (!incompatible(line)) { out.write(line); out.write("\n") }
        line = br.readLine()
      }
    } catch {
      // psql dying early breaks the pipe mid-write: swallow the EPIPE
      // so the exit-code check below reports psql's actual stderr
      // instead of a bare "Broken pipe"
      case _: java.io.IOException => ()
    }

    // pg_dump's exit code decides BEFORE psql's stdin closes: a dump
    // that died mid-stream looks like a clean EOF to psql, which
    // would COMMIT the half schema under --single-transaction —
    // killing psql instead aborts its transaction server-side, so a
    // failed migration stays retryable (the docstring's contract)
    val srcCode = pSrc.waitFor()
    if (srcCode != 0) {
      pDst.destroyForcibly()
      pDst.waitFor()
      dumpErrT.join(5000)
      throw new java.io.IOException(
        s"pg_dump exited $srcCode: ${dumpErr.toString.trim}")
    }
    try out.close()
    catch { case scala.util.control.NonFatal(_) => () }
    val dstCode = pDst.waitFor()
    dumpErrT.join(5000); psqlErrT.join(5000); psqlOutT.join(5000)
    if (dstCode != 0) throw new java.io.IOException(
      s"psql (schema apply) exited $dstCode: ${psqlErr.toString.trim}")
    true
  }
}
