package graft.cdc

import java.nio.file.{Files, Path, Paths}
import scala.sys.process._

/** A REAL PostgreSQL 15 server for interop pinning — the same posture
  * as the stock-OpenSSH/-psql suites: every live client in the repo is
  * otherwise proven only against in-process fixture servers that share
  * the codec, so a symmetric encode/decode bug could hide. The fixture
  * initdb's a throwaway cluster with `wal_level=logical` (the
  * reference's required source posture, docs "enable logical
  * replication"), starts it on a free TCP port, and tears it down with
  * the suite.
  *
  * PostgreSQL refuses to run as root; when the test JVM is root (this
  * container), every server-side command is wrapped in
  * `setpriv --reuid=nobody` with the data dir owned by nobody. Suites
  * `assume` on [[StockPostgres.start]] returning Some — no binaries or
  * no privilege-switch (sandboxed run) cancels rather than fails.
  */
object StockPostgres {

  private val Bin = "/usr/local/bin"
  private def binOk = Files.exists(Paths.get(s"$Bin/initdb")) &&
    Files.exists(Paths.get(s"$Bin/pg_ctl")) &&
    Files.exists(Paths.get(s"$Bin/postgres"))

  private def isRoot: Boolean =
    System.getProperty("user.name") == "root"

  /** Wrap a server-side command for the unprivileged user when running
    * as root (postgres refuses root outright). */
  private def wrap(cmd: Seq[String]): Seq[String] =
    if (isRoot)
      Seq("setpriv", "--reuid=nobody", "--regid=nogroup",
        "--clear-groups") ++ cmd
    else cmd

  final class Server private[StockPostgres] (
      val baseDir: Path, val port: Int) {

    val dataDir: Path = baseDir.resolve("data")

    /** Run one SQL string through stock psql (client side runs as the
      * JVM user; only the server needs the uid switch). Returns stdout
      * with `-At` tuples-only formatting; throws on non-zero exit. */
    def psql(sql: String, db: String = "postgres"): String = {
      val out = new StringBuilder
      val err = new StringBuilder
      val code = Process(Seq("/usr/bin/psql", "-h", "127.0.0.1",
        "-p", port.toString, "-U", "postgres", "-d", db,
        "-v", "ON_ERROR_STOP=1", "-At", "-c", sql))
        .!(ProcessLogger(l => out.append(l).append('\n'),
          l => err.append(l).append('\n')))
      require(code == 0, s"psql failed ($code): $err\nsql: $sql")
      out.toString
    }

    /** pg_ctl reload (after pg_hba edits). */
    def reload(): Unit = {
      val code = Process(wrap(Seq(s"$Bin/pg_ctl", "-D",
        dataDir.toString, "reload"))).!(ProcessLogger(_ => ()))
      require(code == 0, "pg_ctl reload failed")
    }

    /** Replace pg_hba.conf wholesale (specific-user lines must precede
      * the catch-all trust lines — first match wins) and reload. */
    def setHba(lines: Seq[String]): Unit = {
      val hba = dataDir.resolve("pg_hba.conf")
      Files.write(hba, lines.mkString("\n").getBytes)
      reload()
    }

    def stop(): Unit = {
      Process(wrap(Seq(s"$Bin/pg_ctl", "-D", dataDir.toString,
        "-m", "immediate", "stop"))).!(ProcessLogger(_ => ()))
      // best-effort cleanup; the dir is under the system tmpdir
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p))
          Files.list(p).forEach(rm(_))
        try Files.deleteIfExists(p) catch { case _: Exception => () }
      }
      rm(baseDir)
    }
  }

  /** The default hba set written at start: trust for everything local
    * (including replication sessions), so tests opt INTO stricter auth
    * per-user via [[Server.setHba]]. */
  def trustHba: Seq[String] = Seq(
    "host all all 127.0.0.1/32 trust",
    "host replication all 127.0.0.1/32 trust",
    "local all all trust",
    "local replication all trust")

  /** initdb + configure + start. None when the environment can't run a
    * server (missing binaries, no setpriv capability, startup failure)
    * — callers `assume` on it. */
  def start(extraConf: Seq[String] = Nil): Option[Server] = {
    if (!binOk) return None
    try {
      val base = Files.createTempDirectory("stockpg")
      // nobody must traverse into the dir (tmp dirs default 0700)
      base.toFile.setReadable(true, false)
      base.toFile.setExecutable(true, false)
      base.toFile.setWritable(true, false)
      val data = base.resolve("data")

      val initCode = Process(wrap(Seq(s"$Bin/initdb", "-D",
        data.toString, "-U", "postgres", "--auth=trust",
        "--no-sync", "-E", "UTF8"))).!(ProcessLogger(_ => ()))
      if (initCode != 0) { new Server(base, 0).stop(); return None }

      val port = {
        val s = new java.net.ServerSocket(0)
        try s.getLocalPort finally s.close()
      }
      // logical WAL + fast keepalives: the one-pull drain discipline
      // reads "a keepalive with no data since the last one" as caught
      // up, and stock PG keepalives at wal_sender_timeout/2 — the
      // 2s setting keeps each AvailableNow pull to a few seconds
      val conf = Seq(
        "wal_level=logical",
        "max_wal_senders=10",
        "max_replication_slots=10",
        "listen_addresses='127.0.0.1'",
        s"port=$port",
        s"unix_socket_directories='${base.toString}'",
        "wal_sender_timeout='2s'",
        // fsync off keeps the throwaway cluster fast; synchronous_commit
        // stays ON — logical decoding streams only FLUSHED WAL, so an
        // async commit can look like "no backlog" to a one-pull drain
        "fsync=off",
        "log_min_messages=warning") ++ extraConf
      Files.write(data.resolve("postgresql.conf"),
        (Files.readAllLines(data.resolve("postgresql.conf"))
          .toArray.mkString("\n") + "\n" + conf.mkString("\n") + "\n")
          .getBytes)
      val srv = new Server(base, port)
      // hba before start: the initdb default covers local trust only
      Files.write(data.resolve("pg_hba.conf"),
        trustHba.mkString("\n").getBytes)
      if (isRoot) {
        // config files must stay readable by the server user
        Seq("postgresql.conf", "pg_hba.conf").foreach { f =>
          data.resolve(f).toFile.setReadable(true, false)
        }
      }
      val log = base.resolve("server.log")
      val startCode = Process(wrap(Seq(s"$Bin/pg_ctl", "-D",
        data.toString, "-l", log.toString, "-w", "-t", "30",
        "start"))).!(ProcessLogger(_ => ()))
      if (startCode != 0) { srv.stop(); return None }
      // one probe query proves the TCP path end to end
      srv.psql("SELECT 1")
      Some(srv)
    } catch {
      case _: Exception => None
    }
  }
}
