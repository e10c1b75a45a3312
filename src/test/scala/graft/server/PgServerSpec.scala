package graft.server

import org.apache.spark.sql.SparkSession

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.model.ChangeRecord

/** The pgwire front-end end-to-end over REAL sockets: the repo's own
  * [[PgClient]] (sharing [[graft.cdc.PgWire]]'s codecs) drives
  * [[PgServer]] through startup/auth, the simple protocol (graft DDL,
  * mirrors, cursors, operators), and the extended protocol (prepared
  * statements, parameters, portal suspension) — the UX the reference
  * ships as `psql` into nexus (`nexus/server/src/main.rs`). */
class PgServerSpec extends SparkSpec {

  private def withGraftSession[A](f: SparkSession => A): A = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new graft.mirror.GraftExtensions)
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  private def withServer[A](users: Map[String, String] = Map.empty)(
      f: (SparkSession, PgServer) => A): A = withGraftSession { s =>
    val srv = new PgServer(s, users = users).start()
    try f(s, srv)
    finally srv.stop()
  }

  test("simple protocol: SELECT rows, multi-statement, empty query, " +
    "NULL/bool/array text encoding") {
    withServer() { (_, srv) =>
      val c = new PgClient("127.0.0.1", srv.port).connect()
      try {
        val r = c.query(
          "SELECT id, id * 2 AS dbl FROM range(3) ORDER BY id")
        assert(r.columns == Seq("id", "dbl"))
        assert(r.rows == Seq(
          Seq(Some("0"), Some("0")),
          Seq(Some("1"), Some("2")),
          Seq(Some("2"), Some("4"))))
        assert(r.tag == "SELECT 3")

        // several statements per Query message, one result each
        val all = c.queryAll("SELECT 1 AS a; SELECT 2 AS b")
        assert(all.map(_.rows.head.head.get) == Seq("1", "2"))

        assert(c.queryAll("   ").map(_.tag) == Seq(""))

        // PG text conventions: t/f booleans, {…} arrays, NULL as None
        val enc = c.query("SELECT true AS t, false AS f, " +
          "array(1, 2, 3) AS arr, CAST(NULL AS STRING) AS n, " +
          "'a b' AS ws")
        assert(enc.rows.head ==
          Seq(Some("t"), Some("f"), Some("{1,2,3}"), None,
            Some("a b")))
      } finally c.close()
    }
  }

  test("error recovery: a failing statement answers ErrorResponse, " +
    "the session stays usable") {
    withServer() { (_, srv) =>
      val c = new PgClient("127.0.0.1", srv.port).connect()
      try {
        val e = intercept[PgClient.PgServerError](
          c.query("SELECT * FROM nonexistent_table_xyz"))
        assert(e.getMessage.toLowerCase.contains("nonexistent") ||
          e.getMessage.nonEmpty)
        // ReadyForQuery was reached: the next statement succeeds
        assert(c.query("SELECT 41 + 1 AS v").rows.head.head
          .contains("42"))
        // multi-statement: failure skips the remainder (like PG)
        val e2 = intercept[PgClient.PgServerError](
          c.queryAll("SELECT bad_col FROM range(1); SELECT 1"))
        assert(e2.getMessage.nonEmpty)
        assert(c.query("SELECT 7 AS v").rows.head.head.contains("7"))
      } finally c.close()
    }
  }

  test("graft DDL over the wire: CREATE PEER/MIRROR, EXECUTE MIRROR, " +
    "SHOW MIRRORS/OPERATORS, RUN OPERATOR … LIMIT") {
    withServer() { (s, srv) =>
      val wal = tmpDir("pgsrvwal")
      val base = tmpDir("pgsrvmirror")
      ChangeLogWal.append(wal, Seq(
        ChangeRecord(0, 1, "1", 1000, 1, "t", "d",
          """{"id":1,"v":10}""", null, Nil),
        ChangeRecord(0, 2, "2", 2000, 2, "t", "d",
          """{"id":2,"v":20}""", null, Nil)))
      val c = new PgClient("127.0.0.1", srv.port).connect()
      try {
        assert(c.query(
          "CREATE PEER wirepeer TYPE parquet OPTIONS (path '/x')")
          .tag == "CREATE PEER")
        assert(c.query("SHOW PEERS").rows
          .exists(_.head.contains("wirepeer")))

        c.query(s"""CREATE MIRROR m_wire WITH (
                   |  wal_dir '$wal', dest_dir '$base/dest',
                   |  checkpoint_dir '$base/ckpt', pk 'id', table 'd',
                   |  schema 'id BIGINT, v BIGINT')""".stripMargin)
        val moved = c.query("EXECUTE MIRROR m_wire")
        assert(moved.columns == Seq("rows_moved"))
        // CDC drains report -1 (stream metrics carry counts); the
        // destination contents below are the real assertion
        assert(moved.rows.head.head.contains("-1"))
        assert(c.query("SHOW MIRRORS").rows
          .exists(_.head.contains("m_wire")))
        // the mirrored table is queryable in the same session
        val dest = c.query(s"SELECT id, v FROM parquet.`$base/dest` " +
          "WHERE NOT _peerdb_is_deleted ORDER BY id")
        assert(dest.rows == Seq(
          Seq(Some("1"), Some("10")), Seq(Some("2"), Some("20"))))

        // the operator registry: an oracle query through the wire
        val ops = c.query("SHOW OPERATORS")
        assert(ops.rows.exists(_.head.contains("q1_agg")))
        val q1 = c.query("RUN OPERATOR q1_agg USING " +
          "'/root/testdata/sf0.001' LIMIT 5")
        assert(q1.columns.contains("l_returnflag"))
        assert(q1.rows.nonEmpty && q1.rows.size <= 5)
      } finally c.close()
    }
  }

  test("cursors over the wire: DECLARE / FETCH pages / CLOSE, and " +
    "prepared EXECUTE substitution") {
    withServer() { (_, srv) =>
      val c = new PgClient("127.0.0.1", srv.port).connect()
      try {
        c.query("DECLARE wcur CURSOR FOR " +
          "SELECT id FROM range(100) ORDER BY id")
        val p1 = c.query("FETCH 40 FROM wcur")
        assert(p1.rows.size == 40 && p1.rows.head.head.contains("0"))
        assert(p1.tag == "FETCH 40")
        val p2 = c.query("FETCH 40 FROM wcur")
        assert(p2.rows.head.head.contains("40"))
        val rest = c.query("FETCH ALL FROM wcur")
        assert(rest.rows.size == 20)
        assert(c.query("FETCH 5 FROM wcur").rows.isEmpty) // drained
        c.query("CLOSE wcur")
        intercept[PgClient.PgServerError](c.query("FETCH 1 FROM wcur"))

        // server-side PREPARE/EXECUTE (the proxy's text substitution)
        c.query("PREPARE ptimes AS SELECT id * $1 AS v " +
          "FROM range(3) ORDER BY id")
        val ex = c.query("EXECUTE ptimes (3)")
        assert(ex.rows.map(_.head.get) == Seq("0", "3", "6"))
        c.query("DEALLOCATE PREPARE ptimes")
      } finally c.close()
    }
  }

  test("extended protocol: Parse/Bind parameters, Describe, Execute " +
    "maxRows with PortalSuspended resume, Close") {
    withServer() { (_, srv) =>
      val c = new PgClient("127.0.0.1", srv.port).connect()
      try {
        c.parse("st1",
          "SELECT id FROM range(10) WHERE id >= $1 ORDER BY id")
        c.describeStatement("st1")
        c.bind("po1", "st1", Seq(Some("4")))
        c.describePortal("po1")
        c.execute("po1", maxRows = 4)
        val first = c.sync()
        // one suspended result carrying the first 4 matching rows
        assert(first.last.tag == "SUSPENDED")
        assert(first.last.rows.map(_.head.get) ==
          Seq("4", "5", "6", "7"))
        // resume the SAME portal — cursor statefulness across Syncs
        c.execute("po1", maxRows = 4)
        val second = c.sync()
        assert(second.last.rows.map(_.head.get) == Seq("8", "9"))
        assert(second.last.tag == "SELECT 6") // total emitted
        c.closePortal("po1")
        c.closeStatement("st1")
        c.sync()

        // NULL parameter and the unnamed statement/portal
        c.parse("", "SELECT $1 AS v")
        c.bind("", "", Seq(None))
        c.execute("")
        val r = c.sync()
        assert(r.last.rows.head.head.isEmpty)

        // graft DDL through the extended path (drivers prepare
        // everything): a command with no rows completes with its tag
        c.parse("", "SHOW MIRRORS")
        c.bind("", "")
        c.execute("")
        assert(c.sync().last.tag == "SHOW MIRRORS")
      } finally c.close()
    }
  }

  test("statement splitting: semicolons inside quotes, line/block " +
    "comments and dollar quotes do not split; comment-only " +
    "fragments are not statements") {
    import PgServer.splitStatements
    assert(splitStatements("SELECT 1; SELECT 2") ==
      Seq("SELECT 1", "SELECT 2"))
    assert(splitStatements("SELECT 'a;b'") == Seq("SELECT 'a;b'"))
    assert(splitStatements("SELECT 1; -- done") == Seq("SELECT 1"))
    assert(splitStatements("SELECT /* ; */ 1") ==
      Seq("SELECT /* ; */ 1"))
    assert(splitStatements("SELECT 1 -- c ; c\n + 1") ==
      Seq("SELECT 1 -- c ; c\n + 1"))
    assert(splitStatements("SELECT $$a;b$$") == Seq("SELECT $$a;b$$"))
    assert(splitStatements("SELECT $tag$x;y$tag$; SELECT 2") ==
      Seq("SELECT $tag$x;y$tag$", "SELECT 2"))
    assert(splitStatements("/* only */ ; SELECT 3") == Seq("SELECT 3"))
  }

  test("bind parameters containing $n or quotes substitute safely " +
    "(one-pass, no re-scan of substituted values)") {
    withServer() { (_, srv) =>
      val c = new PgClient("127.0.0.1", srv.port).connect()
      try {
        c.parse("", "SELECT $1 AS a, $2 AS b")
        c.bind("", "", Seq(Some("x"), Some("cost $1 is 'high'")))
        c.execute("")
        val r = c.sync().last.rows.head
        assert(r == Seq(Some("x"), Some("cost $1 is 'high'")))
      } finally c.close()
    }
  }

  test("$n inside string literals and comments is TEXT, not a " +
    "parameter (PG lexer semantics) — substitution, the Describe " +
    "parameter count, and the NULL probe all agree") {
    import PgServer.{paramIndexes, substituteParams}
    // lexer blindness: literals, line/block comments, dollar quotes
    val sql = "SELECT 'costs $1' AS lit, $1 AS p -- not $9\n" +
      "/* nor $8 */ , $$body $7$$ AS dq, \"col$6\" FROM t"
    assert(paramIndexes(sql) == Seq(0))
    val sub = substituteParams(sql,
      i => if (i == 0) Some("'X'") else None)
    assert(sub.contains("'costs $1'"), "literal $1 must stay text")
    assert(sub.contains("'X' AS p"), "the real $1 substitutes")
    assert(sub.contains("not $9") && sub.contains("nor $8") &&
      sub.contains("$$body $7$$") && sub.contains("\"col$6\""))
    // $1 adjacent to a later $ is a parameter, never a dollar tag
    // (tags follow the identifier rule: no leading digit)
    assert(substituteParams("SELECT $1 + $2",
      i => Some(s"<${i + 1}>")) == "SELECT <1> + <2>")
    // out-of-range placeholders stay verbatim (PG errors at Bind)
    assert(substituteParams("SELECT $5", _ => None) == "SELECT $5")
    // end to end: a literal containing $1 must NOT consume the bind
    // value while the real $1 does
    withServer() { (_, srv) =>
      val c = new PgClient("127.0.0.1", srv.port).connect()
      try {
        c.parse("", "SELECT 'costs $1' AS lit, $1 AS p")
        c.bind("", "", Seq(Some("bound")))
        c.execute("")
        val row = c.sync().last.rows.head
        assert(row == Seq(Some("costs $1"), Some("bound")))
      } finally c.close()
    }
  }

  test("BINARY-format bind parameters decode by their declared OIDs " +
    "(int2/4/8, float4/8, bool, text, bytea, numeric) — the npgsql " +
    "posture; an undecodable OID refuses loudly") {
    import java.nio.ByteBuffer
    // numeric binary: 12345.6789 = digits [1,2345,6789_?]… encode
    // base-10000: 1|2345 . 6789 → ndigits=3, weight=1, dscale=4,
    // digits = [1, 2345, 6789]
    val numeric = ByteBuffer.allocate(2 * 4 + 2 * 3)
      .putShort(3).putShort(1).putShort(0).putShort(4)
      .putShort(1).putShort(2345).putShort(6789).array()
    assert(PgServer.binaryParamSql(1700,
      ByteBuffer.wrap(numeric).array()) == "12345.6789")
    // fraction-only numeric: 0.05 → ndigits=1, weight=-1, dscale=2,
    // digits=[500] (base-10000 word 0500)
    val frac = ByteBuffer.allocate(10)
      .putShort(1).putShort(-1).putShort(0).putShort(2)
      .putShort(500).array()
    assert(PgServer.binaryParamSql(1700, frac) == "0.05")
    // typed fragments: bare numerics, quoted text, X'…' bytea
    assert(PgServer.binaryParamSql(20,
      ByteBuffer.allocate(8).putLong(-7L).array()) == "-7L")
    assert(PgServer.binaryParamSql(25,
      "o'hara".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      == "'o''hara'")
    assert(PgServer.binaryParamSql(17,
      Array[Byte](0x0a, 0x7f)) == "X'0a7f'")
    assert(PgServer.binaryParamSql(701, ByteBuffer.allocate(8)
      .putDouble(Double.NaN).array()) == "CAST('NaN' AS DOUBLE)")
    withServer() { (_, srv) =>
      val c = new PgClient("127.0.0.1", srv.port).connect()
      try {
        c.parse("bp", "SELECT $1 + $2 AS s, $3 AS f, $4 AS b, $5 AS t",
          paramOids = Seq(20, 23, 701, 16, 25))
        c.bindBinary("", "bp", Seq(
          Some(ByteBuffer.allocate(8).putLong(40L).array()),
          Some(ByteBuffer.allocate(4).putInt(2).array()),
          Some(ByteBuffer.allocate(8).putDouble(2.5).array()),
          Some(Array[Byte](1)),
          Some("héllo".getBytes(java.nio.charset.StandardCharsets.UTF_8))))
        c.execute("")
        val row = c.sync().last.rows.head
        assert(row == Seq(Some("42"), Some("2.5"), Some("t"),
          Some("héllo")))
        // NULL in binary format is the same -1 length
        c.parse("bp2", "SELECT $1 AS v", paramOids = Seq(20))
        c.bindBinary("", "bp2", Seq(None))
        c.execute("")
        assert(c.sync().last.rows.head.head.isEmpty)
        // an OID with no binary decoder errors instead of corrupting
        c.parse("bp3", "SELECT $1 AS v", paramOids = Seq(1082)) // date
        c.bindBinary("", "bp3", Seq(Some(Array[Byte](0, 0, 0, 0))))
        val e = intercept[PgClient.PgServerError] { c.sync() }
        assert(e.getMessage.contains("binary parameter"))
      } finally c.close()
    }
  }

  test("BINARY result format: Bind's result-format codes switch " +
    "DataRow cells to the wire binary encodings (ints, floats, bool, " +
    "bytea, numeric) and Describe(portal) reports format 1; an " +
    "unencodable column type refuses loudly") {
    import java.nio.ByteBuffer
    withServer() { (_, srv) =>
      val c = new PgClient("127.0.0.1", srv.port).connect()
      try {
        c.parse("br", "SELECT CAST(42 AS BIGINT) AS i8, " +
          "CAST(7 AS INT) AS i4, CAST(2.5 AS DOUBLE) AS f8, " +
          "true AS b, CAST(NULL AS BIGINT) AS n, " +
          "CAST(X'0a7f' AS BINARY) AS by, " +
          "CAST(12345.6789 AS DECIMAL(10,4)) AS num")
        c.bindBinaryResults("", "br")
        c.execute("")
        c.sync()
        val raw = c.lastRawRows.head
        assert(ByteBuffer.wrap(raw(0).get).getLong == 42L)
        assert(ByteBuffer.wrap(raw(1).get).getInt == 7)
        assert(ByteBuffer.wrap(raw(2).get).getDouble == 2.5)
        assert(raw(3).get.toSeq == Seq(1.toByte))
        assert(raw(4).isEmpty, "NULL stays the -1 length")
        assert(raw(5).get.toSeq == Seq(0x0a.toByte, 0x7f.toByte))
        // numeric round-trips through the repo's own decoder
        assert(PgServer.binaryParamSql(1700, raw(6).get)
          == "12345.6789")
        // numeric encode edges: fraction-only, negative, zero, and
        // word-boundary alignment all round-trip
        Seq("0.05", "-12345.6789", "0", "10000", "0.00010",
          "99999999.99999999", "-0.5").foreach { t =>
          val enc = PgServer.numericBinaryEncode(
            new java.math.BigDecimal(t))
          val expect = if (t == "0") "0" else t
          assert(PgServer.binaryParamSql(1700, enc) == expect,
            s"numeric round-trip of $t")
        }
        // a type with no binary send format refuses loudly
        c.parse("bad", "SELECT current_date AS d")
        c.bindBinaryResults("", "bad")
        c.execute("")
        val e = intercept[PgClient.PgServerError] { c.sync() }
        assert(e.getMessage.contains("binary result format"))
      } finally c.close()
    }
  }

  test("Describe of a prepared command is side-effect-free; the " +
    "command executes exactly once, at Execute") {
    withServer() { (s, srv) =>
      val c = new PgClient("127.0.0.1", srv.port).connect()
      try {
        c.parse("mkpeer", "CREATE PEER describe_probe TYPE parquet " +
          "OPTIONS (path '/x')")
        c.describeStatement("mkpeer")
        c.sync()
        // Describe must NOT have created the peer
        assert(!s.sql("SHOW PEERS").collect()
          .exists(_.getString(0) == "describe_probe"))
        c.bind("pp", "mkpeer")
        c.describePortal("pp")
        c.sync()
        // Bind/Describe(portal) must not either
        assert(!s.sql("SHOW PEERS").collect()
          .exists(_.getString(0) == "describe_probe"))
        c.execute("pp")
        c.sync()
        assert(s.sql("SHOW PEERS").collect()
          .exists(_.getString(0) == "describe_probe"))
      } finally c.close()
    }
  }

  test("SCRAM server accepts libpq's 'y,,' gs2 header (TLS without " +
    "channel binding) and still verifies the proof + c= echo") {
    import graft.cdc.PgWire.Scram
    val srv = new PgServer.ScramServer("u", "pw")
    // a client-first with the y-variant header, proof computed with
    // the matching auth message and c=base64("y,,")
    val nonce = Scram.b64(Array.fill(18)(7.toByte))
    val clientFirstBare = s"n=,r=$nonce"
    val serverFirst = srv.first(s"y,,$clientFirstBare")
    val a = Scram.attrs(serverFirst)
    val salted = Scram.saltedPassword("pw", Scram.unb64(a('s')),
      a('i').toInt)
    val (ck, sk, _) = Scram.keys(salted)
    val c64 = Scram.b64("y,,".getBytes("UTF-8"))
    val withoutProof = s"c=$c64,r=${a('r')}"
    val authMsg = (clientFirstBare + "," + serverFirst + "," +
      withoutProof).getBytes("UTF-8")
    val proof = Scram.xor(ck, Scram.hmac(sk, authMsg))
    val fin = srv.verifyFinal(s"$withoutProof,p=${Scram.b64(proof)}")
    assert(fin.exists(_.startsWith("v=")))
    // and a p= header is refused outright
    intercept[IllegalArgumentException](
      new PgServer.ScramServer("u", "pw")
        .first("p=tls-server-end-point,,n=,r=xyz"))
  }

  test("extended protocol error skips to Sync, then recovers") {
    withServer() { (_, srv) =>
      val c = new PgClient("127.0.0.1", srv.port).connect()
      try {
        c.parse("bad", "SELECT definitely_not_a_column")
        c.bind("pbad", "bad")
        c.execute("pbad")
        intercept[PgClient.PgServerError](c.sync())
        // post-Sync the session is clean
        c.parse("ok", "SELECT 5 AS v")
        c.bind("pok", "ok")
        c.execute("pok")
        assert(c.sync().last.rows.head.head.contains("5"))
      } finally c.close()
    }
  }

  test("SCRAM-SHA-256 auth: correct password in, wrong password and " +
    "unknown user refused") {
    withServer(users = Map("alice" -> "s3cret")) { (_, srv) =>
      val good = new PgClient("127.0.0.1", srv.port,
        user = "alice", password = "s3cret").connect()
      try assert(good.query("SELECT 1 AS v").rows.head.head
        .contains("1"))
      finally good.close()

      intercept[Exception] {
        val bad = new PgClient("127.0.0.1", srv.port,
          user = "alice", password = "wrong").connect()
        bad.close()
      }
      intercept[Exception] {
        val ghost = new PgClient("127.0.0.1", srv.port,
          user = "mallory", password = "s3cret").connect()
        ghost.close()
      }
    }
  }

  test("TLS front-end: SSLRequest → 'S' → the full session (auth, " +
    "queries) over the encrypted channel; sslRequired rejects " +
    "plaintext startups") {
    withGraftSession { s =>
      val srv = new PgServer(s, users = Map("alice" -> "pw"),
        ssl = Some(graft.cdc.TlsTestKeys.serverCtx),
        sslRequired = true).start()
      try {
        val c = new PgClient("127.0.0.1", srv.port, user = "alice",
          password = "pw",
          ssl = Some(graft.cdc.Tls.trustAllContext)).connect()
        try assert(c.query("SELECT 6 * 7 AS v").rows.head.head
          .contains("42"))
        finally c.close()
        // plaintext startup against the same server is refused
        intercept[Exception] {
          val plain = new PgClient("127.0.0.1", srv.port,
            user = "alice", password = "pw").connect()
          plain.close()
        }
      } finally srv.stop()
    }
  }

  test("concurrent sessions: cursors and prepared statements are " +
    "scoped per connection (same names, no collision), and a " +
    "disconnect drops only its own") {
    withServer() { (s, srv) =>
      val c1 = new PgClient("127.0.0.1", srv.port).connect()
      val c2 = new PgClient("127.0.0.1", srv.port).connect()
      try {
        c1.query("DECLARE shared CURSOR FOR " +
          "SELECT id FROM range(5) ORDER BY id")
        c2.query("DECLARE shared CURSOR FOR " +
          "SELECT id + 100 AS id FROM range(5) ORDER BY id")
        // each connection pages ITS OWN cursor despite the shared name
        assert(c1.query("FETCH 2 FROM shared").rows.map(_.head.get) ==
          Seq("0", "1"))
        assert(c2.query("FETCH 2 FROM shared").rows.map(_.head.get) ==
          Seq("100", "101"))
        assert(c1.query("FETCH 1 FROM shared").rows.map(_.head.get) ==
          Seq("2")) // c2's FETCH did not advance c1's iterator
        c1.query("PREPARE p1 AS SELECT 1 + $1 AS v")
        c2.query("PREPARE p1 AS SELECT 100 + $1 AS v")
        assert(c1.query("EXECUTE p1 (1)").rows.head.head.contains("2"))
        assert(c2.query("EXECUTE p1 (1)").rows.head.head
          .contains("101"))
        // CLOSE ALL in c2 must not touch c1's cursors
        c2.query("CLOSE ALL")
        assert(c1.query("FETCH 1 FROM shared").rows.map(_.head.get) ==
          Seq("3"))
        // c2's disconnect drops only its own state; c1 keeps paging
        c2.close()
        Thread.sleep(300)
        assert(c1.query("FETCH 1 FROM shared").rows.map(_.head.get) ==
          Seq("4"))
      } finally { c1.close(); c2.close() }
    }
  }

  test("CancelRequest with the session's backend key aborts the " +
    "running query (ErrorResponse on the main connection), and the " +
    "session survives for the next statement") {
    withServer() { (_, srv) =>
      val c = new PgClient("127.0.0.1", srv.port,
        readTimeoutMs = 120000).connect()
      try {
        assert(c.backendKey.isDefined)
        @volatile var outcome: Option[Either[Throwable, Long]] = None
        val runner = new Thread(() => {
          outcome = Some(
            try Right(c.query(
              "SELECT sum(id * id) AS s FROM range(50000000000)")
              .rows.head.head.get.toLong)
            catch { case e: Throwable => Left(e) })
        })
        runner.start()
        Thread.sleep(1500) // let the job start
        c.cancel()
        runner.join(60000)
        assert(!runner.isAlive, "query did not end after cancel")
        outcome.get match {
          case Left(e) =>
            assert(e.isInstanceOf[PgClient.PgServerError], e.toString)
          case Right(_) =>
            fail("the 50-billion-row aggregate finished before the " +
              "cancel landed — enlarge the workload")
        }
        // same session keeps working (cancel kills the query, not it)
        assert(c.query("SELECT 9 AS v").rows.head.head.contains("9"))
        // a WRONG secret must be ignored
        val sock2 = new java.net.Socket("127.0.0.1", srv.port)
        try {
          val (pid, _) = c.backendKey.get
          sock2.getOutputStream.write(java.nio.ByteBuffer.allocate(16)
            .putInt(16).putInt(PgServer.CancelRequestCode)
            .putInt(pid).putInt(12345).array())
          sock2.getOutputStream.flush()
        } finally sock2.close()
        assert(c.query("SELECT 10 AS v").rows.head.head.contains("10"))
      } finally c.close()
    }
  }

  test("stock psql interop: real libpq drives SELECT, cursors and " +
    "PREPARE/EXECUTE end-to-end (canceled when psql is absent)") {
    assume(new java.io.File("/usr/bin/psql").exists, "psql not installed")
    withServer() { (_, srv) =>
      def psql(cmds: String*): String = {
        val cmd = Seq("/usr/bin/psql",
          s"host=127.0.0.1 port=${srv.port} user=graft dbname=graft",
          "-v", "ON_ERROR_STOP=1", "-At") ++
          cmds.flatMap(c => Seq("-c", c))
        val p = new ProcessBuilder(cmd: _*)
          .redirectErrorStream(true).start()
        val outText = new String(p.getInputStream.readAllBytes())
        assert(p.waitFor() == 0, s"psql failed:\n$outText")
        outText
      }
      assert(psql("SELECT 6 * 7").trim == "42")
      val cur = psql(
        "DECLARE pc CURSOR FOR SELECT id FROM range(10) ORDER BY id",
        "FETCH 3 FROM pc", "FETCH 2 FROM pc", "CLOSE pc")
      assert(cur.linesIterator.toSeq
        .filter(_.forall(_.isDigit)).take(5) ==
        Seq("0", "1", "2", "3", "4"))
      val prep = psql(
        "PREPARE pt AS SELECT id * $1 AS v FROM range(3) ORDER BY id",
        "EXECUTE pt (5)", "DEALLOCATE PREPARE pt")
      assert(prep.linesIterator.toSeq
        .filter(_.forall(_.isDigit)) == Seq("0", "5", "10"))
    }
  }

  test("SSLRequest without a server context answers 'N' and the " +
    "session continues in plaintext per the protocol") {
    withServer() { (_, srv) =>
      // PgClient with ssl demands 'S'; raw path: send SSLRequest, read
      // 'N', then proceed with a normal startup on the same socket
      val sock = new java.net.Socket("127.0.0.1", srv.port)
      try {
        val out = sock.getOutputStream
        val in = new java.io.DataInputStream(sock.getInputStream)
        out.write(java.nio.ByteBuffer.allocate(8).putInt(8)
          .putInt(graft.cdc.PgWire.SslRequestCode).array())
        out.flush()
        assert(in.read() == 'N')
        graft.cdc.PgWire.writeStartup(out,
          Seq("user" -> "u", "database" -> "d"))
        // first response must be AuthenticationOk (trust)
        val (t, body) = graft.cdc.PgWire.readMessage(in).get
        assert(t == 'R' &&
          java.nio.ByteBuffer.wrap(body).getInt == 0)
      } finally sock.close()
    }
  }
}
