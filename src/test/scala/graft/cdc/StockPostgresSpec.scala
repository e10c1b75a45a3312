package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.server.{PgClient, PgServer}

/** Interop pins against a REAL PostgreSQL 15 server (see
  * [[StockPostgres]]): the query client's auth ladder and binary
  * codecs, and the live replication client's pgoutput session — every
  * path here otherwise runs only against in-process fixture servers
  * that share the codec, so these are the suites where an asymmetric
  * protocol bug would surface (the stock-OpenSSH pattern, which found
  * two real races; the stock-psql pattern, which pinned the server
  * side).
  *
  * Reference behavior being restated: the replication connection setup
  * of `flow/connectors/postgres/cdc.go` (slot + publication pull,
  * standby status acks advancing `confirmed_flush_lsn`) and the peer
  * auth handling of `flow/connectors/postgres/postgres.go` (pgx speaks
  * scram/md5 transparently).
  */
class StockPostgresSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: Option[StockPostgres.Server] = None

  override def beforeAll(): Unit = { server = StockPostgres.start() }
  override def afterAll(): Unit = server.foreach(_.stop())

  private def srv: StockPostgres.Server = {
    assume(server.isDefined, "stock postgres unavailable in this env")
    server.get
  }

  private def client(user: String = "postgres", password: String = "",
      db: String = "postgres"): PgClient =
    new PgClient("127.0.0.1", srv.port, user = user, database = db,
      password = password).connect()

  /** `X/Y` slot-view LSN text → the numeric LSN. */
  private def lsnOf(s: String): Long = {
    val Array(hi, lo) = s.trim.split("/")
    (java.lang.Long.parseLong(hi, 16) << 32) |
      java.lang.Long.parseLong(lo, 16)
  }

  // ------------------------------------------------------ query client

  test("stock PG: simple + extended protocol and SQLSTATE " +
    "classification through PgClient") {
    val c = client()
    try {
      // simple protocol: types arrive in PG text form
      val r = c.query(
        "SELECT 6 * 7 AS a, NULL::text AS b, 'x''y' AS c, true AS d")
      assert(r.columns == Seq("a", "b", "c", "d"))
      assert(r.rows == Seq(Seq(Some("42"), None, Some("x'y"),
        Some("t"))))

      // multi-statement → one result per statement
      val all = c.queryAll("SELECT 1; SELECT 2")
      assert(all.map(_.rows.head.head.get) == Seq("1", "2"))

      // extended protocol with text parameters
      c.parse("st1", "SELECT $1::int8 + $2::int8 AS s")
      c.bind("", "st1", Seq(Some("40"), Some("2")))
      c.execute("")
      val ex = c.sync()
      assert(ex.head.rows == Seq(Seq(Some("42"))))

      // SQLSTATE classification: undefined table = 42P01 (the code the
      // reference's error classifier branches on, pgconn.PgError.Code)
      val e = intercept[PgClient.PgServerError](c.query(
        "SELECT * FROM does_not_exist"))
      assert(e.sqlState == "42P01")
      // the session survives an error (RFQ drained)
      assert(c.query("SELECT 1").rows.head.head.contains("1"))
    } finally c.close()
  }

  test("stock PG: SCRAM-SHA-256 and MD5 auth ladders against the " +
    "real verifiers; wrong password classifies as 28P01") {
    val s = srv
    s.psql("SET password_encryption='scram-sha-256'; " +
      "CREATE ROLE scram_u LOGIN PASSWORD 'scrampw'")
    s.psql("SET password_encryption='md5'; " +
      "CREATE ROLE md5_u LOGIN PASSWORD 'md5pw'")
    s.setHba(Seq(
      "host all scram_u 127.0.0.1/32 scram-sha-256",
      "host all md5_u 127.0.0.1/32 md5") ++ StockPostgres.trustHba)
    try {
      val c1 = client(user = "scram_u", password = "scrampw")
      try assert(c1.query("SELECT current_user").rows.head.head
        .contains("scram_u"))
      finally c1.close()

      val c2 = client(user = "md5_u", password = "md5pw")
      try assert(c2.query("SELECT current_user").rows.head.head
        .contains("md5_u"))
      finally c2.close()

      // invalid_password surfaces with its SQLSTATE (auth-rotation
      // classification in the reference's validate path)
      val e = intercept[PgClient.PgServerError](
        client(user = "scram_u", password = "wrong"))
      assert(e.sqlState == "28P01")
    } finally s.setHba(StockPostgres.trustHba)
  }

  test("stock PG: numeric base-10000 binary codec round-trips against " +
    "the real numeric.c in BOTH directions; int8/bool/text binary " +
    "results match") {
    import org.apache.spark.sql.types._
    val cases = Seq("12345.6789" -> DecimalType(12, 4),
      "-0.0001" -> DecimalType(10, 4),
      "0" -> DecimalType(5, 0),
      "98765432109876543210.12345" -> DecimalType(38, 5))
    val c = client()
    try {
      // our ENCODER → real PG's recv parser: a binary numeric Bind
      // parameter echoed back as text must be value-identical
      c.parse("nm", "SELECT $1::numeric::text", Seq(1700))
      cases.foreach { case (txt, dt) =>
        val enc = PgServer.binaryValue(dt, new java.math.BigDecimal(txt))
        c.bindBinary("", "nm", Seq(Some(enc)))
        c.execute("")
        val got = c.sync().head.rows.head.head.get
        assert(new java.math.BigDecimal(got)
          .compareTo(new java.math.BigDecimal(txt)) == 0,
          s"recv($txt) -> $got")
      }

      // real PG's send format → byte-identical to our encoder (weight,
      // dscale, digit grouping all pinned, not just the value)
      cases.foreach { case (txt, dt) =>
        c.parse("", s"SELECT '$txt'::numeric(${dt.precision},${dt.scale})")
        c.bindBinaryResults("", "")
        c.execute("")
        c.sync()
        val raw = c.lastRawRows.head.head.get
        val ours = PgServer.binaryValue(dt, new java.math.BigDecimal(txt))
        assert(java.util.Arrays.equals(raw, ours),
          s"send($txt): pg=${raw.mkString(",")} ours=${ours.mkString(",")}")
      }

      // scalar binary results: int8 BE, bool single byte, utf8 text
      c.parse("", "SELECT 9007199254740993::int8, true, 'héllo'::text")
      c.bindBinaryResults("", "")
      c.execute("")
      c.sync()
      val row = c.lastRawRows.head
      assert(java.nio.ByteBuffer.wrap(row(0).get).getLong ==
        9007199254740993L)
      assert(row(1).get.sameElements(Array[Byte](1)))
      assert(new String(row(2).get, "UTF-8") == "héllo")
    } finally c.close()
  }

  // ------------------------------------------------ replication client

  test("stock PG: live pgoutput replication — wide types, TOAST " +
    "unchanged columns, standby acks advancing confirmed_flush_lsn, " +
    "and real slot resume semantics") {
    val s = srv
    s.psql("""CREATE TABLE public.items (
      id bigint PRIMARY KEY, t text, arr bigint[], n numeric(12,4),
      ts timestamptz, u uuid, j jsonb, big text)""")
    s.psql("CREATE PUBLICATION graft_pub FOR TABLE public.items")
    s.psql("SELECT pg_create_logical_replication_slot(" +
      "'graft_slot', 'pgoutput')")

    // three separate transactions: inserts (one TOAST-wide row), an
    // update NOT touching the TOAST column, a delete
    s.psql("""INSERT INTO public.items VALUES
      (1, 'alpha', ARRAY[1,2,3], 12345.6789,
       '2024-03-04 05:06:07.123456+00',
       'a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11', '{"k":1}',
       (SELECT string_agg(md5(g::text), '')
          FROM generate_series(1, 4000) g)),
      (2, 'beta', ARRAY[]::bigint[], -0.0001, now(), NULL, '[1,2]',
       NULL)""")
    s.psql("UPDATE public.items SET t = 'alpha2' WHERE id = 1")
    s.psql("DELETE FROM public.items WHERE id = 2")

    val wal = java.nio.file.Files
      .createTempDirectory("stockpg_wal").toString
    def source(after: Long) = new PgReplicationSource("127.0.0.1",
      s.port, slot = "graft_slot", publication = "graft_pub",
      startLsn = math.max(after, 0L))

    val (n1, lsn1) = PgOutputFrames.ingestFrom(source(-1L), wal)
    assert(n1 == 4L, s"expected 4 records, got $n1")
    val rows = ChangeLogWal.read(wal, -1L, Long.MaxValue)
    import graft.model.ChangeRecord._
    assert(rows.map(_(3).toInt) ==
      Seq(TypeInsert, TypeInsert, TypeUpdate, TypeDelete))
    assert(rows.forall(_(4) == "public.items"))
    val ins1 = rows(0)(6)
    assert(ins1.contains("\"arr\":[1,2,3]"), ins1.take(200))
    assert(ins1.contains(
      "\"u\":\"a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11\""))
    assert(ins1.contains("\"t\":\"alpha\""))
    // the real server's default replica identity sends the updated row
    // with the untouched TOAST column as 'u' (unchanged-toast)
    val upd = rows(2)
    assert(upd(8).split(",").contains("big"),
      s"unchanged-toast cols: '${upd(8)}'")
    assert(upd(6).contains("\"t\":\"alpha2\""))

    // the ack we sent on the live socket must move the REAL slot's
    // confirmed position (WAL retention advances — the operational
    // point of standby status updates)
    val deadline = System.nanoTime + 15000000000L
    def confirmed(): Long = lsnOf(s.psql(
      "SELECT confirmed_flush_lsn FROM pg_replication_slots " +
        "WHERE slot_name = 'graft_slot'"))
    while (confirmed() <= lsn1 && System.nanoTime < deadline)
      Thread.sleep(100)
    assert(confirmed() > lsn1,
      f"confirmed_flush ${confirmed()}%x vs last commit $lsn1%x")

    // resume: a NEW transaction lands; the second pull appends ONLY it
    // (server-side: the slot restarts past the confirmed LSN;
    // client-side: per-tx skip at afterCommitLsn — both in play here)
    s.psql("INSERT INTO public.items VALUES (3, 'gamma', NULL, 1.5, " +
      "now(), NULL, NULL, NULL)")
    val (n2, lsn2) = PgOutputFrames.ingestFrom(source(lsn1), wal,
      afterCommitLsn = lsn1)
    assert(n2 == 1L, s"resume must append only the new tx, got $n2")
    assert(lsn2 > lsn1)
    val all = ChangeLogWal.read(wal, -1L, Long.MaxValue)
    assert(all.size == 5 && all.last(6).contains("\"t\":\"gamma\""))

    s.psql("SELECT pg_drop_replication_slot(slot_name) " +
      "FROM pg_replication_slots WHERE slot_name='graft_slot'")
    s.psql("DROP PUBLICATION graft_pub")
    s.psql("DROP TABLE public.items")
  }
}
