package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChangeRecord
import graft.cdc.PgOutput._

/** Golden-fixture coverage of the pgoutput binary decoder, mirroring the
  * scenarios of the reference's CDC e2e suite (toast, nulls, PK change,
  * multi-row transactions, schema change): byte streams are hand-assembled
  * per the public protocol spec — the first fixture literally, the rest
  * through the inverse encoder (itself proven against the literal bytes).
  */
class PgOutputSpec extends AnyFunSuite {

  private val usersRel = Relation(16384, "public", "users", 'd'.toInt, Seq(
    RelationColumn(1, "id", Oid.Int8, -1),
    RelationColumn(0, "name", Oid.Text, -1),
    RelationColumn(0, "bio", Oid.Text, -1)))

  private def dec(filter: String => Boolean = _ => true) = {
    val d = new PgOutputDecoder(filter, s => s.stripPrefix("public."))
    d
  }

  // --- wire format ---------------------------------------------------------

  test("golden bytes: hand-assembled Begin parses field-for-field") {
    // 'B', finalLsn=0x0102030405060708, commitTime=1000µs past PG epoch,
    // xid=777 — assembled by hand, not via encode().
    val bytes = Array[Byte]('B',
      0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08,
      0, 0, 0, 0, 0, 0, 0x03, 0xE8.toByte,
      0, 0, 0x03, 0x09)
    assert(parse(bytes) ==
      Begin(0x0102030405060708L, PgEpochMicros + 1000L, 777))
  }

  test("golden bytes: hand-assembled Insert with text/null/toast tuple") {
    // 'I', relId=16384, 'N', ncols=3: 't' len=2 "42" | 'n' | 'u'
    val bytes = Array[Byte]('I', 0, 0, 0x40, 0, 'N',
      0, 3,
      't', 0, 0, 0, 2, '4', '2',
      'n',
      'u')
    assert(clean(parse(bytes)) == clean(Insert(16384, TupleData(Seq(
      TextColumn("42".getBytes), NullColumn, ToastColumn)))))
  }

  test("encode is the inverse of parse for every message type") {
    val msgs: Seq[Message] = Seq(
      Begin(42L, PgEpochMicros + 5L, 7),
      Commit(0, 42L, 43L, PgEpochMicros + 5L),
      Origin(9L, "origin_node"),
      usersRel,
      TypeMessage(99999, "public", "mood"),
      Insert(16384, TupleData(Seq(text("1"), text("a"), NullColumn))),
      Update(16384, Some('K'),
        Some(TupleData(Seq(text("1"), NullColumn, NullColumn))),
        TupleData(Seq(text("1"), text("b"), ToastColumn))),
      Update(16384, None, None, TupleData(Seq(text("1"), text("c"),
        NullColumn))),
      Delete(16384, 'K', TupleData(Seq(text("1"), NullColumn, NullColumn))),
      Truncate(1, Seq(16384, 16385)),
      LogicalMessage(transactional = true, 77L, "wal_prefix",
        "hello".getBytes))
    msgs.foreach { m =>
      val reparsed = parse(encode(m))
      (m, reparsed) match {
        // Array[Byte] fields need deep compare
        case (a: LogicalMessage, b: LogicalMessage) =>
          assert((a.transactional, a.lsn, a.prefix) ==
            (b.transactional, b.lsn, b.prefix))
          assert(a.content.sameElements(b.content))
        case _ => assert(clean(reparsed) == clean(m), s"round-trip of $m")
      }
    }
  }

  /** TupleColumn byte arrays compare by identity; normalize to strings. */
  private def clean(m: Message): Any = m match {
    case Insert(r, t) => ("I", r, cleanT(t))
    case Update(r, k, o, n) => ("U", r, k, o.map(cleanT), cleanT(n))
    case Delete(r, k, t) => ("D", r, k, cleanT(t))
    case other => other
  }
  private def cleanT(t: TupleData): Seq[Any] = t.columns.map {
    case TextColumn(b) => ("t", new String(b))
    case BinaryColumn(b) => ("b", b.toSeq)
    case other => other
  }

  // --- session decode ------------------------------------------------------

  private def feedAll(d: PgOutputDecoder, msgs: Seq[(Long, Message)])
      : Seq[ChangeRecord] =
    msgs.flatMap { case (lsn, m) => d.feedParsed(lsn, encode(m) match {
      case bytes => parse(bytes) // always exercise the full codec path
    }) }

  test("insert/update/delete in one transaction: commit state + records") {
    val d = dec()
    val records = feedAll(d, Seq(
      100L -> usersRel,
      101L -> Begin(110L, PgEpochMicros + 1234L, 55),
      102L -> Insert(16384, TupleData(Seq(text("1"), text("ann"),
        text("hi")))),
      103L -> Update(16384, None, None,
        TupleData(Seq(text("1"), text("ann b"), text("hi")))),
      104L -> Delete(16384, 'K',
        TupleData(Seq(text("1"), NullColumn, NullColumn))),
      110L -> Commit(0, 110L, 111L, PgEpochMicros + 1234L)))

    assert(records.map(_.recordType) == Seq(0, 1, 2))
    val Seq(ins, upd, del) = records
    assert(ins == ChangeRecord(0, 102L, null, PgEpochMicros + 1234L, 55L,
      "public.users", "users",
      """{"id":1,"name":"ann","bio":"hi"}""", null, Nil))
    assert(upd.data == """{"id":1,"name":"ann b","bio":"hi"}""")
    assert(upd.matchData == null)
    assert(del.data == null)
    assert(del.matchData == """{"id":1}""") // key image only, no JSON nulls
    assert(d.latestCheckpoint == 110L) // tx-atomic cut at the Commit LSN
  }

  test("unchanged TOAST columns are absent from data, named in the set") {
    val d = dec()
    val records = feedAll(d, Seq(
      1L -> usersRel,
      2L -> Begin(9L, PgEpochMicros, 1),
      3L -> Update(16384, Some('K'),
        Some(TupleData(Seq(text("7"), NullColumn, NullColumn))),
        TupleData(Seq(text("7"), text("new name"), ToastColumn))),
      9L -> Commit(0, 9L, 10L, PgEpochMicros)))
    val upd = records.head
    assert(upd.data == """{"id":7,"name":"new name"}""") // bio ABSENT
    assert(upd.unchangedToastColumns == Seq("bio"))
    assert(upd.matchData == """{"id":7}""")
  }

  test("replident-full TOAST backfill: old value folds into new image") {
    // cdc.go:1190-1205 — old tuple ('O') carries the unchanged column, so
    // the new image backfills it and the unchanged set drops it.
    val d = dec()
    val records = feedAll(d, Seq(
      1L -> usersRel,
      2L -> Begin(9L, PgEpochMicros, 1),
      3L -> Update(16384, Some('O'),
        Some(TupleData(Seq(text("7"), text("old name"), text("long bio")))),
        TupleData(Seq(text("7"), text("new name"), ToastColumn))),
      9L -> Commit(0, 9L, 10L, PgEpochMicros)))
    val upd = records.head
    assert(upd.data ==
      """{"id":7,"name":"new name","bio":"long bio"}""")
    assert(upd.unchangedToastColumns.isEmpty)
    // backfilled column removed from the old image too (DeleteColName)
    assert(upd.matchData == """{"id":7,"name":"old name"}""")
  }

  test("PK-change update: key image ('K') rides matchData for re-keying") {
    val d = dec()
    val records = feedAll(d, Seq(
      1L -> usersRel,
      2L -> Begin(9L, PgEpochMicros, 1),
      3L -> Update(16384, Some('K'),
        Some(TupleData(Seq(text("7"), NullColumn, NullColumn))),
        TupleData(Seq(text("8"), text("ann"), text("hi")))),
      9L -> Commit(0, 9L, 10L, PgEpochMicros)))
    val upd = records.head
    assert(upd.data == """{"id":8,"name":"ann","bio":"hi"}""")
    assert(upd.matchData == """{"id":7}""") // the OLD key
  }

  test("null vs absent: SQL NULL renders as JSON null") {
    val d = dec()
    val records = feedAll(d, Seq(
      1L -> usersRel,
      2L -> Begin(9L, PgEpochMicros, 1),
      3L -> Insert(16384, TupleData(Seq(text("1"), NullColumn,
        ToastColumn))),
      9L -> Commit(0, 9L, 10L, PgEpochMicros)))
    assert(records.head.data == """{"id":1,"name":null}""")
  }

  test("binary-format tuples decode (int8/bool/float8/bytea/uuid)") {
    val rel = Relation(20000, "public", "bin", 'd'.toInt, Seq(
      RelationColumn(1, "id", Oid.Int8, -1),
      RelationColumn(0, "ok", Oid.Bool, -1),
      RelationColumn(0, "x", Oid.Float8, -1),
      RelationColumn(0, "blob", Oid.Bytea, -1),
      RelationColumn(0, "u", Oid.Uuid, -1)))
    def i64(v: Long) = java.nio.ByteBuffer.allocate(8).putLong(v).array()
    def f64(v: Double) =
      java.nio.ByteBuffer.allocate(8).putDouble(v).array()
    val uuid = (0 until 16).map(_.toByte).toArray
    val d = dec()
    val records = feedAll(d, Seq(
      1L -> rel,
      2L -> Begin(9L, PgEpochMicros, 1),
      3L -> Insert(20000, TupleData(Seq(
        BinaryColumn(i64(42L)), BinaryColumn(Array[Byte](1)),
        BinaryColumn(f64(2.5)), BinaryColumn(Array[Byte](0xDE.toByte,
          0xAD.toByte)), BinaryColumn(uuid)))),
      9L -> Commit(0, 9L, 10L, PgEpochMicros)))
    assert(records.head.data ==
      """{"id":42,"ok":true,"x":2.5,"blob":"\\xdead",""" +
        """"u":"00010203-0405-0607-0809-0a0b0c0d0e0f"}""")
  }

  test("tables outside the filter are consumed and dropped") {
    val d = dec(filter = _ == "public.users")
    val otherRel = usersRel.copy(relId = 30000, name = "other")
    val records = feedAll(d, Seq(
      1L -> usersRel, 2L -> otherRel,
      3L -> Begin(9L, PgEpochMicros, 1),
      4L -> Insert(30000, TupleData(Seq(text("1"), text("x"), text("y")))),
      5L -> Insert(16384, TupleData(Seq(text("1"), text("x"), text("y")))),
      9L -> Commit(0, 9L, 10L, PgEpochMicros)))
    assert(records.map(_.sourceTable) == Seq("public.users"))
  }

  test("relation redefinition emits an additive TableSchemaDelta record") {
    val widened = usersRel.copy(columns = usersRel.columns :+
      RelationColumn(0, "age", Oid.Int4, -1))
    val d = dec()
    val records = feedAll(d, Seq(
      1L -> usersRel,
      2L -> Begin(9L, PgEpochMicros, 1),
      3L -> widened,
      9L -> Commit(0, 9L, 10L, PgEpochMicros)))
    assert(records.map(_.recordType) == Seq(ChangeRecord.TypeRelation))
    val delta = SchemaEvolution.deltaFromJson(records.head.data)
    assert(delta.srcTable == "public.users")
    assert(delta.addedColumns.map(_.name) == Seq("age"))
    assert(delta.addedColumns.head.kind == graft.types.QKind.QInt32)
  }

  test("non-transactional logical message advances the checkpoint") {
    val d = dec()
    val records = feedAll(d, Seq(
      5L -> LogicalMessage(transactional = false, 500L, "heartbeat",
        "ping".getBytes)))
    assert(records.head.recordType == ChangeRecord.TypeMessage)
    assert(records.head.sourceTable == "heartbeat")
    assert(records.head.data == "ping")
    assert(d.latestCheckpoint == 500L)
  }

  test("truncate and origin/type messages are consumed without records") {
    val d = dec()
    val records = feedAll(d, Seq(
      1L -> usersRel,
      2L -> Origin(1L, "node_a"),
      3L -> TypeMessage(99999, "public", "mood"),
      4L -> Truncate(0, Seq(16384))))
    assert(records.isEmpty)
  }

  test("special characters JSON-escape in text values") {
    val d = dec()
    val records = feedAll(d, Seq(
      1L -> usersRel,
      2L -> Begin(9L, PgEpochMicros, 1),
      3L -> Insert(16384, TupleData(Seq(text("1"),
        text("a\"b\\c\nd"), NullColumn))),
      9L -> Commit(0, 9L, 10L, PgEpochMicros)))
    assert(records.head.data ==
      "{\"id\":1,\"name\":\"a\\\"b\\\\c\\nd\",\"bio\":null}")
  }
}
