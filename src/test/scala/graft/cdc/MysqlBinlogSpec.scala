package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChangeRecord

/** Golden-fixture coverage of the MySQL binlog codec + session decoder:
  * events are hand-assembled with the inverse encoder (the same
  * byte-level layouts a server emits — little-endian header/ints,
  * big-endian temporal/decimal groups, lenenc metadata), then decoded
  * and checked record-for-record, mirroring the scenarios of the
  * reference's mysql/cdc.go coverage (row images, MINIMAL-image skipped
  * columns, tx-boundary checkpoints, GTID vs file:pos, rotate, DDL). */
class MysqlBinlogSpec extends AnyFunSuite {

  import MysqlBinlog._

  private val tm = TableMap(
    tableId = 7L, schema = "shop", table = "items",
    columnTypes = Array(ColType.LongLong, ColType.Varchar,
      ColType.NewDecimal),
    columnMeta = Array(0, 255, (12 << 8) | 2),
    nullable = Array(false, true, true),
    columnNames = Seq("id", "name", "price"),
    signedness = Seq(true, true, true))

  private def freshDecoder() = new MysqlBinlogDecoder()

  private def fde = encodeFormatDescription(100L, 120L)
  private def tmEv = encodeTableMap(100L, 200L, tm)

  test("ENUM/SET with FULL row metadata: ordinals and bitmasks decode " +
    "to member names (ENUM_STR_VALUE/SET_STR_VALUE TLVs); without the " +
    "TLVs the ordinal passes through, as go-mysql behaves") {
    import MysqlBinlog._
    // status ENUM('new','paid','void') rides STRING(254) with the real
    // type in the metadata high byte; tags SET('a','b','c') likewise
    val enumMeta = (ColType.Enum << 8) | 1
    val setMeta = (ColType.Set << 8) | 1
    val tmFull = TableMap(9L, "app", "o",
      Array(ColType.LongLong, ColType.StringT, ColType.StringT),
      Array(0, enumMeta, setMeta), Array(false, true, true),
      Seq("id", "status", "tags"), Seq(true, true, true),
      enumSetValues = Map(
        1 -> Seq("new", "paid", "void"),
        2 -> Seq("a", "b", "c")))
    // TLVs round-trip through the binary TABLE_MAP encoding
    val (_, parsedEv) = parse(encodeTableMap(1L, 10L, tmFull), _ => None)
    val parsed = parsedEv.asInstanceOf[TableMap]
    assert(parsed.enumSetValues == tmFull.enumSetValues)

    val (_, rowsEv) = parse(encodeRows(1L, 20L, Ev.WriteRowsV2,
      tmFull, Seq(Seq(
        Some(Some(fLong(1L))),
        Some(Some(fEnum(2, 1))), // ordinal 2 → 'paid'
        Some(Some(fSet(0x5L, 1))) // bits 0+2 → 'a,c'
      ))), _ => Some(parsed))
    val img = rowsEv.asInstanceOf[WriteRows].rows.head.cols
    assert(img(1) == Some(Some("\"paid\"")))
    assert(img(2) == Some(Some("\"a,c\"")))

    // no TLVs → ordinals stay (non-FULL metadata servers)
    val tmBare = tmFull.copy(enumSetValues = Map.empty)
    val (_, bareEv) = parse(encodeRows(1L, 30L, Ev.WriteRowsV2,
      tmBare, Seq(Seq(
        Some(Some(fLong(1L))),
        Some(Some(fEnum(2, 1))),
        Some(Some(fSet(0x5L, 1)))
      ))), _ => Some(tmBare))
    assert(bareEv.asInstanceOf[WriteRows].rows.head.cols(1)
      == Some(Some("2")))
    assert(bareEv.asInstanceOf[WriteRows].rows.head.cols(2)
      == Some(Some("5")))
  }

  test("table map round-trips: types, metadata, names, signedness") {
    val d = freshDecoder()
    d.feed(fde)
    d.feed(tmEv)
    val (_, parsed) = parse(tmEv, _ => None)
    val m = parsed.asInstanceOf[TableMap]
    assert(m.qualifiedName == "shop.items")
    assert(m.columnTypes.toSeq == Seq(ColType.LongLong, ColType.Varchar,
      ColType.NewDecimal))
    assert(m.columnMeta.toSeq == Seq(0, 255, (12 << 8) | 2))
    assert(m.columnNames == Seq("id", "name", "price"))
    assert(m.signedness == Seq(true, true, true))
    assert(m.nullable.toSeq == Seq(false, true, true))
  }

  test("insert: full row image decodes to JSON, null bitmap honored") {
    val d = freshDecoder()
    d.feed(fde); d.feed(tmEv)
    d.feed(encodeQuery(100L, 250L, "shop", "BEGIN"))
    val rows = encodeRows(100L, 300L, Ev.WriteRowsV2, tm, Seq(
      Seq(Some(Some(fLong(42L))), Some(Some(fVarchar("ab\"c", 255))),
        Some(Some(fDecimal("19.99", 12, 2)))),
      Seq(Some(Some(fLong(43L))), Some(None), Some(None))))
    val out = d.feed(rows)
    assert(out.map(_.data) == Seq(
      """{"id":42,"name":"ab\"c","price":19.99}""",
      """{"id":43,"name":null,"price":null}"""))
    assert(out.forall(_.recordType == ChangeRecord.TypeInsert))
    assert(out.forall(_.sourceTable == "shop.items"))
    assert(out.forall(_.commitTimeMicros == 100L * 1000000L))
  }

  test("update with MINIMAL row image: absent columns become " +
      "unchanged-toast, key-only old image") {
    val d = freshDecoder()
    d.feed(fde); d.feed(tmEv)
    // old image: PK only; new image: PK + name (price unchanged/absent)
    val rows = encodeRows(100L, 300L, Ev.UpdateRowsV2, tm, Seq(
      Seq(Some(Some(fLong(42L))), None, None),
      Seq(Some(Some(fLong(42L))), Some(Some(fVarchar("new", 255))), None)))
    val out = d.feed(rows)
    assert(out.size == 1)
    val r = out.head
    assert(r.recordType == ChangeRecord.TypeUpdate)
    assert(r.data == """{"id":42,"name":"new"}""")
    assert(r.matchData == """{"id":42}""")
    assert(r.unchangedToastColumns == Seq("price"))
  }

  test("delete: key-only image lands in matchData") {
    val d = freshDecoder()
    d.feed(fde); d.feed(tmEv)
    val rows = encodeRows(100L, 300L, Ev.DeleteRowsV2, tm, Seq(
      Seq(Some(Some(fLong(7L))), None, None)))
    val out = d.feed(rows)
    assert(out.head.recordType == ChangeRecord.TypeDelete)
    assert(out.head.data == null)
    assert(out.head.matchData == """{"id":7}""")
  }

  test("checkpoint advances ONLY at transaction boundaries (XID)") {
    val d = freshDecoder()
    d.feed(fde); d.feed(tmEv)
    assert(d.latestCheckpoint == 0L)
    d.feed(encodeQuery(100L, 250L, "shop", "BEGIN"))
    d.feed(encodeRows(100L, 300L, Ev.WriteRowsV2, tm, Seq(
      Seq(Some(Some(fLong(1L))), Some(None), Some(None)))))
    assert(d.latestCheckpoint == 0L) // mid-transaction: no cut
    d.feed(encodeXid(100L, 350L, 9L))
    assert(d.latestCheckpoint == 350L)
    assert(d.latestCheckpointText == "binlog.000001:350")
  }

  test("COMMIT query event is a boundary for non-transactional engines") {
    val d = freshDecoder()
    d.feed(fde); d.feed(tmEv)
    d.feed(encodeQuery(100L, 400L, "shop", "COMMIT"))
    assert(d.latestCheckpoint == 400L)
  }

  test("GTID events switch the checkpoint text to a merged GTID set") {
    val d = freshDecoder()
    val uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    d.feed(fde); d.feed(tmEv)
    d.feed(encodeGtid(100L, 260L, uuid, 1L))
    d.feed(encodeXid(100L, 300L, 1L))
    d.feed(encodeGtid(100L, 360L, uuid, 2L))
    d.feed(encodeXid(100L, 400L, 2L))
    assert(d.latestCheckpointText == s"$uuid:1-2")
    // ordering rule: the merged set is newer than its prefix
    assert(TextCheckpoint.GtidSet.parse(d.latestCheckpointText)
      .isNewerThan(TextCheckpoint.GtidSet.parse(s"$uuid:1")))
  }

  test("rotate switches the binlog file for file:pos checkpoints") {
    val d = freshDecoder()
    d.feed(fde)
    d.feed(encodeRotate(100L, 500L, 4L, "binlog.000002"))
    d.feed(tmEv)
    d.feed(encodeXid(100L, 800L, 3L))
    assert(d.latestCheckpointText == "binlog.000002:800")
  }

  test("unsigned columns decode via the SIGNEDNESS metadata") {
    val utm = tm.copy(tableId = 8L,
      columnTypes = Array(ColType.Tiny, ColType.Long, ColType.LongLong),
      columnMeta = Array(0, 0, 0),
      nullable = Array(false, false, false),
      columnNames = Seq("a", "b", "c"),
      signedness = Seq(false, false, false))
    val d = freshDecoder()
    d.feed(fde)
    d.feed(encodeTableMap(100L, 200L, utm))
    val out = d.feed(encodeRows(100L, 300L, Ev.WriteRowsV2, utm, Seq(
      Seq(Some(Some(fTiny(0xFF))), Some(Some(fInt(-1))),
        Some(Some(fLong(-1L)))))))
    assert(out.head.data ==
      """{"a":255,"b":4294967295,"c":18446744073709551615}""")
  }

  test("decimal decode: sign, scale padding, cross-group digits") {
    def roundTrip(s: String, p: Int, sc: Int): String = {
      val bytes = fDecimal(s, p, sc)
      decodeDecimal(java.nio.ByteBuffer.wrap(bytes), p, sc)
    }
    assert(roundTrip("5.00", 12, 2) == "5.00")
    assert(roundTrip("-42.50", 12, 2) == "-42.50")
    assert(roundTrip("1234567890.12", 12, 2) == "1234567890.12")
    assert(roundTrip("0.00", 12, 2) == "0.00")
    assert(roundTrip("-0.01", 12, 2) == "-0.01")
    assert(roundTrip("123456789012345.123456789012", 27, 12) ==
      "123456789012345.123456789012")
    assert(roundTrip("42", 10, 0) == "42")
  }

  test("temporal decode: DATE, DATETIME2 (fsp 0 and 6)") {
    val ttm = tm.copy(tableId = 9L,
      columnTypes = Array(ColType.Date, ColType.DateTime2,
        ColType.DateTime2),
      columnMeta = Array(0, 0, 6),
      nullable = Array(false, false, false),
      columnNames = Seq("d", "dt0", "dt6"),
      signedness = Nil)
    val d = freshDecoder()
    d.feed(fde)
    d.feed(encodeTableMap(100L, 200L, ttm))
    val dt = java.time.LocalDateTime.of(2024, 1, 20, 12, 34, 56, 789012000)
    val out = d.feed(encodeRows(100L, 300L, Ev.WriteRowsV2, ttm, Seq(
      Seq(Some(Some(fDate(2024, 1, 20))),
        Some(Some(fDateTime2(dt.withNano(0), 0))),
        Some(Some(fDateTime2(dt, 6)))))))
    assert(out.head.data == """{"d":"2024-01-20",""" +
      """"dt0":"2024-01-20 12:34:56",""" +
      """"dt6":"2024-01-20 12:34:56.789012"}""")
  }

  test("ALTER TABLE ADD COLUMN emits a TypeRelation schema delta") {
    val d = freshDecoder()
    d.feed(fde); d.feed(tmEv)
    val out = d.feed(encodeQuery(100L, 900L, "shop",
      "ALTER TABLE items ADD COLUMN note varchar(80)"))
    assert(out.size == 1)
    assert(out.head.recordType == ChangeRecord.TypeRelation)
    assert(out.head.sourceTable == "shop.items")
    assert(out.head.data.contains("note"))
  }

  test("table filter drops rows of out-of-pipe tables") {
    val d = new MysqlBinlogDecoder(tableFilter = _ == "shop.other")
    d.feed(fde); d.feed(tmEv)
    val out = d.feed(encodeRows(100L, 300L, Ev.WriteRowsV2, tm, Seq(
      Seq(Some(Some(fLong(1L))), Some(None), Some(None)))))
    assert(out.isEmpty)
  }

  test("multi-row events emit one record per row in order") {
    val d = freshDecoder()
    d.feed(fde); d.feed(tmEv)
    val out = d.feed(encodeRows(100L, 300L, Ev.WriteRowsV2, tm,
      (1 to 5).map(i => Seq(Some(Some(fLong(i.toLong))), Some(None),
        Some(None)))))
    assert(out.map(_.data) ==
      (1 to 5).map(i => s"""{"id":$i,"name":null,"price":null}"""))
  }

  test("binary JSON: scalars, strings, nested containers, inlining") {
    import MysqlBinaryJson._
    assert(render(encode(null)) == "null")
    assert(render(encode(true)) == "true")
    assert(render(encode(false)) == "false")
    assert(render(encode(42L)) == "42")
    assert(render(encode(-7L)) == "-7")
    assert(render(encode(100000L)) == "100000")
    assert(render(encode(5000000000L)) == "5000000000")
    assert(render(encode(2.5)) == "2.5")
    assert(render(encode("hi \"there\"")) == "\"hi \\\"there\\\"\"")
    assert(render(encode(Seq(1L, "a", null, true))) ==
      """[1,"a",null,true]""")
    // MySQL orders object keys by (length, bytes)
    assert(render(encode(Map("bb" -> 1L, "a" -> 2L, "ccc" -> 3L))) ==
      """{"a":2,"bb":1,"ccc":3}""")
    assert(render(encode(Map("k" -> Seq(Map("x" -> 1L), 2L)))) ==
      """{"k":[{"x":1},2]}""")
  }

  test("JSON column rides the row image as compact text") {
    val jtm = tm.copy(tableId = 12L,
      columnTypes = Array(ColType.LongLong, ColType.Json),
      columnMeta = Array(0, 4),
      nullable = Array(false, true),
      columnNames = Seq("id", "doc"),
      signedness = Seq(true))
    val d = freshDecoder()
    d.feed(fde)
    d.feed(encodeTableMap(100L, 200L, jtm))
    val doc = MysqlBinaryJson.encode(
      Map("tags" -> Seq("a", "b"), "n" -> 3L))
    val w = new W
    w.u32(doc.length.toLong).raw(doc)
    val out = d.feed(encodeRows(100L, 300L, Ev.WriteRowsV2, jtm, Seq(
      Seq(Some(Some(fLong(1L))), Some(Some(w.bytes))))))
    assert(out.head.data ==
      """{"id":1,"doc":{"n":3,"tags":["a","b"]}}""")
  }

  test("MariaDB GTID events render domain-server-seq checkpoint text") {
    val d = freshDecoder()
    d.feed(fde); d.feed(tmEv)
    d.feed(encodeMariadbGtid(100L, 260L, serverId = 3L, domain = 0L,
      seq = 42L))
    d.feed(encodeXid(100L, 300L, 1L))
    d.feed(encodeMariadbGtid(100L, 360L, serverId = 3L, domain = 1L,
      seq = 7L))
    d.feed(encodeXid(100L, 400L, 2L))
    assert(d.latestCheckpointText == "0-3-42,1-3-7")
    // later seq in a domain replaces, never regresses
    d.feed(encodeMariadbGtid(100L, 460L, serverId = 4L, domain = 0L,
      seq = 43L))
    d.feed(encodeXid(100L, 500L, 3L))
    assert(d.latestCheckpointText == "0-4-43,1-3-7")
    val cur = TextCheckpoint.MariadbGtidSet.parse(d.latestCheckpointText)
    assert(cur.isNewerThan(
      TextCheckpoint.MariadbGtidSet.parse("0-3-42,1-3-7")))
    assert(cur.tryCompare(
      TextCheckpoint.MariadbGtidSet.parse("0-9-43,1-9-7")).contains(0))
  }

  test("wide-type row decode: every supported column type in one image") {
    // CHAR(10) packs real_type STRING in meta high byte
    val charMeta = (ColType.StringT << 8) | 10
    val enumMeta = (ColType.Enum << 8) | 1   // 1-byte ordinal
    val setMeta = (ColType.Set << 8) | 1     // 1-byte mask
    val wtm = TableMap(13L, "app", "wide",
      Array(ColType.Tiny, ColType.Short, ColType.Int24, ColType.Long,
        ColType.Float, ColType.Double, ColType.Year, ColType.Time2,
        ColType.Timestamp2, ColType.Bit, ColType.StringT,
        ColType.StringT, ColType.StringT, ColType.Blob),
      Array(0, 0, 0, 0, 4, 8, 0, 3, 0, (0 << 8) | 12, charMeta,
        enumMeta, setMeta, 2),
      Array.fill(14)(false),
      Seq("t1", "s2", "i3", "l4", "f5", "d6", "y7", "tm8", "ts9",
        "b10", "c11", "e12", "st13", "bl14"),
      Seq(true, true, true, true, true, true))
    val d = freshDecoder()
    d.feed(fde)
    d.feed(encodeTableMap(100L, 200L, wtm))
    val out = d.feed(encodeRows(100L, 300L, Ev.WriteRowsV2, wtm, Seq(Seq(
      Some(Some(fTiny(-5 & 0xFF))),
      Some(Some(fShort(-300 & 0xFFFF))),
      Some(Some(fInt24(123456))),
      Some(Some(fInt(-70000))),
      Some(Some(fFloat(1.5f))),
      Some(Some(fDouble(-2.25))),
      Some(Some(fYear(2024))),
      Some(Some(fTime2(13, 5, 9, 120000L, 3))),
      Some(Some(fTimestamp2(1700000000L, 0L, 0))),
      Some(Some(fBit(0xABCL, 12))),
      Some(Some(fChar("chr", charMeta))),
      Some(Some(fEnum(2, 1))),
      Some(Some(fSet(5L, 1))),
      Some(Some(fBlob(Array[Byte](0x01, 0x7F.toByte), 2)))))))
    assert(out.head.data ==
      """{"t1":-5,"s2":-300,"i3":123456,"l4":-70000,""" +
      """"f5":1.5,"d6":-2.25,"y7":2024,"tm8":"13:05:09.120",""" +
      """"ts9":"2023-11-14 22:13:20","b10":2748,"c11":"chr",""" +
      """"e12":2,"st13":5,"bl14":"\\x017f"}""")
  }

  test("negative TIME2 decodes at every fsp width as the server renders") {
    // legal MySQL TIME range is -838:59:59 .. 838:59:59; the TIMEF
    // binary splits intpart (floor) from frac (trunc) for fsp 0-4 and
    // stores the whole offset longlong for fsp 5-6 — each width has its
    // own negative-rebalance rule
    val ttm = TableMap(14L, "app", "times",
      Array(ColType.Time2, ColType.Time2, ColType.Time2, ColType.Time2),
      Array(0, 2, 3, 6), Array.fill(4)(false),
      Seq("a", "b", "c", "d"), Seq(true, true, true, true))
    val d = freshDecoder()
    d.feed(fde)
    d.feed(encodeTableMap(100L, 200L, ttm))
    val out = d.feed(encodeRows(100L, 300L, Ev.WriteRowsV2, ttm, Seq(Seq(
      Some(Some(fTime2(-838, 59, 59, 0L, 0))),
      Some(Some(fTime2(-1, 30, 0, 500000L, 2))),
      Some(Some(fTime2(-2, 15, 30, 123000L, 3))),
      Some(Some(fTime2(-5, 0, 0, 123456L, 6)))))))
    assert(out.head.data ==
      """{"a":"-838:59:59","b":"-01:30:00.50",""" +
      """"c":"-02:15:30.123","d":"-05:00:00.123456"}""")
  }
}
