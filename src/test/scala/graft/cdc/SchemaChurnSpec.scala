package graft.cdc

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.cdc.PgOutput._
import graft.mirror.{MirrorConfig, MirrorRunner, TableConfig}

/** Schema-churn long-tail scenarios from the reference's generic e2e
  * suite (`flow/e2e/generic_test.go`), driven through the binary
  * pgoutput path (bytes → decoder → WAL → mirror):
  *
  *  - Test_Schema_Change_Drop_Consecutive_Columns (:720): dropped
  *    columns NARROW the relation but the destination only ever
  *    widens — dropped columns persist, later rows fill them as NULL,
  *    and a narrower relation re-announce emits NO delta;
  *  - Test_Schema_Changes_Cutoff_Bug (:509): in a multi-table mirror,
  *    pgoutput announces a relation lazily (at the table's next DML),
  *    so table1's added column must reach ONLY table1's destination
  *    until table2's own DML arrives — per-table schema independence
  *    under small batch cuts;
  *  - Test_Schema_Change_Lost_Column_Bug (:612): consecutive added
  *    columns applied across separate sync batches (and a runner
  *    restart) must both survive — the reference lost the second one
  *    by consulting its catalog eagerly; here deltas are the ONLY
  *    schema channel, and the restart proves the persisted-schema
  *    recovery carries both.
  */
class SchemaChurnSpec extends SparkSpec {

  private def cols(names: (String, Int)*): Seq[RelationColumn] =
    names.zipWithIndex.map { case ((n, oid), i) =>
      RelationColumn(if (i == 0) 1 else 0, n, oid, -1)
    }

  private def tuple(vs: Option[String]*): TupleData =
    TupleData(vs.map {
      case Some(v) => text(v)
      case None => NullColumn
    })

  test("drop consecutive columns: relation narrows, destination " +
    "keeps the dropped columns, no delta emitted, later rows NULL") {
    val relId = 50
    val full = Relation(relId, "public", "t", 'd'.toInt,
      cols("id" -> Oid.Int8, "col_to_drop_first" -> Oid.Text,
        "col_to_drop_second" -> Oid.Text))
    val noFirst = Relation(relId, "public", "t", 'd'.toInt,
      cols("id" -> Oid.Int8, "col_to_drop_second" -> Oid.Text))
    val idOnly = Relation(relId, "public", "t", 'd'.toInt,
      cols("id" -> Oid.Int8))

    val msgs: Seq[(Long, Message)] = Seq(
      1L -> (full: Message),
      2L -> Begin(9L, PgEpochMicros, 1),
      3L -> Insert(relId, tuple(Some("1"), Some("a1"), Some("b1"))),
      9L -> Commit(0, 9L, 10L, PgEpochMicros),
      // ALTER DROP col_to_drop_first → next DML re-announces narrower
      11L -> (noFirst: Message),
      12L -> Begin(19L, PgEpochMicros + 1, 2),
      13L -> Insert(relId, tuple(Some("2"), Some("b2"))),
      19L -> Commit(0, 19L, 20L, PgEpochMicros + 1),
      // ALTER DROP col_to_drop_second
      21L -> (idOnly: Message),
      22L -> Begin(29L, PgEpochMicros + 2, 3),
      23L -> Insert(relId, tuple(Some("3"))),
      29L -> Commit(0, 29L, 30L, PgEpochMicros + 2))

    val dec = new PgOutputDecoder(_ => true, _ => "t")
    val records = msgs.flatMap { case (l, m) => dec.feed(l, encode(m)) }
    // three data records, ZERO relation-delta records (drops are not
    // deltas — cdc.go's processRelationMessage is additive-only)
    assert(records.count(_.recordType ==
      graft.model.ChangeRecord.TypeRelation) == 0)
    assert(records.size == 3)

    val wal = tmpDir("churn_drop_wal")
    val base = tmpDir("churn_drop")
    ChangeLogWal.append(wal, records)
    val runner = new MirrorRunner(spark, MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType),
        StructField("col_to_drop_first", StringType),
        StructField("col_to_drop_second", StringType))),
      destinationTable = "t"))
    runner.runAvailableNow()
    val dest = runner.destination()
    // dropped columns persist on the destination (catalog semantics)
    assert(dest.columns.contains("col_to_drop_first") &&
      dest.columns.contains("col_to_drop_second"))
    val byId = dest.collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId.keySet == Set(1L, 2L, 3L))
    assert(byId(1L).getAs[String]("col_to_drop_first") == "a1")
    assert(byId(1L).getAs[String]("col_to_drop_second") == "b1")
    assert(byId(2L).getAs[String]("col_to_drop_first") == null)
    assert(byId(2L).getAs[String]("col_to_drop_second") == "b2")
    assert(byId(3L).getAs[String]("col_to_drop_first") == null)
    assert(byId(3L).getAs[String]("col_to_drop_second") == null)
  }

  test("cutoff: in a two-table mirror an added column reaches only " +
    "the table whose DML announced it; the other follows on its own " +
    "DML in a later batch") {
    val (rel1, rel2) = (60, 61)
    def r1(extra: Boolean) = Relation(rel1, "public", "t1", 'd'.toInt,
      if (extra) cols("id" -> Oid.Int8, "c1" -> Oid.Int8,
        "c2" -> Oid.Int8)
      else cols("id" -> Oid.Int8, "c1" -> Oid.Int8))
    def r2(extra: Boolean) = Relation(rel2, "public", "t2", 'd'.toInt,
      if (extra) cols("id" -> Oid.Int8, "c1" -> Oid.Int8,
        "c2" -> Oid.Int8)
      else cols("id" -> Oid.Int8, "c1" -> Oid.Int8))

    val dec = new PgOutputDecoder(_ => true,
      s => if (s == "public.t1") "d1" else "d2")

    // batch 1: t2 insert (2 cols); ALTER both tables; t1 insert (3
    // cols) — pgoutput re-announces ONLY t1 (its DML arrived)
    val batch1: Seq[(Long, Message)] = Seq(
      1L -> (r1(false): Message), 2L -> (r2(false): Message),
      3L -> Begin(9L, PgEpochMicros, 1),
      4L -> Insert(rel2, tuple(Some("1"), Some("2"))),
      9L -> Commit(0, 9L, 10L, PgEpochMicros),
      11L -> (r1(true): Message), // t1's lazy re-announce
      12L -> Begin(19L, PgEpochMicros + 1, 2),
      13L -> Insert(rel1, tuple(Some("1"), Some("2"), Some("2"))),
      19L -> Commit(0, 19L, 20L, PgEpochMicros + 1))
    val recs1 = batch1.flatMap { case (l, m) => dec.feed(l, encode(m)) }
    assert(recs1.count(_.recordType ==
      graft.model.ChangeRecord.TypeRelation) == 1) // t1 only

    val wal = tmpDir("churn_cutoff_wal")
    val base = tmpDir("churn_cutoff")
    ChangeLogWal.append(wal, recs1)
    val twoCol = StructType(Seq(
      StructField("id", LongType), StructField("c1", LongType)))
    val cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = twoCol, destinationTable = "d1",
      maxBatchSize = 2, // the reference pins MaxBatchSize=2
      extraTables = Map("d2" -> TableConfig(Seq("id"), twoCol)))
    val runner = new MirrorRunner(spark, cfg)
    runner.runAvailableNow()

    val d1 = runner.destination()
    assert(d1.columns.contains("c2"), "t1's delta must land")
    assert(d1.collect().head.getAs[Long]("c2") == 2L)
    val d2 = runner.destination("d2")
    assert(!d2.columns.contains("c2"),
      "t2 had no post-ALTER DML — its destination must NOT widen yet")
    assert(d2.collect().head.getAs[Long]("c1") == 2L)

    // batch 2: t2's own DML arrives → its lazy re-announce widens d2
    val batch2: Seq[(Long, Message)] = Seq(
      21L -> (r2(true): Message),
      22L -> Begin(29L, PgEpochMicros + 2, 3),
      23L -> Insert(rel2, tuple(Some("2"), Some("2"), Some("2"))),
      29L -> Commit(0, 29L, 30L, PgEpochMicros + 2))
    ChangeLogWal.append(wal,
      batch2.flatMap { case (l, m) => dec.feed(l, encode(m)) })
    runner.runAvailableNow()
    val d2b = runner.destination("d2")
    assert(d2b.columns.contains("c2"))
    val by = d2b.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(by(2L).getAs[Long]("c2") == 2L)
    assert(by(1L).isNullAt(by(1L).fieldIndex("c2"))) // backfill-as-null
  }

  test("leaf partitions with DIFFERENT column ordering merge into " +
    "one root destination (generic_test.go:391): decode is by the " +
    "leaf's OWN relation order, rows land by name") {
    val (leafA, leafB) = (80, 81)
    // same logical columns, different physical attribute order (what
    // ALTER history on one partition produces)
    val relA = Relation(leafA, "public", "part_2024", 'd'.toInt,
      cols("id" -> Oid.Int8, "name" -> Oid.Text, "v" -> Oid.Int8))
    val relB = Relation(leafB, "public", "part_2025", 'd'.toInt,
      cols("id" -> Oid.Int8, "v" -> Oid.Int8, "name" -> Oid.Text))

    val dec = new PgOutputDecoder(_ => true,
      s => if (s.startsWith("public.part_")) "root" else s)
    val records = Seq[(Long, Message)](
      1L -> (relA: Message), 2L -> (relB: Message),
      3L -> Begin(9L, PgEpochMicros, 1),
      4L -> Insert(leafA, tuple(Some("1"), Some("alpha"), Some("10"))),
      5L -> Insert(leafB, tuple(Some("2"), Some("20"), Some("beta"))),
      9L -> Commit(0, 9L, 10L, PgEpochMicros)
    ).flatMap { case (l, m) => dec.feed(l, encode(m)) }
    assert(records.forall(_.destinationTable == "root"))

    val wal = tmpDir("churn_order_wal")
    val base = tmpDir("churn_order")
    ChangeLogWal.append(wal, records)
    val runner = new MirrorRunner(spark, MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("v", LongType))),
      destinationTable = "root"))
    runner.runAvailableNow()
    val by = runner.destination().collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(by.keySet == Set(1L, 2L))
    assert(by(1L).getAs[String]("name") == "alpha" &&
      by(1L).getAs[Long]("v") == 10L)
    assert(by(2L).getAs[String]("name") == "beta" &&
      by(2L).getAs[Long]("v") == 20L)
  }

  test("lost column: consecutive added columns across separate sync " +
    "batches and a runner restart both survive (deltas are the only " +
    "schema channel; recovery re-widens from the persisted schema)") {
    val relId = 70
    def rel(n: Int) = Relation(relId, "public", "t", 'd'.toInt,
      cols(Seq("id" -> Oid.Int8) ++
        Seq("c_good" -> Oid.Int8, "c_lost" -> Oid.Int8).take(n): _*))

    val dec = new PgOutputDecoder(_ => true, _ => "t")
    val wal = tmpDir("churn_lost_wal")
    val base = tmpDir("churn_lost")
    def cfg = MirrorConfig(
      walDir = wal, rawDir = s"$base/raw", destDir = s"$base/dest",
      checkpointDir = s"$base/ckpt", pkColumns = Seq("id"),
      payloadSchema = StructType(Seq(StructField("id", LongType))),
      destinationTable = "t", maxBatchSize = 2)

    // batch 1: base row, then ALTER ADD c_good + DML
    ChangeLogWal.append(wal, Seq(
      1L -> (rel(0): Message),
      2L -> Begin(9L, PgEpochMicros, 1),
      3L -> Insert(relId, tuple(Some("1"))),
      9L -> Commit(0, 9L, 10L, PgEpochMicros),
      11L -> (rel(1): Message),
      12L -> Begin(19L, PgEpochMicros + 1, 2),
      13L -> Insert(relId, tuple(Some("2"), Some("22"))),
      19L -> Commit(0, 19L, 20L, PgEpochMicros + 1)
    ).flatMap { case (l, m) => dec.feed(l, encode(m)) })
    new MirrorRunner(spark, cfg).runAvailableNow()

    // batch 2, NEW runner (restart): ALTER ADD c_lost + DML
    ChangeLogWal.append(wal, Seq(
      21L -> (rel(2): Message),
      22L -> Begin(29L, PgEpochMicros + 2, 3),
      23L -> Insert(relId, tuple(Some("3"), Some("33"), Some("333"))),
      29L -> Commit(0, 29L, 30L, PgEpochMicros + 2)
    ).flatMap { case (l, m) => dec.feed(l, encode(m)) })
    val restarted = new MirrorRunner(spark, cfg)
    restarted.runAvailableNow()

    val dest = restarted.destination()
    assert(dest.columns.toSet == Set("id", "c_good", "c_lost") ||
      dest.columns.filter(Seq("id", "c_good", "c_lost").contains)
        .length == 3)
    val by = dest.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(by.keySet == Set(1L, 2L, 3L))
    assert(by(2L).getAs[Long]("c_good") == 22L)
    assert(by(3L).getAs[Long]("c_good") == 33L)
    assert(by(3L).getAs[Long]("c_lost") == 333L)
    assert(by(1L).isNullAt(by(1L).fieldIndex("c_good")))
    assert(by(2L).isNullAt(by(2L).fieldIndex("c_lost")))
  }
}
