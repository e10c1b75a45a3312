package graft.cdc

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model.{ChangeRecord, RawTable}

/** Differential test: the distributed Normalizer vs a trivially-correct
  * sequential fold over the same random change stream. Catches rule
  * interactions (TOAST × delete × reinsert × ties) targeted specs miss. */
class NormalizerPropertySpec extends SparkSpec {

  private val payloadSchema = StructType(Seq(
    StructField("id", LongType), StructField("a", StringType),
    StructField("b", LongType)))

  /** In-memory reference: apply records in (version, uid) order per key.
    * State per key: (a, b, deleted); absent columns keep prior value. */
  private def reference(recs: Seq[(Long, Int, Long, Option[String],
      Option[Long], Boolean, Boolean)])
      : Map[Long, (Option[String], Option[Long], Boolean)] = {
    // (version, rtype, id, a, b, aAbsent, bAbsent)
    val byKey = recs.groupBy(_._3)
    byKey.map { case (id, rs) =>
      var a: Option[String] = None
      var b: Option[Long] = None
      var deleted = false
      rs.sortBy(_._1).foreach {
        case (_, rt, _, av, bv, aAbs, bAbs) =>
          if (rt == ChangeRecord.TypeDelete) deleted = true
          else {
            deleted = false
            if (!aAbs) a = av
            if (!bAbs) b = bv
          }
      }
      id -> ((a, b, deleted))
    }
  }

  test("pk-changing updates: random streams match the fold with old-key deletes") {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(777L)
    // (version, oldId, newId, b): an update that may move the row to a
    // new key; oldId == newId means a plain update.
    val recs = (1 to 200).map { i =>
      val oldId = 1L + rnd.nextInt(12)
      val newId = if (rnd.nextInt(4) == 0) 1L + rnd.nextInt(12) else oldId
      (i.toLong, oldId, newId, i.toLong * 3)
    }
    // Reference fold: each record upserts newId and, when the key moved,
    // tombstones oldId at version−1 (unless something newer claimed it).
    val lastWrite = scala.collection.mutable.Map.empty[Long, (Long, Boolean, Long)]
    // key -> (version, deleted, b)
    recs.foreach { case (ver, oldId, newId, b) =>
      if (oldId != newId) {
        val tombVer = ver - 1
        if (lastWrite.get(oldId).forall(_._1 <= tombVer))
          lastWrite(oldId) = (tombVer, true, 0L)
      }
      if (lastWrite.get(newId).forall(_._1 <= ver))
        lastWrite(newId) = (ver, false, b)
    }
    val want = lastWrite.toMap

    val rows = recs.map { case (ver, oldId, newId, b) =>
      org.apache.spark.sql.Row(
        f"u$ver%09d", ver, "dest", s"""{"id":$newId,"b":$b}""",
        graft.model.ChangeRecord.TypeUpdate, s"""{"id":$oldId}""", 0L, "")
    }
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("b", LongType)))
    val got = Normalizer.normalize(
      spark.createDataFrame(rows.asJava, RawTable.schema).repartition(5),
      NormalizeConfig(Seq("id"), schema))
      .collect().map { r =>
        r.getAs[Long]("id") -> ((r.getAs[Long](RawTable.Version),
          r.getAs[Boolean](RawTable.IsDeleted)))
      }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (ver, deleted, b)) =>
      val (gv, gd) = got(id)
      assert(gv == ver && gd == deleted, s"id=$id got=($gv,$gd)")
    }
  }

  test("normalize equals the sequential fold on random streams") {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(20260812L)
    for (round <- 1 to 3) {
      val recs = (1 to 300).map { i =>
        val ver = i.toLong // unique version = unambiguous order
        val id = 1L + rnd.nextInt(25)
        val rt = rnd.nextInt(10) match {
          case 0 => ChangeRecord.TypeDelete
          case n if n <= 4 => ChangeRecord.TypeInsert
          case _ => ChangeRecord.TypeUpdate
        }
        val aAbs = rt == ChangeRecord.TypeUpdate && rnd.nextBoolean()
        val bAbs = rt == ChangeRecord.TypeUpdate && rnd.nextBoolean()
        val av = if (rnd.nextInt(5) == 0) None else Some(s"a$i")
        val bv = if (rnd.nextInt(5) == 0) None else Some(i.toLong * 7)
        (ver, rt, id, av, bv, aAbs, bAbs)
      }
      val rows = recs.map { case (ver, rt, id, av, bv, aAbs, bAbs) =>
        val fields = Seq(s""""id":$id""") ++
          (if (aAbs) Nil
           else Seq(av.map(v => s""""a":"$v"""").getOrElse(""""a":null"""))) ++
          (if (bAbs) Nil
           else Seq(bv.map(v => s""""b":$v""").getOrElse(""""b":null""")))
        val data =
          if (rt == ChangeRecord.TypeDelete) null
          else fields.mkString("{", ",", "}")
        val toast = Seq(if (aAbs) Some("a") else None,
          if (bAbs) Some("b") else None).flatten.mkString(",")
        org.apache.spark.sql.Row(
          f"u$ver%09d", ver, "dest", data, rt, s"""{"id":$id}""", 0L, toast)
      }
      val raw = spark.createDataFrame(rows.asJava, RawTable.schema)
        .repartition(7) // order must come from (version, uid), not input
      val got = Normalizer.normalize(raw,
        NormalizeConfig(Seq("id"), payloadSchema))
        .collect().map { r =>
          r.getAs[Long]("id") -> ((Option(r.getAs[String]("a")),
            Option(r.getAs[java.lang.Long]("b")).map(_.longValue()),
            r.getAs[Boolean](RawTable.IsDeleted)))
        }.toMap
      val want = reference(recs)
      assert(got.keySet == want.keySet, s"round $round keys")
      want.foreach { case (id, (a, b, deleted)) =>
        val (ga, gb, gd) = got(id)
        assert(gd == deleted, s"round $round id=$id deleted")
        if (!deleted) {
          assert(ga == a, s"round $round id=$id a")
          assert(gb == b, s"round $round id=$id b")
        }
      }
    }
  }
}
