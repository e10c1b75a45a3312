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
