package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model.RawTable

class MergeWriterSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("v", LongType),
    StructField(RawTable.Version, LongType),
    StructField(RawTable.IsDeleted, BooleanType),
    StructField(Normalizer.AbsentCols, ArrayType(StringType))))

  private def changes(rows: (Long, String, Any, Long, Boolean, Seq[String])*)
      : DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.toList.map { case (id, n, v, ver, del, abs) =>
      org.apache.spark.sql.Row(id, n, v, ver, del, abs)
    }.asJava, schema)
  }

  private def state(w: MergeWriter): Map[Long, (String, Any, Long, Boolean)] =
    w.read().collect().map { r =>
      r.getAs[Long]("id") -> (r.getAs[String]("name"), r.get(r.fieldIndex("v")),
        r.getAs[Long](RawTable.Version), r.getAs[Boolean](RawTable.IsDeleted))
    }.toMap

  test("merge: insert, update, toast-coalesce, delete; idempotent replay") {
    val path = tmpDir("merge")
    val w = new MergeWriter(spark, s"$path/t", Seq("id"), numBuckets = 8)

    w.merge(changes(
      (1L, "a", 10L, 100L, false, Nil),
      (2L, "b", 20L, 100L, false, Nil)))
    assert(state(w) == Map(
      1L -> ("a", 10L, 100L, false), 2L -> ("b", 20L, 100L, false)))

    val batch2 = changes(
      (1L, null, 11L, 200L, false, Seq("name")), // name absent → keep "a"
      (2L, null, null, 200L, true, Nil),         // delete
      (3L, "c", 30L, 200L, false, Nil))          // new key
    w.merge(batch2)
    val s2 = state(w)
    assert(s2(1L) == ("a", 11L, 200L, false))
    assert(s2(2L)._4 == true)
    assert(s2(3L) == ("c", 30L, 200L, false))

    // at-least-once: replaying the same batch must not change state
    w.merge(batch2)
    assert(state(w) == s2)

    // stale batch (older version) must not clobber
    w.merge(changes((1L, "stale", 1L, 50L, false, Nil)))
    assert(state(w)(1L) == ("a", 11L, 200L, false))
  }

  test("hard delete clears rows and empty buckets") {
    val path = tmpDir("merge-hard")
    val w = new MergeWriter(spark, s"$path/t", Seq("id"), numBuckets = 4)
    w.merge(changes((1L, "a", 1L, 1L, false, Nil)), hardDelete = true)
    assert(w.read().count() == 1)
    w.merge(changes((1L, null, null, 2L, true, Nil)), hardDelete = true)
    assert(w.read().count() == 0)
  }

  test("only affected buckets are rewritten") {
    val path = tmpDir("merge-prune")
    val w = new MergeWriter(spark, s"$path/t", Seq("id"), numBuckets = 64)
    w.merge(changes((1 to 200).map(i =>
      (i.toLong, s"n$i", i.toLong, 1L, false, Seq.empty[String])): _*))
    val before = bucketMtimes(s"$path/t")
    Thread.sleep(1100) // parquet mtime granularity
    w.merge(changes((1L, "x", 99L, 2L, false, Nil)))
    val after = bucketMtimes(s"$path/t")
    val changedBuckets = after.filter { case (b, t) => before.get(b) != Some(t) }
    assert(changedBuckets.size == 1, s"rewrote ${changedBuckets.keys}")
    assert(state(w)(1L) == ("x", 99L, 2L, false))
    assert(state(w).size == 200)
  }

  private def bucketMtimes(path: String): Map[String, Long] = {
    val d = new java.io.File(path)
    d.listFiles().filter(_.getName.startsWith("_g_bucket=")).map { f =>
      f.getName -> f.listFiles().map(_.lastModified()).max
    }.toMap
  }
}
