package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.cdc.ChangeLogWal
import graft.model.ChangeRecord

/** Stream-static enrichment: the change stream joins a dimension table
  * inside each micro-batch — how a CDC pipeline attaches reference data
  * (routing rules, tenant config, dimension attributes) without a
  * second stream. The static side broadcasts per batch; the stream side
  * never shuffles. */
class StreamStaticJoinSpec extends SparkSpec {

  private def rec(cp: Long, table: String, data: String): ChangeRecord =
    ChangeRecord(0, cp, cp.toString, cp * 1000, cp, table, table,
      data, null, Nil)

  test("change stream enriches against a broadcast dimension per batch") {
    val wal = tmpDir("sswal")
    val ckpt = tmpDir("ssckpt")
    ChangeLogWal.append(wal, Seq(
      rec(1, "t.orders", """{"nation":0}"""),
      rec(2, "t.orders", """{"nation":1}"""),
      rec(3, "t.orders", """{"nation":99}"""))) // no dim match

    val dim = spark.read
      .parquet("/root/testdata/sf0.001/nation.parquet")
      .select(col("n_nationkey").cast("long").as("nation"),
        col("n_name"))

    val out = new ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream
      .format("graft.cdc.ChangeLogSourceProvider")
      .option("path", wal)
      .load()
      .withColumn("nation", get_json_object(col("data"), "$.nation")
        .cast("long"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        // stream-static join runs inside the batch; dim broadcasts
        val enriched = df.join(broadcast(dim), Seq("nation"), "left")
          .select(col("checkpointId"),
            coalesce(col("n_name"), lit("UNKNOWN")).as("n_name"))
        val plan = enriched.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
        enriched.collect().foreach(r =>
          out.add(r.getLong(0) -> r.getString(1)))
        ()
      }
      .start()
    q.awaitTermination()

    val byCp = out.asScala.toMap
    assert(byCp.size == 3)
    assert(byCp(3L) == "UNKNOWN")
    assert(byCp(1L) != "UNKNOWN" && byCp(2L) != "UNKNOWN")
    assert(byCp(1L) != byCp(2L))
  }
}
