package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming MinHash-LSH near-dup: planted near-duplicates across
  * MICROBATCHES match against RocksDB bucket state recovered from the
  * checkpoint; re-delivery of a seen doc neither self-matches nor
  * double-registers; unrelated docs stay silent. */
class NearDupStreamSpec extends SparkSpec {

  private def text(words: Seq[String]) = words.mkString(" ")
  // 30 shared words; the near-dup rewrites the last two — shingle
  // Jaccard ≈ 26/30, so ~87% of MinHash slots agree in expectation.
  private val base = (0 until 30).map(i => s"w$i")
  private val docA = text(base)
  private val docB = text(base.dropRight(2) ++ Seq("x1", "x2"))
  private val docC = text((0 until 30).map(i => s"z$i"))
  private val docD = text((0 until 30).map(i => s"y$i"))

  test("cross-batch near-dup match with checkpoint recovery") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("ndup_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val collected = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long, Long)]()
    def runPhase(): Unit = {
      val matches = NearDupStream.nearDups(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        java.time.Duration.ofHours(1), minSamePm = 500L)
      val q = matches.writeStream
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[NearDupStream.Match],
              _: Long) =>
            ds.collect().foreach(m =>
              collected.add((m.docId, m.matchId, m.samePm)))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.Once())
        .start()
      try q.awaitTermination() finally q.stop()
    }
    try {
      input.addData((1L, docA), (3L, docC))
      runPhase()
      assert(collected.isEmpty, "unrelated docs must not match")
      // phase 2, new query instance on the same checkpoint: the
      // near-dup of doc 1 matches against RECOVERED bucket state; doc 1
      // re-delivered is recognized, not self-matched; doc 4 is silent
      input.addData((2L, docB), (1L, docA), (4L, docD))
      runPhase()
      import scala.jdk.CollectionConverters._
      val pairs = collected.asScala.map(t => (t._1, t._2)).toSet
      assert(pairs == Set((2L, 1L)), s"got $pairs")
      val pms = collected.asScala.map(_._3)
      assert(pms.forall(pm => pm >= 500L && pm <= 1000L), pms)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("within-batch pairs match too, and the emitted estimate tracks " +
    "the true shingle Jaccard") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files
      .createTempDirectory("ndup_ckpt2").toString
    val input = MemoryStream[(Long, String)]
    val collected = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long, Long)]()
    val q = NearDupStream.nearDups(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        java.time.Duration.ofHours(1), minSamePm = 500L)
      .writeStream
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[NearDupStream.Match],
            _: Long) =>
          ds.collect().foreach(m =>
            collected.add((m.docId, m.matchId, m.samePm)))
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.Once())
      .start()
    try {
      input.addData((10L, docA), (11L, docB), (12L, docC))
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      val pairs = collected.asScala.map(t => (t._1, t._2)).toSet
      // arrival order within the bucket decides direction; both rows
      // are in the same microbatch, so accept either orientation but
      // exactly one pair
      assert(pairs == Set((11L, 10L)) || pairs == Set((10L, 11L)),
        s"got $pairs")
      // true shingle Jaccard here is 26/30 ≈ 0.87 → the 32-slot
      // estimate must land in a wide-but-meaningful band around it
      val pms = collected.asScala.map(_._3)
      assert(pms.forall(pm => pm >= 600L && pm <= 1000L), pms)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
