package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming statement of corpus ingestion: the per-row curation ops
  * (quality features, PII redaction — pure codegen'd column expressions)
  * apply to a stream UNCHANGED, composed with watermark-bounded exact
  * dedup on the content hash. This is the shape a continuous crawl feed
  * runs at 100 TB: stateless scoring at scan speed, state only in the
  * dedup operator, bounded by the watermark delay. */
class CurationStreamSpec extends SparkSpec {

  test("stream curation: quality gate + PII scrub + content-hash dedup") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")

    // Stateless curation stage — identical expressions to the batch
    // queries (q_text_quality's length gate, q_pii_scrub's redaction).
    val curated = docs
      .withColumn("n_words", size(split(col("text"), " ")))
      .filter(col("n_words") >= 3) // quality gate: too-short docs drop
      .withColumn("clean",
        expr("replace(text, 'customer', '[NAME]')"))
    // Watermark-bounded exact dedup on the scrubbed content hash.
    val deduped = StreamOps.dedupWithinWatermark(
      curated.withColumn("h", md5(col("clean"))),
      "ts", "10 minutes", Seq("h"))

    val q = deduped.writeStream.format("memory").queryName("curated_out")
      .outputMode("append").start()
    try {
      def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
      input.addData(
        (ts(1), 1L, "good customer document here"),
        (ts(2), 2L, "too short"),                    // gated out
        (ts(3), 3L, "good customer document here"),  // dup of 1 post-scrub
        (ts(4), 4L, "another fine document entirely"))
      q.processAllAvailable()
      val out = spark.sql("SELECT doc_id, clean FROM curated_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == Set(
        (1L, "good [NAME] document here"),
        (4L, "another fine document entirely")))
    } finally q.stop()
  }
}
