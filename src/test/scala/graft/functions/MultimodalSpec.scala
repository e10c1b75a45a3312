package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("binary payload pipeline: deterministic stub decode, partition-safe") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", "imagebytes"), (2L, "audio", "audiobytes"),
      (3L, "video", "videobytes"), (4L, "image", "")).toDF(
      "id", "modality", "body")
      .withColumn("payload", encode(col("body"), "UTF-8"))

    val feats = Multimodal.extractFeaturesDf(media, "id", "modality",
      "payload").collect().map(r =>
      r.getAs[Long]("id") -> r).toMap

    assert(feats(1L).getAs[Int]("frames") == 1) // images: single frame
    assert(feats(2L).getAs[Int]("frames") >= 1)
    assert(feats(1L).getAs[Long]("byteLen") == 10L)
    assert(!feats(4L).getAs[Boolean]("ok")) // empty payload flagged

    // determinism + partition independence: same result at any parallelism
    val again = Multimodal.extractFeaturesDf(media.repartition(7), "id",
      "modality", "payload").collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[Int]("width"), r.getAs[Int]("frames")))
      .toSet
    val first = feats.values.map(r => (r.getAs[Long]("id"),
      r.getAs[Int]("width"), r.getAs[Int]("frames"))).toSet
    assert(again == first)
  }
}
