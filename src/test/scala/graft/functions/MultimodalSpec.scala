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

  test("resize plan fits within box, never upscales; frame sampling") {
    import spark.implicits._
    val df = Seq(
      (1L, 1920, 1080, 100L), // wide: fit 336x189
      (2L, 1080, 1920, 100L), // tall: fit 189x336
      (3L, 100, 50, 3L))      // small: untouched, frames < n
      .toDF("id", "w", "h", "frames")
      .select(col("id"),
        Multimodal.resizePlan("w", "h", 336, 336).as("fit"),
        Multimodal.frameSampleIndices("frames", 8).as("idx"))
      .collect().map(r => (r.getAs[Long]("id"),
        (r.getStruct(1).getInt(0), r.getStruct(1).getInt(1),
          r.getSeq[Int](2).toSeq))).toMap
    assert(df(1L) == ((336, 189, (0 until 8).map(i => i * 100 / 8))))
    assert(df(2L) == ((189, 336, (0 until 8).map(i => i * 100 / 8))))
    assert(df(3L) == ((100, 50, Seq(0, 1, 2)))) // no upscale, all frames
  }
}
