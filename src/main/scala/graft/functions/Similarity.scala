package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity operators over `Array[Float]` embedding columns.
  *
  * Pure higher-order Catalyst expressions (zip_with/aggregate — codegen'd):
  * no UDF boundary, so the brute-force path runs at full columnar speed and
  * the LSH path turns ANN into an equi-join on bucket keys — the shape that
  * scales to billions of vectors (bucket key shuffle instead of cross join).
  */
object Similarity {

  /** Dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity in double precision: the higher-order-function
    * formulation (allocates a zipped array, interpreted per element) —
    * kept as the reference implementation [[cosineFast]] is tested
    * against. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))

  /** Codegen'd cosine over `array<float>`: single fused loop, no
    * allocation ([[CosineSimilarityExpr]]) — the hot path for
    * million-vector ANN scans. Identical accumulation order to [[cosine]]
    * ⇒ bit-identical doubles. */
  def cosineFast(a: Column, b: Column): Column =
    CosineSimilarityExpr.cosineSim(a, b)

  /** Random-hyperplane LSH bucket: `nBits` sign bits of projections onto
    * deterministic ±1 hyperplanes (components derived from xxhash64 of
    * (plane, dim) — reproducible across runs and engines, no stored model).
    * Vectors in the same bucket are ANN candidates; the bucket id is a
    * shuffle-friendly integer join key. */
  def hyperplaneBucket(embCol: String, nBits: Int): Column = expr(
    s"""aggregate(transform(sequence(0, ${nBits - 1}), h ->
       |  CASE WHEN aggregate(
       |    transform($embCol, (x, j) ->
       |      CAST(x AS DOUBLE) *
       |        (CAST(pmod(xxhash64(h, j), 2) AS DOUBLE) * 2.0 - 1.0)),
       |    CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) >= 0.0
       |  THEN shiftleft(1, h) ELSE 0 END), 0, (a, x) -> a + x)"""
      .stripMargin)
}
