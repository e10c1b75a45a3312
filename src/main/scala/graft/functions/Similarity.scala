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

  // ---------------------------------------------- engine-portable (integer)
  //
  // The LSH/near-dup paths below work on QUANTIZED embeddings
  // (floor(x·1024) — exact: scaling a float by a power of two is lossless
  // in double, and floor is engine-uniform), so every projection, dot
  // product and threshold is EXACT INTEGER arithmetic: bit-identical in
  // Spark and the DuckDB oracle, and immune to summation-order FP drift.
  // Quantized LSH/dedup is also simply what one ships at 10^9 vectors.

  /** ±1 hyperplane component for (plane h, dimension j): a small
    * xorshift-multiply avalanche over integers < 2^36 — identical
    * arithmetic in both engines, no overflow anywhere. Yields the SQL
    * text of ±1 as a BIGINT expression given 0-based h and j exprs. */
  private def signSql(h: String, j: String, idiv: String): String = {
    val m = s"(($h) * 2654435761L + ($j) * 40503L)"
    val v = s"((($m) ^ (($m) $idiv 8192)) & 65535)"
    s"(((($v) * 40503) $idiv 2048) & 1) * 2 - 1"
  }

  /** Random-hyperplane LSH bucket over the quantized embedding: `nBits`
    * sign bits of integer projections onto deterministic ±1 hyperplanes.
    * Vectors in the same bucket are ANN candidates; the bucket id is a
    * shuffle-friendly integer join key. Codegen'd fused loop
    * ([[HyperplaneBucketExpr]]); [[hyperplaneBucketHof]] is the
    * same arithmetic as a higher-order SQL expression (the semantic
    * reference the spec compares against). */
  def hyperplaneBucket(embCol: String, nBits: Int): Column =
    QuantizedExprs.hyperplaneBucket(col(embCol), nBits)

  /** Table `t` of a MULTI-TABLE LSH family: the same bucketing over a
    * DISJOINT plane range (planes t·nBits … (t+1)·nBits−1). L
    * independent tables united raise sign-LSH recall from p to
    * 1−(1−p)^L at ~L× candidate cost — the recall lever
    * [[adaptiveHyperplanes]] documents for grown corpora. Table 0 is
    * bit-identical to [[hyperplaneBucket]]. */
  def hyperplaneBucketTable(embCol: String, nBits: Int,
      table: Int): Column =
    QuantizedExprs.hyperplaneBucket(col(embCol), nBits,
      planeOffset = table * nBits)

  /** Corpus-adaptive hyperplane count targeting ~`targetBucket`
    * vectors per LSH bucket. A FIXED bit count is a scale hazard: with
    * 2^b buckets, bucket population grows linearly with the corpus and
    * candidate self-join pairs QUADRATICALLY (the 100× soak measured
    * 5.4 GB of spill on the kNN graph at 6 bits / 200k vectors).
    * Floored at 6 so every oracle-tested regime (≤4096 vectors:
    * log2(4096/64) = 6) keeps the exact fixture bucketing — the
    * adaptive rule only engages on grown corpora, where near-identical
    * vectors (tiny angle) still collide at higher bit counts.
    *
    * Tradeoff, stated plainly: more bits cut candidate waste but also
    * recall for MODERATE-similarity pairs (sign-LSH collision
    * probability is (1−θ/π)^bits). Near-duplicates (θ→0) keep
    * colliding; a pair at cos≈0.3 increasingly does not. The measured
    * flip at 100×/200k vectors: kNN graph 64.5 s + 5.4 GB spill → 3.1 s
    * zero-spill, while the cos≥0.25 pair enumeration surfaced 8.5M of
    * its former 28.4M pairs. Recall above the fixture regime is the
    * multi-table lever (L independent hyperplane sets, union of
    * candidates, ~L× cost) — compose this helper per table. */
  def adaptiveHyperplanes(n: Long, targetBucket: Int = 64): Int =
    math.max(6, math.ceil(math.log(
      math.max(n, 1).toDouble / targetBucket) / math.log(2)).toInt)

  /** Higher-order-function formulation of [[hyperplaneBucket]] —
    * interpreted per element; kept as the executable spec. */
  def hyperplaneBucketHof(embCol: String, nBits: Int): Column = expr(
    s"""CAST(aggregate(transform(sequence(0, ${nBits - 1}), h ->
       |  CASE WHEN aggregate(
       |    transform($embCol, (x, j) ->
       |      CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT) *
       |        (${signSql("h", "j", "DIV")})),
       |    0L, (acc, v) -> acc + v) >= 0L
       |  THEN shiftleft(CAST(1 AS BIGINT), h) ELSE CAST(0 AS BIGINT) END),
       |  CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT)""".stripMargin)

  /** DuckDB replica of [[hyperplaneBucket]] (DuckDB lambdas index from 1,
    * hence the j−1). */
  def hyperplaneBucketDuckSql(embExpr: String, nBits: Int,
      planeOffset: Int = 0): String = {
    val m = s"((h + $planeOffset) * 2654435761 + (j - 1) * 40503)"
    val v = s"((xor($m, $m // 8192)) & 65535)"
    val sign = s"((($v * 40503) // 2048) & 1) * 2 - 1"
    s"""CAST(list_sum(list_transform(generate_series(0, ${nBits - 1}), h ->
       |  CASE WHEN list_sum(list_transform($embExpr, (x, j) ->
       |      CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT) * ($sign)))
       |    >= 0
       |  THEN (1::BIGINT << h) ELSE 0 END)) AS BIGINT)""".stripMargin
  }

  /** Quantized embedding: `array<bigint>` of floor(x·1024). */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * 1024).cast("bigint"))

  /** Integer near-duplicate test on quantized embeddings:
    * cos(a,b) ≥ τ  ⇔  dot ≥ 0 ∧ dot²·denom ≥ num·|a|²·|b|²  for
    * τ² = num/denom — exact integer comparison, engine-portable.
    * Codegen'd fused loop ([[QuantizedCosineGeExpr]]). */
  def quantizedCosineAtLeast(qa: Column, qb: Column,
      num: Long, denom: Long): Column =
    QuantizedExprs.quantizedCosineGe(qa, qb, num, denom)

  /** Higher-order-function formulation of [[quantizedCosineAtLeast]] —
    * the executable spec the codegen'd expression is tested against.
    * Spec-only caveat: the raw `dot·dot·denom` products run in SQL long
    * arithmetic, which under ANSI mode (default) THROWS on overflow where
    * the expression's 192-bit compare ([[Int192]]) stays exact — fine for
    * a test oracle on real-magnitude embeddings, not for the hot path. */
  def quantizedCosineAtLeastHof(qa: Column, qb: Column,
      num: Long, denom: Long): Column = {
    val dot = aggregate(zip_with(qa, qb, (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val na = aggregate(transform(qa, x => x * x), lit(0L),
      (acc, v) => acc + v)
    val nb = aggregate(transform(qb, x => x * x), lit(0L),
      (acc, v) => acc + v)
    dot >= 0 && dot * dot * denom >= na * nb * num
  }
}
