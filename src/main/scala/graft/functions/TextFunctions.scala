package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All of these are pure Catalyst column expressions (higher-order array
  * functions — codegen'd, no UDFs, no serialization boundary), so they
  * vectorize inside whole-stage codegen and scale linearly with the corpus:
  * at 100 TB each document row is processed independently — no shuffle at
  * all until an aggregation keys on the derived values.
  */
object TextFunctions {

  /** Whitespace tokenization (single-space convention of the corpus). */
  def words(text: Column): Column = split(text, " ")

  /** Count of an exact marker word among tokens. */
  def markerCount(ws: Column, word: String): Column =
    size(filter(ws, w => w === lit(word)))

  /** Regex token count (BPE-ish pre-tokenizer shape: letter runs). */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+"))

  /** Contiguous word n-gram shingles, joined with single spaces. Empty
    * array when the document has fewer than n words. */
  def wordShingles(ws: Column, n: Int): Column = {
    val make = transform(sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*))
    when(size(ws) >= n, make).otherwise(array().cast("array<string>"))
  }

  /** Order-sensitive document fingerprint: position-weighted rolling sum of
    * per-word codes, mod 1e9+7. Integer-exact and associative-safe (the sum
    * is order-independent; position weights carry the order), so partial
    * aggregation at scale is exact. */
  def fingerprint(ws: Column): Column = {
    val codes = transform(ws, (w, i) =>
      (i + lit(1)).cast("bigint") *
        (length(w).cast("bigint") * 7 + ascii(substring(w, 1, 1))))
    pmod(aggregate(codes, lit(0L), (acc, x) => acc + x), lit(1000000007L))
  }

  /** SQL text of [[fingerprint]] for oracle parity (DuckDB: 1-based lambda
    * index, list_sum). */
  def fingerprintDuckSql(wsExpr: String): String =
    s"CAST(list_sum(list_transform($wsExpr, (x, i) -> " +
      s"i * (length(x) * 7 + ascii(substr(x, 1, 1))))) % 1000000007 AS BIGINT)"

  /** 64-bit SimHash over word hashes (xxhash64): majority vote per bit.
    * One pass, no shuffle; near-dup candidates then bucket by prefix. */
  def simhash(wsCol: String): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, 63), b ->
       |    CASE WHEN aggregate($wsCol, 0L, (acc, w) ->
       |      acc + CASE WHEN pmod(shiftrightunsigned(xxhash64(w), b), 2) = 1
       |            THEN 1L ELSE -1L END) >= 0L
       |    THEN shiftleft(1L, b) ELSE 0L END),
       |  0L, (a, x) -> a + x)""".stripMargin)

  /** MinHash signature: the expensive string hash runs ONCE per shingle
    * (`xxhash64(s)`); the k independent views are affine permutations of
    * that base hash (odd multiplier + golden-ratio offset, wrap-around
    * 64-bit arithmetic) — the standard a·h+b permutation family. This keeps
    * the per-document cost at O(shingles + k·shingles integer mul-adds)
    * instead of O(k·shingles string hashes), which matters because
    * higher-order array lambdas evaluate outside whole-stage codegen. */
  def minhashSignature(shinglesCol: String, k: Int): Column = expr(
    s"""transform(sequence(0, ${k - 1}), i ->
       |  array_min(transform(transform($shinglesCol, s -> xxhash64(s)),
       |    h -> h * CAST(2 * i + 1 AS BIGINT)
       |         + CAST(i AS BIGINT) * -7046029254386353131L)))"""
      .stripMargin)

  /** LSH band keys over a MinHash signature: `bands` keys, each an
    * arithmetic fold (×31 rolling) of `rowsPerBand` consecutive signature
    * slots seeded with the band index. Docs sharing any (band, key) become
    * near-dup candidates — the equi-join key that replaces the quadratic
    * all-pairs comparison at scale. */
  def minhashBands(sigCol: String, bands: Int, rowsPerBand: Int): Column =
    expr(
      s"""transform(sequence(0, ${bands - 1}), bi ->
         |  aggregate(slice($sigCol, bi * $rowsPerBand + 1, $rowsPerBand),
         |    CAST(bi AS BIGINT), (acc, x) -> acc * 31L + x))""".stripMargin)
}
