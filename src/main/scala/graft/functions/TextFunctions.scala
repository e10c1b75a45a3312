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

  /** 64-bit SimHash over word hashes: majority vote per bit. Each word is
    * hashed ONCE; the per-bit vote accumulates into a 64-slot array in a
    * single fold (hash count O(words), not O(64·words) — same
    * codegen-fallback reasoning as [[minhashSignature]]). One pass, no
    * shuffle; near-dup candidates then bucket by signature prefix. */
  def simhash(wsCol: String): Column = expr(
    s"""aggregate(
       |  transform($wsCol, w -> xxhash64(w)),
       |  array_repeat(0L, 64),
       |  (acc, h) -> zip_with(acc, sequence(0, 63), (a, b) ->
       |    a + CASE WHEN pmod(shiftrightunsigned(h, b), 2) = 1
       |        THEN 1L ELSE -1L END),
       |  acc -> aggregate(
       |    zip_with(acc, sequence(0, 63), (a, b) ->
       |      CASE WHEN a >= 0L THEN shiftleft(1L, b) ELSE 0L END),
       |    0L, (x, y) -> x + y))""".stripMargin)

  /** Distributed SimHash: the DataFrame-level formulation for large
    * corpora. Instead of a per-row 64-slot lambda fold (which evaluates
    * outside codegen), the votes become ROWS: explode words → count terms
    * per doc (term-frequency weights) → explode the 64 bits → two fully
    * codegen'd hash aggregations. Scales with cluster width; the Column
    * variant [[simhash]] remains for small/streaming batches.
    *
    * Returns (idCol, simhash) one row per input row. */
  def simhashSignatures(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val terms = df
      .select(col(idCol), explode(words(col(textCol))).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("tf"))
      .withColumn("h", xxhash64(col("w")))
    val votes = terms
      .select(col(idCol), posexplode(expr(
        "transform(sequence(0, 63), b -> " +
          "tf * (CAST(pmod(shiftrightunsigned(h, b), 2) AS BIGINT) * 2 - 1))"))
        .as(Seq("bit", "vote")))
      .groupBy(idCol, "bit").agg(sum("vote").as("vote"))
    votes.groupBy(idCol)
      .agg(sum(when(col("vote") >= 0,
        expr("shiftleft(1L, bit)")).otherwise(0L)).as("simhash"))
  }

  /** Permutation i of a base hash: rotl(h, i+1) XOR (i · golden32).
    * Bijective and built from bit ops only — `h * c` / `h + c` would raise
    * under ANSI mode (Spark 4 default) on the inevitable 64-bit wrap. With
    * a literal `i` the shifts constant-fold and the whole expression stays
    * inside whole-stage codegen. */
  private def permHashSql(h: String, i: Int): String =
    s"(shiftleft($h, ${i + 1}) | shiftrightunsigned($h, ${63 - i}))" +
      s" ^ ${i.toLong * 2654435769L}L"

  /** Distributed MinHash signatures — the scalable formulation. A lambda
    * version (`transform(perms, i -> array_min(transform(shingles, ...)))`)
    * is a trap twice over: higher-order lambdas run interpreted outside
    * codegen, AND Catalyst does not hoist the loop-invariant inner
    * hash-transform, so every permutation re-hashes every shingle. Here the
    * shingle set explodes to rows once, `xxhash64` runs once per shingle
    * inside codegen, and the k signature slots are k `min` aggregates of
    * cheap constant-folded bit permutations — one hash-aggregate shuffle,
    * arbitrarily wide corpus.
    *
    * Returns (idCol, sig: array<bigint>[k]). */
  def minhashSignaturesDf(df: org.apache.spark.sql.DataFrame, idCol: String,
      shingles: Column, k: Int): org.apache.spark.sql.DataFrame = {
    val sh = df
      .select(col(idCol), explode(array_distinct(shingles)).as("s"))
      .withColumn("h", xxhash64(col("s")))
    val mins = (0 until k).map(i =>
      min(expr(permHashSql("h", i))).as(s"m$i"))
    sh.groupBy(idCol)
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH band keys over a MinHash signature: `bands` keys, each an
    * arithmetic fold (×31 rolling) of `rowsPerBand` consecutive signature
    * slots seeded with the band index. Docs sharing any (band, key) become
    * near-dup candidates — the equi-join key that replaces the quadratic
    * all-pairs comparison at scale. */
  def minhashBands(sigCol: String, bands: Int, rowsPerBand: Int): Column =
    expr( // rotate-xor fold: overflow-free under ANSI mode
      s"""transform(sequence(0, ${bands - 1}), bi ->
         |  aggregate(slice($sigCol, bi * $rowsPerBand + 1, $rowsPerBand),
         |    CAST(bi AS BIGINT),
         |    (acc, x) -> (shiftleft(acc, 5) | shiftrightunsigned(acc, 59))
         |                ^ x))""".stripMargin)
}
