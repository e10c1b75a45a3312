package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}

/** The fused signature expressions must equal the aggregate formulations
  * bit-for-bit — they feed the same DuckDB oracles. */
class SignatureExprsSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("hash60 JVM twin equals the SQL formulation") {
    val rows = docs
      .select(explode(TF.words(col("text"))).as("w")).limit(500)
      .select(col("w"), expr(TF.hash60Sql("w")).as("sql_h"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(TextHash.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          r.getString(0))) == r.getLong(1), r.getString(0))
    }
  }

  test("fused minhash signature equals explode+min-aggregate signature") {
    val base = docs
      .select(col("doc_id"), TF.words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
    val agg = TF.minhashSignaturesDf(
        base, "doc_id", TF.wordShingles(col("ws"), 3), 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val fused = base
      .select(col("doc_id"), SignatureExprs.minhashSig(
        array_distinct(TF.wordShingles(col("ws"), 3)), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(fused.nonEmpty && fused == agg)
  }

  test("fused simhash equals explode+vote-aggregate simhash") {
    val agg = TF.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fused = docs
      .select(col("doc_id"),
        SignatureExprs.simhash60(TF.words(col("text"))).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused.nonEmpty && fused == agg)
  }

  test("hash60 edge inputs: empty string, unicode, long tokens") {
    import spark.implicits._
    val inputs = Seq("", "的", "naïve", "🎉🎊", "a" * 10000, " ", "\t")
    val rows = inputs.toDF("w")
      .select(col("w"), expr(TF.hash60Sql("w")).as("sql_h")).collect()
    rows.foreach { r =>
      assert(TextHash.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          r.getString(0))) == r.getLong(1),
        s"input=${r.getString(0).take(20)}")
    }
  }

  test("fused word shingles equal the HOF formulation, order included") {
    val rows = docs.limit(200)
      .select(
        TF.wordShingles(TF.words(col("text")), 3).as("hof"),
        SignatureExprs.wordShingles(TF.words(col("text")), 3).as("fused"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
    // Degenerate widths: fewer words than n -> empty, n=1 -> identity.
    import spark.implicits._
    val tiny = Seq(Seq("a", "b")).toDF("ws")
      .select(SignatureExprs.wordShingles(col("ws"), 3).as("s3"),
        SignatureExprs.wordShingles(col("ws"), 1).as("s1"))
      .collect().head
    assert(tiny.getSeq[String](0).isEmpty)
    assert(tiny.getSeq[String](1) == Seq("a", "b"))
  }

  test("null semantics: null array -> null signature") {
    import spark.implicits._
    val df = Seq((1L, Some(Seq("a b c"))), (2L, None))
      .toDF("id", "shs")
    val out = df.select(col("id"),
      SignatureExprs.minhashSig(col("shs"), 4).as("sig"),
      SignatureExprs.simhash60(col("shs")).as("sh"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2)))
      .toMap
    assert(out(1L) == ((false, false)))
    assert(out(2L) == ((true, true)))
  }

  test("topWordCount equals the explode -> groupBy max formulation " +
    "(the repetition gate's zero-shuffle twin)") {
    val viaExpr = docs
      .select(col("doc_id"),
        SignatureExprs.topWordCount(TF.words(col("text"))).as("top"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExplode = docs
      .select(col("doc_id"), explode(TF.words(col("text"))).as("w"))
      .groupBy("doc_id", "w").count()
      .groupBy("doc_id").agg(max("count").as("top"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExplode.nonEmpty)
    // every doc the explode formulation sees (>= 1 word) must agree
    viaExplode.foreach { case (id, top) =>
      assert(viaExpr(id) == top, s"doc $id: $top != ${viaExpr(id)}")
    }
  }

  test("topWordCount edge cases: empty -> 0, null -> null, ties") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, None),
      (3L, Some(Seq("a", "b", "a", "b"))),
      (4L, Some(Seq("x"))))
      .toDF("id", "ws")
    val out = df.select(col("id"),
        SignatureExprs.topWordCount(col("ws")).as("top"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L).contains(0L))
    assert(out(2L).isEmpty)
    assert(out(3L).contains(2L))
    assert(out(4L).contains(1L))
  }
}
