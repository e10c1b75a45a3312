package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc micro-benchmark harness for comparing alternative formulations
  * of a hot operator outside the Bench gate. Not part of the driver
  * contract. `sbt "runMain graft.MicroBench <which> [sfDir]"`. */
object MicroBench {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{TextFunctions => TF}

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    docs.localCheckpoint(true).count()

    args.headOption.getOrElse("simhash") match {
      case "simhash" =>
        // warm
        time("warm (60-agg)")(
          TF.simhashSignatures(docs, "doc_id", "text").count())
        (1 to 3).foreach { i =>
          time(s"60-agg run $i")(
            TF.simhashSignatures(docs, "doc_id", "text").count())
        }
        (1 to 3).foreach { i =>
          time(s"explode-bit run $i")(simhashExplodeBits(docs).count())
        }
        TF.simhashSignatures(docs, "doc_id", "text").explain("formatted")
      case other => sys.error(s"unknown micro-bench: $other")
    }
  }

  /** Alternative simhash shape: explode (id, bit) like Ivf's mean. */
  private def simhashExplodeBits(df: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val occ = df
      .select(col("doc_id"), explode(TF.words(col("text"))).as("w"))
      .withColumn("h", expr(TF.hash60Sql("w")))
    occ
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 59), b -> CAST(((h DIV shiftleft(1L, b)) & 1) AS BIGINT) * 2 - 1)"))
        .as(Seq("bit", "vote")))
      .groupBy("doc_id", "bit").agg(sum("vote").as("v"))
      .groupBy("doc_id")
      .agg(sum(when(col("v") >= 0,
        expr("shiftleft(1L, CAST(bit AS INT))")).otherwise(lit(0L)))
        .as("simhash"))
  }
}
