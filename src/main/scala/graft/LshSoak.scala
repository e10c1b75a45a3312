package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Scale measurement for the multi-table LSH recall lever
  * (`Similarity.hyperplaneBucketTable` / `q_lsh_multitable`): grows
  * the embeddings table by `factor` with deterministic jittered
  * replicas (replicas of one base vector are true near-duplicates BY
  * CONSTRUCTION — tiny angle, the regime dedup actually targets),
  * then measures, per cumulative table count L, how many replica
  * pairs the united candidates surface and at what candidate cost,
  * under the SAME corpus-adaptive bit count production uses.
  *
  * This quantifies the tradeoff [[Similarity.adaptiveHyperplanes]]
  * documents: adaptive bits keep the self-join linear but cost recall
  * above the fixture regime; L independent tables buy it back at ~L×
  * candidate cost (1−(1−p)^L). Run:
  *
  *   sbt "runMain graft.LshSoak /root/testdata/sf0.1 10 3"
  *
  * One JSON line per L with seconds, candidate pairs, and replica
  * recall per-mille.
  */
object LshSoak {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: LshSoak <sfDir> <factor> <maxTables> [jitterMilli]")
    val dir = args(0)
    val factor = args(1).toInt
    val maxTables = args(2).toInt
    // ±jitter per dimension, in thousandths (default 0.02)
    val jitterMilli = args.lift(3).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-lsh-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val big = grownCorpus(spark, dir, factor, jitterMilli)
      .localCheckpoint(true)
    val n = big.count()
    val bits = Similarity.adaptiveHyperplanes(n)
    // total replica pairs: nBase * C(factor, 2)
    val nBase = n / factor
    val truePairs = nBase * (factor.toLong * (factor - 1) / 2)
    // scalastyle:off println
    println(s"""{"corpus":$n,"bits":$bits,"factor":$factor,""" +
      s""""jitter_milli":$jitterMilli,"replica_pairs":$truePairs}""")

    (1 to maxTables).foreach { l =>
      val t0 = System.nanoTime
      val buckets = (0 until l).map { t =>
        big.select(lit(t).as("t"), col("vec_id"),
          Similarity.hyperplaneBucketTable("embedding", bits, t)
            .as("bucket"))
      }.reduce(_ unionAll _)
      val cand = buckets.as("a")
        .join(buckets.as("b").hint("shuffle_hash"),
          col("a.t") === col("b.t") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
        .distinct()
      val agg = cand.agg(
        count(lit(1)).as("n_cand"),
        sum(when(col("d1").divide(factor).cast("long") ===
          col("d2").divide(factor).cast("long"), 1L)
          .otherwise(0L)).as("n_replica_hits")).head()
      val sec = (System.nanoTime - t0) / 1e9
      val nCand = agg.getLong(0)
      val hits = agg.getLong(1)
      println(f"""{"tables":$l,"sec":$sec%.2f,"n_cand":$nCand,""" +
        s""""replica_hits":$hits,"replica_recall_pm":""" +
        s"""${hits * 1000 / math.max(truePairs, 1L)}}""")
    }
    // scalastyle:on println
    spark.stop()
  }

  /** factor× corpus: replica r of base vector v gets a deterministic
    * per-(base, r, dim) jitter in [−j, +j] (thousandths), replica 0
    * is the base itself. Near-dup clusters therefore GROW with scale
    * — the adversarial shape from the curation soak. */
  def grownCorpus(spark: SparkSession, dir: String, factor: Int,
      jitterMilli: Int): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("base"), col("embedding").as("e"))
      .select(col("base"), col("e"),
        explode(sequence(lit(0), lit(factor - 1))).as("r"))
      .select(
        (col("base") * factor + col("r")).as("vec_id"),
        expr(s"""transform(e, (x, j) -> CAST(x + CASE WHEN r = 0
                |  THEN CAST(0.0 AS FLOAT)
                |  ELSE CAST((((base * 2654435761L + r * 97003L +
                |    j * 40503L) % 2001) - 1000) AS FLOAT) *
                |    ${jitterMilli}.0E-3F / 1000.0F
                |  END AS FLOAT))""".stripMargin.replace("\n", " "))
          .as("embedding"))
}
