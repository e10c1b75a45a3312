package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool: dump `.explain("formatted")` for
  * every declared query (or a named subset) into per-query files under
  * plans/<tag>/, so before/after plan diffs are reviewable offline.
  * `sbt "runMain graft.PlanSnap r15 before [q_a,q_b]"` writes
  * plans/r15/<query>_before.txt. Not part of the driver contract. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val round = args.lift(0).getOrElse("r15")
    val suffix = args.lift(1).getOrElse("before")
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val out = Paths.get(s"/root/repo/plans/$round")
    Files.createDirectories(out)
    SparkEntry.registry
      .filter(q => only.forall(_.contains(q.name)))
      .foreach { q =>
        try {
          val plan = q.run(spark, dir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(out.resolve(s"${q.name}_$suffix.txt"),
            plan.getBytes(StandardCharsets.UTF_8))
        } catch { case e: Throwable =>
          System.err.println(s"[plansnap] ${q.name} failed: ${e.getMessage}")
        }
        graft.queries.SharedStages.sweep(spark)
      }
    println(s"wrote plans to $out")
    spark.stop()
  }
}
