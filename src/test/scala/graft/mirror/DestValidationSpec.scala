package graft.mirror

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Destination pre-flight compatibility (ValidateMirrorDestination /
  * dest_validation.go, the api_test.go
  * TestPostgresDestinationValidation_* family): missing destination is
  * fine, extra destination columns are fine, missing source columns
  * block, snapshot into a non-empty destination blocks (but no
  * snapshot allows it), decimal must widen (precision AND scale),
  * integer promotion widens only. */
class DestValidationSpec extends SparkSpec {

  import DestValidation._

  test("column compatibility matrix: exact, int promotion both ways, " +
    "decimal superset / precision mismatch, type mismatch") {
    assert(checkColumn("a", LongType, LongType, "t").isEmpty)
    assert(checkColumn("a", ShortType, LongType, "t").isEmpty)
    assert(checkColumn("a", IntegerType, LongType, "t").isEmpty)
    assert(checkColumn("a", LongType, IntegerType, "t").nonEmpty)
    // decimal superset ok (both dims)
    assert(checkColumn("n", DecimalType(12, 2), DecimalType(20, 8),
      "t").isEmpty)
    assert(checkColumn("n", DecimalType(12, 2), DecimalType(12, 2),
      "t").isEmpty)
    // precision or scale narrower → blocked
    assert(checkColumn("n", DecimalType(12, 2), DecimalType(10, 2),
      "t").exists(_.contains("wider")))
    assert(checkColumn("n", DecimalType(12, 2), DecimalType(20, 1),
      "t").nonEmpty)
    assert(checkColumn("s", StringType, LongType, "t")
      .exists(_.contains("does not match")))
  }

  private def cfg(base: String, schema: StructType): MirrorConfig =
    MirrorConfig(
      walDir = s"$base/wal", rawDir = s"$base/raw",
      destDir = s"$base/dest", checkpointDir = s"$base/ckpt",
      pkColumns = Seq("id"), payloadSchema = schema,
      destinationTable = "t")

  test("mirror-level checks: missing dest ok; extra dest column ok; " +
    "missing source column blocks; non-empty dest blocks snapshot " +
    "but not steady CDC") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", DecimalType(12, 2))))

    // destination absent → fine
    val b1 = tmpDir("dv_absent")
    assert(validate(spark, cfg(b1, schema), wantSnapshot = true).isEmpty)

    // extra destination column → fine; compatible widened decimal → fine
    val b2 = tmpDir("dv_extra")
    spark.range(0).selectExpr("id",
      "CAST(NULL AS DECIMAL(20,8)) AS v", "'x' AS extra")
      .write.parquet(s"$b2/dest")
    assert(validate(spark, cfg(b2, schema), wantSnapshot = true).isEmpty)

    // missing source column in destination → blocked by name
    val b3 = tmpDir("dv_missing")
    spark.range(0).selectExpr("id").write.parquet(s"$b3/dest")
    val f3 = validate(spark, cfg(b3, schema), wantSnapshot = false)
    assert(f3.exists(m => m.contains("v") && m.contains("not found")))

    // non-empty destination: blocks with snapshot, fine without
    val b4 = tmpDir("dv_rows")
    spark.range(3).selectExpr("id",
      "CAST(1.5 AS DECIMAL(12,2)) AS v").write.parquet(s"$b4/dest")
    assert(validate(spark, cfg(b4, schema), wantSnapshot = true)
      .exists(_.contains("existing rows")))
    assert(validate(spark, cfg(b4, schema), wantSnapshot = false).isEmpty)
    // the allow waiver (PEERDB_CLICKHOUSE_INITIAL_LOAD_ALLOW_NON_
    // EMPTY_TABLES / the source-schema-column many-to-one skip,
    // clickhouse/validate.go:70-87): the non-empty block lifts,
    // column checks still run
    assert(validate(spark, cfg(b4, schema), wantSnapshot = true,
      allowNonEmpty = true).isEmpty)

    // excluded columns are not required at the destination
    val b5 = tmpDir("dv_excl")
    spark.range(0).selectExpr("id").write.parquet(s"$b5/dest")
    val cfgExcl = cfg(b5, schema).copy(excludeColumns = Set("v"))
    assert(validate(spark, cfgExcl, wantSnapshot = false).isEmpty)
  }

  test("VALIDATE MIRROR surfaces destination_compat (DDL route)") {
    val base = tmpDir("dv_ddl")
    def run(sql: String) = GraftSql.execute(spark,
      GraftSql.parse(sql).getOrElse(fail(s"no parse: $sql")))
    graft.util.FsText.write(s"$base/wal/changes-0.jsonl", "",
      spark.sparkContext.hadoopConfiguration)
    // destination exists but lacks column v → invalid
    spark.range(0).selectExpr("id").write.parquet(s"$base/dest")
    run(s"""CREATE MIRROR dvm WITH (
           |  wal_dir '$base/wal', dest_dir '$base/dest',
           |  checkpoint_dir '$base/ckpt', pk 'id', table 't',
           |  schema 'id BIGINT, v BIGINT')""".stripMargin)
    val rows = run("VALIDATE MIRROR dvm")
    val dc = rows.find(_.getString(0) == "destination_compat").get
    assert(dc.getString(1) == "invalid")
    assert(dc.getString(2).contains("v"))
    run("DROP MIRROR dvm")
  }
}
