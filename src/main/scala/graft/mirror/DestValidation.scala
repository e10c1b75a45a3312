package graft.mirror

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Destination pre-flight validation — the reference's
  * ValidateMirrorDestination (`flow/connectors/postgres/validate.go:
  * 276-376` over `flow/pkg/postgres/dest_validation.go`), restated for
  * parquet destinations:
  *
  *  - a destination that does not exist yet is fine (it will be
  *    created); RESYNC skips validation entirely (tables are
  *    replaced) — our RESYNC path never calls this;
  *  - with an initial snapshot configured, a destination that already
  *    has rows BLOCKS (snapshot into existing data double-loads);
  *    without a snapshot, existing rows are fine;
  *  - every effective source column (exclusions dropped) must exist
  *    in the destination; EXTRA destination columns are fine;
  *  - type compatibility: exact match; integer promotion
  *    (short → int → long, destination at least as wide); decimal
  *    destination must be a superset (precision AND scale ≥ source)
  *    — the numeric(p,s) rule of dest_validation.go:193-208.
  */
object DestValidation {

  private val intRank: Map[DataType, Int] = Map(
    ShortType -> 2, IntegerType -> 4, LongType -> 8)

  /** None = compatible; Some(reason) = blocked. */
  def checkColumn(name: String, src: DataType, dst: DataType,
      table: String): Option[String] =
    (src, dst) match {
      case (a, b) if a == b => None
      case (s0: DecimalType, d0: DecimalType) =>
        val (sp, ss, dp, ds) =
          (s0.precision, s0.scale, d0.precision, d0.scale)
        if (dp >= sp && ds >= ss) None
        else Some(s"source column $name decimal($sp,$ss) is wider " +
          s"than destination decimal($dp,$ds) in table $table")
      case (a, b) if intRank.contains(a) && intRank.contains(b) =>
        if (intRank(b) >= intRank(a)) None
        else Some(s"source column $name ${a.simpleString} does not " +
          s"fit destination ${b.simpleString} in table $table")
      case (a, b) => Some(s"source column $name type " +
        s"${a.simpleString} does not match destination " +
        s"${b.simpleString} in table $table")
    }

  /** All blocking findings for one mirror config (empty = valid).
    * `wantSnapshot` = do_initial_snapshot / initial_snapshot_only. */
  def validate(spark: SparkSession, cfg: MirrorConfig,
      wantSnapshot: Boolean,
      /** Waive the snapshot-into-non-empty block — the reference's
        * PEERDB_CLICKHOUSE_INITIAL_LOAD_ALLOW_NON_EMPTY_TABLES
        * (dynamicconf.go:~295; clickhouse/validate.go:77-87), and
        * the same waiver applies automatically when the
        * source-schema disambiguator maps MANY sources into one
        * destination (validate.go:70-83's skip). */
      allowNonEmpty: Boolean = false): Seq[String] = {
    val hc = spark.sparkContext.hadoopConfiguration
    cfg.tableSet.toSeq.sortBy(_._1).flatMap { case (table, (tc, dir)) =>
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!p.getFileSystem(hc).exists(p)) Nil // will be created
      else {
        val dest = spark.read.parquet(dir)
        val byName = dest.schema.fields.map(f => f.name -> f).toMap
        val nonEmpty =
          if (!wantSnapshot || allowNonEmpty) Nil
          else if (!dest.isEmpty)
            Seq(s"destination table $table already has existing " +
              "rows — an initial snapshot would double-load " +
              "(drop or resync instead)")
          else Nil
        val cols = tc.effectiveSchema.fields.toSeq.flatMap { f =>
          byName.get(f.name) match {
            case None => Seq(s"source column ${f.name} not found " +
              s"in destination table $table")
            case Some(d) =>
              checkColumn(f.name, f.dataType, d.dataType, table).toSeq
          }
        }
        nonEmpty ++ cols
      }
    }
  }
}
