package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for every left row, the most recent right row with
  * `rightTime <= leftTime` within the same key — the temporal lookup every
  * event/feature pipeline needs (price as of trade time, feature as of
  * label time) and one Spark has no native operator for.
  *
  * Composed from existing operators (the preferred extension path —
  * SURVEY §7.3): union the two sides tagged, then one pass of
  * `last(_, ignoreNulls)` over a (key, time, side) ordered window carries
  * the latest right payload forward into each left row. Cost: ONE shuffle
  * of |L|+|R| rows hash-partitioned by key + a per-key sort — the same
  * shape as a sort-merge join, with no range-explosion. Right rows at the
  * exact left timestamp match (ASOF <=), mirroring DuckDB/kdb semantics.
  *
  * Ties: multiple right rows sharing one (key, rightTime) resolve to an
  * arbitrary one of them (no further ordering is defined) — disambiguate
  * upstream with a dedup or a composite time if that matters.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its `valueCols` are appended)
    * @param keys       equality keys
    * @param leftTime   event-time column on `left` (orderable)
    * @param rightTime  event-time column on `right`; rows with a NULL
    *                   right time are dropped (a null timestamp cannot
    *                   participate in an as-of ordering)
    * @param valueCols  right columns to carry (renamed as-is onto left)
    * @param tolerance  max allowed `leftTime − rightTime` (units of the
    *                   numeric time columns): matches staler than this
    *                   null out — pandas merge_asof's `tolerance`.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // The match TIMESTAMP travels INSIDE the payload struct, so one
    // last(ignoreNulls) carries payload and time atomically — two
    // independent last() windows could desync them (a right row whose
    // payload wins but whose time column was null would pair the newest
    // payload with an older row's timestamp at the tolerance check).
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1)) // left sorts AFTER right at equal time
      .withColumn("_payload",
        lit(null).cast(payloadType(right, valueCols)))
    val r = right
      .filter(col(rightTime).isNotNull)
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_payload", struct(
        col(rightTime).cast("long").as("_asof_mt") +:
          valueCols.map(col): _*))
      .select((keys ++ Seq("_t", "_side", "_payload")).map(col): _*)

    val unioned = l.select(
      (keys ++ Seq("_t", "_side", "_payload")).map(col) ++
        leftCols.filterNot(keys.contains).map(c =>
          col(c).as(s"_l_$c")): _*)
      .unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val fresh = tolerance match {
      case Some(tol) =>
        carried.withColumn("_match",
          when(col("_match._asof_mt") >= col("_t").cast("long") - tol,
            col("_match")))
      case None => carried
    }

    fresh.select(
      keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"_l_$c").as(c)) ++
        valueCols.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** Forward as-of join: the EARLIEST right row with `rightTime >=
    * leftTime` per key (next quote after an order, next heartbeat after
    * a failure). Same single-shuffle union+window composition with the
    * scan direction flipped: right rows sort AFTER left rows at equal
    * time (ASOF >= matches the exact timestamp) and the window runs
    * time-DESCENDING carrying the latest-seen right payload — which, in
    * descending order, is the next-at-or-after one. Numeric time columns
    * only (the ordering flip is a sort-direction change, no negation). */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String])
      : DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(0)) // left sorts AFTER right (desc order)
      .withColumn("_payload",
        lit(null).cast(structType(right, valueCols)))
    val r = right
      .filter(col(rightTime).isNotNull) // null time: can't order, drop
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(1))
      .withColumn("_payload", struct(valueCols.map(col): _*))
      .select((keys ++ Seq("_t", "_side", "_payload")).map(col): _*)

    val unioned = l.select(
      (keys ++ Seq("_t", "_side", "_payload")).map(col) ++
        leftCols.filterNot(keys.contains).map(c =>
          col(c).as(s"_l_$c")): _*)
      .unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)

    carried.select(
      keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"_l_$c").as(c)) ++
        valueCols.map(c => col(s"_match.$c").as(c)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))

  /** Payload struct WITH the leading match-timestamp field (backward
    * as-of only; the forward variant has no tolerance and no `_asof_mt`). */
  private def payloadType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_asof_mt",
        org.apache.spark.sql.types.LongType) +: cols.map(c => df.schema(c)))
}
