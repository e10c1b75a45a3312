package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Destination-type safety policy: the value-clamping rules every sink
  * applies before writing, collected from the reference:
  *
  *   - numeric truncation/validation (flow/model/numeric_truncator.go):
  *     values whose integral part exceeds the destination precision → NULL;
  *   - date/timestamp clamping to supported year ranges
  *     (flow/model/qvalue/avro_converter.go:384-427; ClickHouse bounds
  *     flow/connectors/clickhouse/normalize_query.go:81-110);
  *   - NaN/±Inf floats → NULL at serialization
  *     (flow/model/record_items.go:174-207);
  *   - oversize strings/JSON truncated to ""/"{}"
  *     (flow/model/record_items.go:36,44,112-120).
  *
  * All pure column expressions; NULL-out happens BEFORE any narrowing cast
  * so ANSI mode (Spark 4 default) never faults on NaN/overflow.
  */
object TypeClamps {

  /** 15 MiB: the generic oversize-value cap (record_items.go:36). */
  val OversizeCapBytes: Int = 15 * 1024 * 1024

  /** ClickHouse-compatible year bounds (normalize_query.go:81-110). */
  val MinYear = 1900
  val MaxYear = 9999

  /** NaN/±Inf → NULL (pre-cast). */
  def finiteOrNull(c: Column): Column =
    when(isnan(c) || c === Double.PositiveInfinity ||
      c === Double.NegativeInfinity, lit(null)).otherwise(c)

  /** Clamp to DECIMAL(precision, scale); out-of-range → NULL (the
    * truncator's warn-and-null contract). NaN/Inf handled first. */
  def numericOrNull(c: Column, precision: Int, scale: Int): Column = {
    val limit = math.pow(10, (precision - scale).toDouble)
    val finite = finiteOrNull(c)
    when(abs(finite) >= limit, lit(null))
      .otherwise(finite.cast(s"decimal($precision,$scale)"))
  }

  /** Clamp a timestamp into [1900-01-01, 9999-12-31] (values outside pin to
    * the bound — the reference pins, it does not null). */
  def clampTimestamp(c: Column,
      minYear: Int = MinYear, maxYear: Int = MaxYear): Column = {
    val lo = to_timestamp(lit(f"$minYear%04d-01-01 00:00:00"))
    val hi = to_timestamp(lit(f"$maxYear%04d-12-31 23:59:59.999999"))
    least(greatest(c, lo), hi)
  }

  /** Oversize strings → "" (JSON payloads → "{}"): byte length measured,
    * matching the reference's size accounting. */
  def capOversize(c: Column, capBytes: Int = OversizeCapBytes,
      replacement: String = ""): Column =
    when(octet_length(c) > capBytes, lit(replacement)).otherwise(c)

  /** The full per-column sink-safety pipeline for a double column. */
  def sinkSafeNumeric(c: Column, precision: Int = 38, scale: Int = 18)
      : Column = numericOrNull(c, precision, scale)
}
