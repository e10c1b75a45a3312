package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The ONE statement of the precision-critical money arithmetic shared by
  * every revenue query, in both engines' dialects. The double→decimal
  * casts are deterministic and engine-identical (no dyadic rational hits a
  * half-even midpoint at scale 2/4 — NOTES.md "Cross-engine oracle
  * parity"); any future widening must change Spark and DuckDB forms
  * together, which is why they live side by side here and nowhere else. */
object Money {

  /** Exact per-item revenue in hundredth-of-cent:
    * cents × (10000 − discount basis points). */
  val revC4: Column = expr(
    """CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
      |(10000 - CAST(CAST(l_discount AS DECIMAL(12,4)) * 10000
      |  AS BIGINT))""".stripMargin)
  val revC4Sql: String =
    """CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
      |    (10000 - CAST(CAST(l_discount AS DECIMAL(12,4)) * 10000
      |      AS BIGINT))""".stripMargin

  /** Per-item revenue truncated back to whole cents — for ratio queries
    * whose numerator×10^6 must stay inside BIGINT at bench scale. */
  val revC: Column = expr(
    """(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
      |(10000 - CAST(CAST(l_discount AS DECIMAL(12,4)) * 10000
      |  AS BIGINT))) DIV 10000""".stripMargin)
  val revCSql: String =
    """(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) *
      |    (10000 - CAST(CAST(l_discount AS DECIMAL(12,4)) * 10000
      |      AS BIGINT))) // 10000""".stripMargin
}
