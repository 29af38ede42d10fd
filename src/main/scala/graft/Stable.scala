package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent ("stable") aggregates for cross-engine hash parity.
  *
  * Plain `sum(double)` is order-dependent (IEEE addition isn't associative),
  * so Spark and the DuckDB oracle can disagree in the last ulps purely from
  * partial-aggregation order. Casting each row's double to DECIMAL(30,6)
  * first makes the sum exact and associative — identical on any engine, any
  * partitioning, any cluster size — then one final cast back to double.
  *
  * Per-row double arithmetic (products, 1-x, etc.) is bit-identical across
  * engines (same IEEE 754 ops on the same parquet-stored inputs), so it is
  * safe to compute row expressions in double and only stabilize the
  * aggregation step. A double can never land exactly on a .5 rounding
  * boundary at scale >= 1 (would need a factor of 5 in a dyadic rational),
  * so the double->decimal cast is also deterministic across rounding modes.
  *
  * This is also the right 100 TB design: decimal partial aggregation is
  * still map-side combinable and shuffle-friendly; exactness removes
  * run-to-run nondeterminism from AQE re-partitioning.
  */
object Stable {
  private val D = DecimalType(30, 6)

  /** Exact, order-independent sum of a double expression; returns double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** AVG with exact numerator (matches SQL AVG null semantics). */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(c)

  /** DuckDB oracle fragment equivalents (keep in sync with the above). */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE) / COUNT($expr)"
}
