package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers that make double aggregates reproducible across engines.
  *
  * A plain `sum(double)` is summation-order dependent: Spark's partial/final
  * HashAggregate adds in shuffle order, DuckDB in scan order, so the last few
  * bits (and after rounding, occasionally a whole cent) can differ. The fix
  * used across every oracle-checked query: cast each element to
  * `DECIMAL(18,4)` (a deterministic per-element rounding), sum exactly in
  * decimal (associative + commutative, so order-free), and cast the final
  * result back to double. The per-element double expression itself (e.g.
  * `price * (1 - discount)`) is IEEE-deterministic given the same operand
  * order, which both dialects preserve.
  */
object Num {
  /** Order-insensitive exact sum of a double expression: cents-exact decimal
    * accumulation, surfaced as double. DuckDB twin:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Order-insensitive mean: exact decimal sum / count, as double. DuckDB
    * twin: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 4))).cast("double") / count(c)).as("davg")
}
