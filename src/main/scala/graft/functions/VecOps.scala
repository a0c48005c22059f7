package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns as pure Column
  * expressions (Spark higher-order functions — codegen'd, no UDFs, so the
  * whole similarity pipeline stays inside WholeStageCodegen).
  *
  * Elements are cast float→double (exact) before multiplying so both Spark
  * and the DuckDB oracle accumulate in double precision in index order —
  * bit-identical dot products.
  */
object VecOps {
  private def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Left-to-right double-precision dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), _ * _), lit(0.0), _ + _)

  /** Euclidean (L2) norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), _ + _))

  /** Cosine similarity in [-1, 1]. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance (cheaper than sqrt for ranking). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)
}
