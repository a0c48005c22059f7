package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.NativeExprs

/** Spark-native integration point: inject graft's custom Catalyst
  * expressions into any SparkSession via the standard extensions mechanism —
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * — which makes `graft_dot`, `graft_sorted_intersect_count` and
  * `graft_simhash63` available to plain SQL users (spark-sql, thriftserver,
  * notebooks), not just to callers of the Scala API (which registers them
  * lazily through [[NativeExprs.ensureRegistered]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.NativeExprs", null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - double dot product of two arrays"),
      (args: Seq[Expression]) => NativeExprs.FloatDotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count",
        "count of common elements of two sorted long arrays"),
      (args: Seq[Expression]) =>
        NativeExprs.SortedLongIntersectCount(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_simhash63"),
      info("graft_simhash63", "63-bit simhash of an array of token hashes"),
      (args: Seq[Expression]) => NativeExprs.SimHash63(args(0))))
    // Spark's codegen'd bloom expressions, not exposed by its public
    // function registry — surfaced for SQL users (build + probe pair)
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(key, expectedItems, numBits) - serialized bloom filter"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0), args(1), args(2))
          .toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain",
        "graft_might_contain(bloom, key) - codegen'd membership probe"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(args(0), args(1))))
  }
}
