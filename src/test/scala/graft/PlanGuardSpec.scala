package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.scalatest.funsuite.AnyFunSuite

/** Automated scale-invariant guard over EVERY registered query's plan.
  * These are the two properties the scale review keeps re-checking by
  * hand; encoding them here means a future operator cannot silently
  * reintroduce a single-task sort or an unbounded cross product.
  */
class PlanGuardSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  test("no registered query plans an unpartitioned Window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val bad = plan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window (single-task global sort) in: $offenders")
  }

  test("no registered query plans a CartesianProduct") {
    // broadcast nested-loop joins over bounded sides are fine (and used);
    // a CartesianProductExec means BOTH sides are unbounded — never ok
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan
        val bad = plan.collect { case c: CartesianProductExec => c }
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"CartesianProduct in: $offenders")
  }
}
