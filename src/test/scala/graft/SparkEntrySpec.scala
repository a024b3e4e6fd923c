package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the smoke gate (entry rows > 0) and
  * query/oracle map alignment that the round harness depends on. */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("entry() flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and vice versa (documented rows-only exceptions)") {
    // rows-only: the driver records a weaker rows>0 check; each needs a
    // content-pinning sbt spec instead (snippet_topk → SnippetSpec)
    val rowsOnly = Set("snippet_topk")
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet -- rowsOnly)
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet))
  }

  test("all queries run and return rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          if (fn(spark, "/root/testdata/sf0.001").count() > 0) None
          else Some(s"$name: 0 rows")
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
