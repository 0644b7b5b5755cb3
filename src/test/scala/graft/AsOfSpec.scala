package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // right side unique per (key, ts) — the operator's precondition
  private val rightRows = Seq(
    ("u1", 10L, 1.0), ("u1", 20L, 2.0), ("u1", 30L, 3.0),
    ("u2", 15L, 9.0))
  private val leftRows = Seq(
    ("u1", 5L, 100L),  // before any right row → null match
    ("u1", 20L, 101L), // equal ts → matches the 20 row (inclusive ≤)
    ("u1", 25L, 102L), // between 20 and 30 → matches 20
    ("u1", 99L, 103L), // after all → matches 30
    ("u2", 15L, 104L), // equal ts on another key
    ("u3", 50L, 105L)) // key absent from right → null match

  private def run(): Map[Long, (Option[Long], Option[Double])] = {
    val l = leftRows.toDF("k", "t", "id")
    val r = rightRows.toDF("k", "t", "v")
    AsOf.joinAsOf(l, r, "k", "t", Seq("v"))
      .collect().map { row =>
        row.getAs[Long]("id") ->
          ((Option(row.getAs[java.lang.Long]("asof_t")).map(Long2long),
            Option(row.getAs[java.lang.Double]("asof_v")).map(Double2double)))
      }.toMap
  }

  test("joinAsOf == per-row latest-prior scan; ties inclusive; nulls") {
    val naive = leftRows.map { case (k, t, id) =>
      val m = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption
      id -> ((m.map(_._2), m.map(_._3)))
    }.toMap
    assert(run() == naive)
    val got = run()
    assert(got(100L) == ((None, None)))           // nothing prior
    assert(got(101L) == ((Some(20L), Some(2.0)))) // equal ts matches
    assert(got(103L) == ((Some(30L), Some(3.0)))) // latest wins
    assert(got(105L) == ((None, None)))           // key absent
  }

  test("every left row survives exactly once; columns preserved") {
    val l = leftRows.toDF("k", "t", "id")
    val r = rightRows.toDF("k", "t", "v")
    val out = AsOf.joinAsOf(l.repartition(5), r.repartition(3),
      "k", "t", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "t", "id", "asof_t", "asof_v"))
    assert(out.count() == leftRows.size)
    assert(out.select("id").as[Long].collect().sorted.toSeq ==
      leftRows.map(_._3).sorted)
  }
}
