package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.PageRank

class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The same integer recurrence, in-memory: pr₀ = Scale; prₖ₊₁(n) =
    * base + (Σ_{s→n} prₖ(s) div outdeg(s)) * 85 div 100. */
  private def naive(edges: Seq[(Long, Long)], iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = PageRank.Scale): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * (dampDen - dampNum) / dampDen
    var pr = nodes.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      val in = edges.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => pr(s) / outdeg(s) }.sum).toMap
      pr = nodes.map(n =>
        n -> (base + in.getOrElse(n, 0L) * dampNum / dampDen)).toMap
    }
    pr
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  // a ring, a hub (everyone → 9), a dangling sink, and a multi-edge
  private val g = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L),
    (1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L),
    (4L, 5L), // 5 is dangling: no out-edges, mass drops
    (6L, 7L), (6L, 7L)) // multi-edge: counts double in outdeg AND contrib

  test("run == naive integer recurrence (1, 3 and 7 iterations)") {
    Seq(1, 3, 7).foreach { k => assert(run(g, k) == naive(g, k), s"k=$k") }
  }

  test("hub receives the highest score; dangling node still present") {
    val got = run(g, 3)
    assert(got.keySet == (1L to 7L).toSet + 9L)
    assert(got(9L) == got.values.max)
    assert(got(5L) >= PageRank.Scale * 15 / 100) // base floor
  }

  test("deterministic under re-partitioning") {
    val df = g.toDF("src", "dst").repartition(7)
    val got = PageRank.run(df, 3).as[(Long, Long)].collect().toMap
    assert(got == naive(g, 3))
  }

  test("custom damping 1/2 and parameter validation") {
    assert(run(g, 2) == naive(g, 2)) // default
    val got = PageRank.run(g.toDF("src", "dst"), 2, dampNum = 1, dampDen = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == naive(g, 2, 1, 2))
    intercept[IllegalArgumentException](PageRank.run(g.toDF("src", "dst"), 0))
    intercept[IllegalArgumentException](
      PageRank.run(g.toDF("src", "dst"), 1, dampNum = 3, dampDen = 2))
  }

  test("reduced fixed-point scale (the overflow-contract knob)") {
    val got = PageRank.run(g.toDF("src", "dst"), 3, scale = 10000L)
      .as[(Long, Long)].collect().toMap
    assert(got == naive(g, 3, scale = 10000L))
    intercept[IllegalArgumentException](
      PageRank.run(g.toDF("src", "dst"), 1, scale = 0L))
  }
}
