package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the robust-stats / interleave / personalized-
  * PageRank batch (q168–q171) beyond the DuckDB hash gate: the lower-
  * median boundary rule, the mode tie rule, and PPR against a naive
  * in-memory iteration with the seed-restricted teleport. */
class RobustPprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("weightedMedian picks the lower median at the exact half boundary") {
    import spark.implicits._
    val df = Seq(
      // key 1: weights 1,1 on 10,20 — even split, LOWER median = 10
      (1L, 10L, 1L), (1L, 20L, 1L),
      // key 2: 10 carries most weight → 10 despite larger values
      (2L, 10L, 5L), (2L, 50L, 1L), (2L, 90L, 1L),
      // key 3: duplicates of v must collapse (10×1 + 10×1 vs 20×1 → 10)
      (3L, 10L, 1L), (3L, 10L, 1L), (3L, 20L, 1L)
    ).toDF("k", "v", "w")
    val got = graft.stats.RobustStats
      .weightedMedian(df, col("k"), col("v"), col("w")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((2L, 10L)), 2L -> ((7L, 10L)),
      3L -> ((3L, 10L))))
  }

  test("weightedMedian equals the naive definition on a random-ish fixture") {
    import spark.implicits._
    val rows = for (k <- 1L to 5L; i <- 1L to 20L) yield
      (k, (i * i * 7 + k) % 40, 1L + (i * 3 + k) % 5)
    val got = graft.stats.RobustStats
      .weightedMedian(rows.toDF("k", "v", "w"), col("k"), col("v"),
        col("w")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val naive = rows.groupBy(_._1).map { case (k, rs) =>
      val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = byV.map(_._2).sum
      var cum = 0L
      k -> byV.collectFirst {
        case (v, w) if { cum += w; 2 * cum >= tot } => v
      }.get
    }
    assert(got === naive)
  }

  test("mode breaks count ties toward the smallest value") {
    import spark.implicits._
    val df = Seq(1L -> "b", 1L -> "b", 1L -> "a",
      2L -> "z", 2L -> "a", // tie at 1 → "a"
      3L -> "x").toDF("k", "v")
    val got = graft.stats.RobustStats.mode(df, col("k"), col("v"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> (("b", 2L)), 2L -> (("a", 1L)),
      3L -> (("x", 1L))))
  }

  test("personalized PageRank equals a naive seed-teleport iteration; unreached nodes score 0") {
    import spark.implicits._
    // chain 1→2→3→4 plus isolated-from-seed 9→4; seed = {1}
    val edges = Seq(1 -> 2, 2 -> 3, 3 -> 4, 9 -> 4).toDF("src", "dst")
    val seeds = Seq(1).toDF("node")
    val got = graft.graph.PageRank
      .personalized(edges, seeds, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive: integer-exact, base only on seeds
    val e = Seq(1 -> 2, 2 -> 3, 3 -> 4, 9 -> 4)
    val outdeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val isSeed = (n: Int) => if (n == 1) 1L else 0L
    var score = nodes.map(n => n -> isSeed(n) * 1000000L).toMap
    (1 to 2).foreach { _ =>
      val in = nodes.map(v => v -> e.filter(_._2 == v)
        .map(p => score(p._1) / outdeg(p._1)).sum).toMap
      score = nodes.map(n =>
        n -> (isSeed(n) * 150000L + in(n) * 85L / 100L)).toMap
    }
    assert(got === score.map { case (k, v) => k.toLong -> v })
    // the seed's 2-hop frontier is ranked; node 9 (not a seed, no inbound
    // path) scores 0, and node 4 — reachable only at hop 3 from the seed,
    // or from the zero-scored 9 — stays 0 after 2 iterations
    assert(got(9L) === 0L && got(3L) > 0L && got(4L) === 0L)
  }
}
