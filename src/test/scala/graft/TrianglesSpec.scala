package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Triangles

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Long =
    Triangles.count(edges.toDF("src", "dst")).as[Long].head()

  /** brute force: enumerate all node triples over the canonical set */
  private def naive(edges: Seq[(Long, Long)]): Long = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    nodes.combinations(3).count { case Seq(a, b, c) =>
      und((a, b)) && und((b, c)) && und((a, c))
    }
  }

  test("known graphs: K3=1, K4=4, square=0, square+diagonal=2") {
    val k3 = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(k3) == 1L)
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(run(k4) == 4L)
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(run(sq) == 0L)
    assert(run(sq :+ ((1L, 3L))) == 2L)
  }

  test("duplicates, self-loops and reversed edges do not double-count") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (3L, 3L))
    assert(run(messy) == 1L)
  }

  test("hub graph == brute force (the skew case orientation exists for)") {
    // node 0 is a hub tied to everyone; spokes ring-connected: triangles
    // = one per ring edge
    val n = 30L
    val hub = (1L until n).map(0L -> _)
    val ring = (1L until n).map(i => i -> (if (i == n - 1) 1L else i + 1))
    val edges = hub ++ ring
    assert(run(edges) == naive(edges))
    assert(run(edges) == n - 1) // each ring edge closes with the hub
  }

  test("deterministic modular graph == brute force") {
    val edges = (0L until 120L).flatMap { x =>
      val m = x % 40
      Seq(m -> (m * 2 + 1) % 40, m -> (m * 3 + 7) % 40)
    }
    assert(run(edges) == naive(edges))
  }

  test("perNode: corner counts, degrees and lcc == brute force") {
    val n = 12L
    val edges = (0L until n).flatMap(i =>
      Seq(i -> (i * 2 + 1) % n, i -> (i * 5 + 3) % n)) :+ (0L -> 1L)
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2))
    val deg = nodes.map(v => v -> und.count(e => e._1 == v || e._2 == v)).toMap
    val triPerNode = nodes.map { v =>
      v -> nodes.toSeq.sorted.combinations(2).count { case Seq(x, y) =>
        x != v && y != v &&
          und((x min v, x max v)) && und((y min v, y max v)) && und((x, y))
      }.toLong
    }.toMap
    val expect = nodes.map { v =>
      val d = deg(v).toLong
      val lcc = if (d >= 2) (triPerNode(v) * 2).toDouble / (d * (d - 1)).toDouble
                else 0.0
      v -> ((d, triPerNode(v), lcc))
    }.toMap
    val got = Triangles.perNode(edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expect)
    // global count is consistent with the per-node sum (each tri = 3 corners)
    assert(got.values.map(_._2).sum == 3 * naive(edges))
  }
}
