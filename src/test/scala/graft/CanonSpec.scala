package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.canon.{ConnectedComponents, KeyAssigner}

class CanonSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("KeyAssigner: keys are exactly rank-in-sorted-order, 1..N") {
    val labels = Seq("pear", "apple", "fig", "apple", "date", "fig", "kiwi")
    val got = KeyAssigner.assign(labels.toDF("label"), "label")
      .as[(String, Long)].collect().sortBy(_._2)
    val want = labels.distinct.sorted.zipWithIndex
      .map { case (l, i) => (l, (i + 1).toLong) }
    assert(got.toSeq == want)
  }

  test("KeyAssigner: deterministic across runs and partition counts") {
    val labels = (0 until 5000).map(i =>
      f"label-${graft.extract.PageSynth.splitmix64(i) % 997}%04d")
    val df = labels.toDF("label")
    val a = KeyAssigner.assign(df, "label", 4).as[(String, Long)]
      .collect().toMap
    val b = KeyAssigner.assign(df.repartition(13), "label", 11)
      .as[(String, Long)].collect().toMap
    assert(a == b)
    val sorted = labels.distinct.sorted
    assert(sorted.zipWithIndex.forall { case (l, i) => a(l) == i + 1 })
  }

  /** Driver-side union-find oracle. */
  private def ccOracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to minimum root
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // ensure root is the min of each component
    val groups = ids.groupBy(find)
    groups.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  test("ConnectedComponents (both paths) matches union-find oracle on random graphs") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 200
      val edges = (0 until 150).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val want = ccOracle(edges)
      val local = ConnectedComponents
        .run(edges.toDF("src", "dst")) // small → driver union-find path
        .as[(Long, Long)].collect().toMap
      assert(local == want, s"seed=$seed local path")
      val dist = ConnectedComponents
        .runDistributed(edges.toDF("src", "dst")) // forced scale path
        .as[(Long, Long)].collect().toMap
      assert(dist == want, s"seed=$seed distributed path")
    }
  }

  test("ConnectedComponents: chain graph (worst-case diameter), both paths") {
    val edges = (0L until 63L).map(i => (i, i + 1))
    val want = (0L to 63L).map(_ -> 0L).toMap
    assert(ConnectedComponents.run(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap == want)
    assert(ConnectedComponents.runDistributed(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap == want)
    // O(log n) convergence guard: a 64-node chain must finish well inside
    // the bound (star rounds roughly halve the diameter per iteration);
    // regression here means the round structure broke
    assert(ConnectedComponents.lastRounds <= 10,
      s"chain took ${ConnectedComponents.lastRounds} rounds")
  }

  test("ConnectedComponents: self-loop-only nodes keep their singleton row") {
    // node 5's ONLY edge is (5,5), node 9's only edge has a null partner;
    // symmetrize filters both, so without the degenerate-endpoint
    // completion step they would vanish from the output, breaking the
    // "every input endpoint appears exactly once" contract for callers
    // that join components back to their node list
    val edges = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (5L, 5L), (3L, 3L), (3L, 4L), (9L, null))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L, 9L -> 9L)
    assert(ConnectedComponents.run(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap == want)
    assert(ConnectedComponents.runDistributed(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap == want)
  }

  test("ConnectedComponents: converging exactly at the cap is NOT an error") {
    // a single edge stabilizes in round 1, but the checksum test can only
    // OBSERVE that in round 2 — maxIter=1 must spend the one confirming
    // round and return the fixed point instead of a false throw
    val out = ConnectedComponents
      .runDistributed(Seq((1L, 2L)).toDF("src", "dst"), maxIter = 1)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L))
  }

  test("ConnectedComponents: non-convergence raises instead of returning garbage") {
    // a 64-node chain cannot converge in 1 round; exhausting maxIter used
    // to fall through silently, assigning nodes to non-root intermediate
    // ids — downstream dedup would split entities with no error anywhere
    val edges = (0L until 63L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.runDistributed(edges.toDF("src", "dst"), maxIter = 1)
        .collect()
    }
    assert(ex.getMessage.contains("converge"))
  }
}
