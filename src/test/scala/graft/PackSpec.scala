package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pack.Packing

class PackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkSpans matches a sequential cumsum oracle across partitions") {
    // lengths chosen to straddle chunk boundaries: some docs span several
    // chunks, some share one; ids deliberately NOT in input order
    val lens = (0 until 500).map(i =>
      (i.toLong, 1L + (graft.extract.PageSynth.splitmix64(i.toLong) & 0x3F)))
    val shuffled = scala.util.Random.shuffle(lens)
    val df = shuffled.toDF("id", "len").repartition(7)
    val got = Packing
      .chunkSpans(df, "id", col("len"), chunkSize = 32, numPartitions = 5)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .toMap
    assert(got.size == 500)
    var off = 0L
    lens.foreach { case (id, n) =>
      val expect = (n, off, off / 32, (off + math.max(n, 1) - 1) / 32)
      assert(got(id) == expect, s"id $id")
      off += n
    }
  }

  test("chunkSpans: zero-length rows hold their start chunk, occupy no space") {
    val df = Seq((1L, 10L), (2L, 0L), (3L, 5L)).toDF("id", "len")
    val got = Packing.chunkSpans(df, "id", col("len"), chunkSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    // id 1: [0,10) → chunks 0..1; id 2: start 10, empty → chunk 1..1;
    // id 3: [10,15) → chunk 1..1 (id 2 consumed nothing)
    assert(got.toSeq == Seq((1L, 0L, 0L, 1L), (2L, 10L, 1L, 1L),
      (3L, 10L, 1L, 1L)))
  }

  test("slidingSpans == naive window enumeration; edges pinned") {
    def naive(n: Long, s: Long, t: Long): Seq[(Long, Long, Long)] = {
      val nw = if (n <= s) 1L else (n - s + t - 1) / t + 1
      (0L until nw).map(k => (k, k * t, math.min(k * t + s, n)))
    }
    val docs = Seq((1L, 0L), (2L, 1L), (3L, 24L), (4L, 25L), (5L, 40L),
      (6L, 41L), (7L, 100L)).toDF("id", "n")
    val got = Packing.slidingSpans(docs, "id", col("n"), 24, 16)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    docs.as[(Long, Long)].collect().foreach { case (id, n) =>
      assert(got(id) == naive(n, 24, 16), s"id=$id n=$n")
    }
    // pins: empty doc → one empty span; exact-size doc → one window;
    // one-past-size → two windows, second truncated
    assert(got(1L) == Seq((0L, 0L, 0L)))
    assert(got(3L) == Seq((0L, 0L, 24L)))
    assert(got(4L) == Seq((0L, 0L, 24L), (1L, 16L, 25L)))
    // every token position is covered by at least one window
    assert(got(7L).sliding(2).forall {
      case Seq((_, _, e1), (_, s2, _)) => s2 < e1; case _ => true })
    intercept[IllegalArgumentException](
      Packing.slidingSpans(docs, "id", col("n"), 24, 25))
    intercept[IllegalArgumentException](
      Packing.slidingSpans(docs, "id", col("n"), 0, 1))
  }
}
