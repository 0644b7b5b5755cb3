package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // u1 completes all three in order; u2 clicked BEFORE viewing (click
  // must not count) then clicked again after; u3 view-only; u4 purchase
  // with no view (absent from output); u5 same-ts view+click (inclusive)
  private val events = Seq(
    ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "purchase", 30L),
    ("u1", "click", 15L), // earlier click after view → click_ts = 15
    ("u2", "click", 5L), ("u2", "view", 10L), ("u2", "click", 40L),
    ("u3", "view", 7L),
    ("u4", "purchase", 9L),
    ("u5", "view", 11L), ("u5", "click", 11L))

  private def naive: Map[String, (Option[Long], Option[Long], Option[Long], Int)] = {
    val byKey = events.groupBy(_._1)
    byKey.flatMap { case (u, evs) =>
      def minAfter(tp: String, lo: Long): Option[Long] =
        evs.filter(e => e._2 == tp && e._3 >= lo).map(_._3).minOption
      minAfter("view", Long.MinValue).map { v =>
        val c = minAfter("click", v)
        val p = c.flatMap(minAfter("purchase", _))
        u -> ((Some(v), c, p, 1 + c.size + p.size))
      }
    }
  }

  test("funnel == naive ordered-min chain; out-of-order steps ignored") {
    val got = Funnel
      .funnel(events.toDF("u", "t", "ts"), "u", "t", "ts",
        Seq("view", "click", "purchase"))
      .collect().map { r =>
        def o(i: Int) = Option(r.getAs[java.lang.Long](i)).map(Long2long)
        r.getString(0) -> ((o(1), o(2), o(3), r.getInt(4)))
      }.toMap
    assert(got == naive)
    assert(got("u1") == ((Some(10L), Some(15L), Some(30L), 3)))
    assert(got("u2") == ((Some(10L), Some(40L), None, 2))) // pre-view click ignored
    assert(got("u3") == ((Some(7L), None, None, 1)))
    assert(!got.contains("u4")) // never did step 1
    assert(got("u5") == ((Some(11L), Some(11L), None, 2))) // same-ts inclusive
  }

  test("funnel validates steps") {
    val df = events.toDF("u", "t", "ts")
    intercept[IllegalArgumentException](
      Funnel.funnel(df, "u", "t", "ts", Seq.empty))
    intercept[IllegalArgumentException](
      Funnel.funnel(df, "u", "t", "ts", Seq("view", "view")))
  }
}
