package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.PageSynth.splitmix64
import graft.operators.{BloomSemiJoin, Skyline}

/** Round-5 operator batch: the Bloom-pruned semi-join's superset +
  * broadcast contracts, the two-phase skyline's exact equivalence to the
  * naive quadratic definition, and portable_ln's codegen + Math.log
  * identity. */
class BloomSkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- BloomSemiJoin ----------------------------------------------------

  private def keysDf = (0L until 500L).map(i => splitmix64(i) & 0xFFFFFL)
    .toDF("k")
  private def probeDf = (0L until 4000L)
    .map(i => splitmix64(i + 1000000L) & 0xFFFFFL).toDF("pk")

  test("bloom bitmap is word-bounded and prune keeps a superset") {
    val bloom = BloomSemiJoin.build(keysDf, "k")
    assert(bloom.count() <= BloomSemiJoin.DefaultBits / 32)

    val pruned = BloomSemiJoin.prune(probeDf, col("pk"), bloom)
      .select("pk").as[Long].collect().toSet
    val members = probeDf.join(keysDf, col("pk") === col("k"), "left_semi")
      .as[Long].collect().toSet
    assert(members.subsetOf(pruned), "a true member was Bloom-pruned")
    // with 500 keys in 2^18 bits the filter must actually prune most
    // non-members — not degrade to a pass-through
    val total = probeDf.count()
    assert(pruned.size < total / 2,
      s"bloom pruned nothing: ${pruned.size} of $total survived")
  }

  test("bloom prune + exact semi-join == plain semi-join") {
    val bloom = BloomSemiJoin.build(keysDf, "k")
    val viaBloom = BloomSemiJoin.prune(probeDf, col("pk"), bloom)
      .join(keysDf, col("pk") === col("k"), "left_semi")
      .as[Long].collect().sorted.toSeq
    val plain = probeDf.join(keysDf, col("pk") === col("k"), "left_semi")
      .as[Long].collect().sorted.toSeq
    assert(viaBloom == plain)
  }

  test("bloom probe joins broadcast; the probe side never sort-merges") {
    val bloom = BloomSemiJoin.build(keysDf, "k")
    val plan = BloomSemiJoin.prune(probeDf, col("pk"), bloom)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 2, plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  // ---- Skyline ----------------------------------------------------------

  /** naive O(n²) dominance reference */
  private def naiveSkyline(pts: Seq[(Long, Double, Int)])
      : Seq[(Long, Double, Int)] =
    pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, sx, sy) =>
        sx <= x && sy >= y && (sx < x || sy > y)
      }
    }

  test("skyline2d == naive quadratic (fuzzed, both band regimes)") {
    val pts = (0L until 600L).map { i =>
      // coarse grids force duplicate x, duplicate y, and duplicate points
      val x = ((splitmix64(i) & 0x3F) * 7).toDouble
      val y = (splitmix64(i * 31 + 7) & 0x1F).toInt
      (i, x, y)
    }
    val df = pts.toDF("id", "x", "y")
    val expect = naiveSkyline(pts).map(_._1).sorted
    // bandWidth 50 → many bands; 1e9 → a single band (phase 1 no-op, the
    // exact sweep carries everything); 1 → one band per x value
    Seq(50.0, 1e9, 1.0).foreach { bw =>
      val got = Skyline.skyline2d(df, "x", "y", bw)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == expect, s"bandWidth=$bw")
    }
  }

  test("skyline keeps all copies of duplicate frontier points") {
    val df = Seq((1L, 1.0, 10), (2L, 1.0, 10), (3L, 2.0, 5))
      .toDF("id", "x", "y")
    val got = Skyline.skyline2d(df, "x", "y", 10.0)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  // ---- portable_ln -------------------------------------------------------

  test("portable_ln == Math.log and generated code force-compiles") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.types.DoubleType
    val expr = graft.functions.PortableLn(
      BoundReference(0, DoubleType, nullable = true))
    val proj = GenerateMutableProjection.generate(Seq(expr)) // throws on compile error
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    (1 to 2000).foreach { i =>
      row.update(0, i.toDouble)
      val got = proj(row).get(0, DoubleType).asInstanceOf[Double]
      assert(java.lang.Double.doubleToRawLongBits(got) ==
        java.lang.Double.doubleToRawLongBits(java.lang.Math.log(i.toDouble)),
        s"i=$i")
    }
    row.update(0, null)
    assert(proj(row).get(0, DoubleType) == null)
  }

  test("portable_ln SQL surface registers beside clean_text") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql("SELECT portable_ln(CAST(7 AS DOUBLE))")
      .first().getDouble(0)
    assert(got == java.lang.Math.log(7.0))
  }

  // ---- sorted-fold determinism -------------------------------------------

  test("entropy/EMA folds are bit-stable under repartitioning") {
    val rows = (0L until 900L).map { i =>
      (splitmix64(i) % 40L, (splitmix64(i * 13 + 5) & 0xFFFFL).toDouble, i)
    }
    def ema(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val vals = transform(col("seq"), e => e.getField("v"))
      df.groupBy("g")
        .agg(sort_array(collect_list(struct(col("ord"), col("v"))))
          .as("seq"))
        .select(col("g"),
          aggregate(slice(vals, lit(2), size(col("seq")) - lit(1)),
            element_at(vals, 1),
            (acc, v) => acc * lit(0.5) + v * lit(0.5)).as("ema"))
        .as[(Long, Double)].collect()
        .map { case (g, e) =>
          g -> java.lang.Double.doubleToRawLongBits(e)
        }.toMap
    }
    val df = rows.toDF("g", "v", "ord")
    val a = ema(df.repartition(1))
    val b = ema(df.repartition(17, col("ord")))
    assert(a == b, "fold result depends on partitioning")
  }
}
