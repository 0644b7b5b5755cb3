package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the JVM shift-masking and IEEE-NaN traps in the LSH internals:
  * (1L << 64) - 1 == 0 would silently bucket every row together (a full
  * cross-join wearing an LSH costume), and 0/0 cosine would rank a
  * zero-norm vector above every real neighbor under Spark's NaN ordering.
  */
class AnnInternalsSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("bandBuckets r=64 (bands=1, nBits=64): mask is full-width, not zero") {
    // Opposite-sign vectors have complementary coordinate-sign signatures;
    // with a zero band mask both would collapse to bits=0 (one bucket).
    val df = Seq(
      (1L, Array.fill(64)(1.0f)),
      (2L, Array.fill(64)(-1.0f))).toDF("id", "v")
    val buckets = Ann.bandBuckets(df, "id", "v", nBits = 64, bands = 1,
      Ann.coordSignSignature)
    val bits = buckets.select("bits").as[Long].collect().toSet
    assert(bits.size == 2, s"distinct band bits: $bits")
    assert(!bits.contains(0L) || bits.size == 2)
  }

  test("signatures reject nBits outside [1, 64] loudly") {
    val v = array((0 until 65).map(i => lit(i.toFloat)): _*)
    assertThrows[IllegalArgumentException](Ann.rhpSignature(v, 65))
    assertThrows[IllegalArgumentException](Ann.coordSignSignature(v, 65))
    assertThrows[IllegalArgumentException](Ann.rhpSignature(v, 0))
  }

  test("cosine of a zero-norm vector is 0.0, never NaN") {
    val df = Seq((Array(0f, 0f, 0f), Array(1f, 2f, 3f))).toDF("a", "b")
    val got = df.select(
      Ann.cosine(col("a"), col("b")).as("zb"),
      Ann.cosine(col("b"), col("a")).as("bz"),
      Ann.cosine(col("a"), col("a")).as("zz"),
      Ann.cosine(col("b"), col("b")).as("bb"))
      .as[(Double, Double, Double, Double)].head()
    assert(got._1 == 0.0 && got._2 == 0.0 && got._3 == 0.0)
    assert(math.abs(got._4 - 1.0) < 1e-12)
  }

  test("zero-norm corpus row never outranks a real neighbor") {
    val corpus = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0f, 0f))).toDF("id", "v")
    val queries = Seq((0L, Array(1f, 0f))).toDF("id", "v")
    val top = Ann.bruteForceTopK(corpus, queries, "id", "v", 1)
      .select("neighbor_id").as[Long].head()
    assert(top == 1L, "zero vector must not be the rank-1 neighbor")
  }
}
