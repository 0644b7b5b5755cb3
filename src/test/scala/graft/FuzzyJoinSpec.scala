package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Label set with every edit class represented: exact dup semantics
    * (distinct ids, equal names), substitution, deletion, insertion,
    * distance-2 (must NOT pair), and an empty string. */
  private val names = Seq(
    1L -> "aspirin", 2L -> "aspirin",   // equal
    3L -> "aspirim",                    // substitution of 1
    4L -> "asprin",                     // deletion from 1
    5L -> "aspirins",                   // insertion into 1
    6L -> "azpirim",                    // distance 2 from 1, 1 from 3
    7L -> "warfarin", 8L -> "warfarine",
    9L -> "", 10L -> "a",
    11L -> "xx", 12L -> "yy")           // distance 2, share delete-variants?

  private def got: Set[(Long, Long)] =
    FuzzyJoin.selfJoinWithin1(names.toDF("id", "name"), "id", "name")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

  /** Quadratic oracle using Spark's own levenshtein (the same function the
    * operator's exact filter uses — the spec pins the BLOCKING, i.e. that
    * no true pair is missed and no false pair survives). */
  private def naive: Set[(Long, Long)] = {
    val df = names.toDF("id", "name")
    val a = df.select(col("id").as("a_id"), col("name").as("a_name"))
    val b = df.select(col("id").as("b_id"), col("name").as("b_name"))
    a.crossJoin(b).where(col("a_id") < col("b_id") &&
        levenshtein(col("a_name"), col("b_name")) <= 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
  }

  test("deletion-neighborhood blocking finds exactly the distance<=1 pairs") {
    val expected = naive
    // sanity on the fixture: every edit class must actually be present
    assert(expected.contains((1L, 2L)) && expected.contains((1L, 3L)) &&
      expected.contains((1L, 4L)) && expected.contains((1L, 5L)) &&
      expected.contains((9L, 10L)) && !expected.contains((1L, 6L)) &&
      !expected.contains((11L, 12L)))
    assert(got == expected)
  }

  test("each unordered pair appears exactly once with its distance") {
    val rows = FuzzyJoin.selfJoinWithin1(names.toDF("id", "name"),
        "id", "name")
      .select("a_id", "b_id", "dist").as[(Long, Long, Int)].collect()
    assert(rows.length == rows.map(r => (r._1, r._2)).distinct.length)
    assert(rows.forall(r => r._1 < r._2 && r._3 <= 1))
    assert(rows.find(r => (r._1, r._2) == ((1L, 2L))).get._3 == 0)
  }
}
