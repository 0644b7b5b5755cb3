package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.sources.SchemaTools

class SchemaToolsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq((1L, "A", "9606"), (2L, "b", "x"))
    .toDF("DrugCentral_ID", "Name", "organism_id")

  test("resolveColumn: case-insensitive with fallbacks") {
    assert(SchemaTools.resolveColumn(df, "drugcentral_id").contains("DrugCentral_ID"))
    assert(SchemaTools.resolveColumn(df, "missing", "NAME").contains("Name"))
    assert(SchemaTools.resolveColumn(df, "nope").isEmpty)
  }

  test("resolveColumn: first column in schema order wins on case-duplicates") {
    // a degenerate-but-tolerated bronze input carrying both "ID" and "id":
    // resolution must bind deterministically (schema order), not whichever
    // column a last-wins map happened to keep
    val dup = Seq((1L, 9L)).toDF("ID", "id")
    assert(SchemaTools.resolveColumn(dup, "Id").contains("ID"))
  }

  test("renameToCanonical applies only present renames") {
    val out = SchemaTools.renameToCanonical(df,
      Map("Name" -> "preferred_name", "ghost" -> "nope"))
    assert(out.columns.toSeq ==
      Seq("DrugCentral_ID", "preferred_name", "organism_id"))
  }

  test("tryCast: null on garbage instead of ANSI error") {
    val got = df.select(SchemaTools.tryCastLong(col("organism_id")))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(9606L), None))
  }

  test("containsCi: null-safe case-insensitive contains") {
    val d2 = Seq(Some("Homo Sapiens"), Some("mouse"), None).toDF("organism")
    val got = d2.select(SchemaTools.containsCi(col("organism"), "homo sapiens"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, false, false))
  }

  test("affinityNm: strips qualifiers, positive-only, tolerant") {
    val d = Seq(">1,000", "~2.5", "=0", "junk", "-5", "  <10 ").toDF("a")
    val got = d.select(TextFunctions.affinityNm(col("a")))
      .as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(1000.0), Some(2.5), None, None, None, Some(10.0)))
  }

  test("pxStrength: clamped pX mapping") {
    val d = Seq(1.0, 100000.0, 1e9).toDF("nm")
    val got = d.select(TextFunctions.pxStrength(col("nm")))
      .as[Double].collect().toSeq
    assert(math.abs(got(0) - (9.0 - 0.0 - 4.0) / 6.0) < 1e-12)
    assert(got(2) == 0.0) // clamped at 0
    assert(got.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("classificationScore: dictionary with default") {
    val d = Seq("Definitive", "LIMITED ", "whatever").toDF("c")
    val m = Map("definitive" -> 1.0, "limited" -> 0.3)
    val got = d.select(TextFunctions.classificationScore(col("c"), m))
      .as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.3, 0.5))
  }
}
