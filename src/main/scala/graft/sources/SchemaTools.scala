package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tolerant bronze-ingest schema helpers (SURVEY §1.3, P1/P15).
  *
  * The reference renames whatever columns exist
  * (reference:src/kg_ae/datasets/drugcentral/normalize.py:73-76), resolves
  * columns case-insensitively with fallback candidates
  * (reference:onsides/normalize.py:33-39), and casts join keys to string to
  * survive i64/str drift (reference:onsides/normalize.py:88-94). Same
  * contracts here, as pure DataFrame transforms.
  */
object SchemaTools {

  /** Case-insensitive column resolution with fallback candidates; None if
    * absent (caller decides whether that is fatal). When several columns
    * case-fold to the same name (a tolerated-but-degenerate bronze input
    * like "ID" and "id"), the FIRST in schema order wins — deterministic,
    * where a last-wins map would bind whichever column happened to be
    * declared last. */
  def resolveColumn(df: DataFrame, candidates: String*): Option[String] = {
    val byLower = df.columns.reverseIterator
      .map(c => c.toLowerCase(java.util.Locale.ROOT) -> c).toMap
    candidates.iterator
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .collectFirst { case c if byLower.contains(c) => byLower(c) }
  }

  /** Rename-to-canonical, conditional on presence: applies only the subset
    * of `renames` whose source column exists (P1). */
  def renameToCanonical(df: DataFrame, renames: Map[String, String]): DataFrame = {
    val present = renames.filter { case (from, _) => df.columns.contains(from) }
    df.withColumnsRenamed(present)
  }

  /** Tolerant numeric cast: null on failure instead of ANSI error (P15 —
    * the reference's cast(strict=False)). */
  def tryCastDouble(c: Column): Column = c.try_cast("double")
  def tryCastLong(c: Column): Column = c.try_cast("long")

  /** Join-key harmonization: cast both sides to string (the reference's
    * i64/str drift guard). */
  def stringKey(c: Column): Column = c.cast("string")

  /** Null-safe case-insensitive regex-contains filter (P4:
    * `str.contains("(?i)...").fill_null(False)`). */
  def containsCi(c: Column, pattern: String): Column =
    coalesce(c.rlike("(?i)" + pattern), lit(false))
}
