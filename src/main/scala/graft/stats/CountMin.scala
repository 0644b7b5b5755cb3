package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch (Cormode & Muthukrishnan 2005) for
  * approximate per-key frequencies at 100 TB: the exact answer shuffles
  * one row per distinct key; the sketch is a CONSTANT-size (d×w cells)
  * mergeable aggregate — per-cell counts partially aggregate map-side,
  * one tiny shuffle, and sketches of different partitions / days merge
  * by cell-wise SUM without rescanning (unlike HLL's max-merge, CMS
  * merge is addition, so it also supports weighted increments).
  *
  * Portability contract (same family as [[Hll]]): row r's hash of key k
  * is md5("r|k") truncated to 15 hex chars (60 bits — positive BIGINT in
  * any engine), bucket = hash mod width. Cells are pure integer counts,
  * so the sketch table is oracle-checkable bit-for-bit (q142); the
  * query-time estimate for a key is min over rows of its d cells and is
  * ALWAYS ≥ the true count (one-sided error ≤ e·N/w with prob 1−e^−d).
  */
object CountMin {

  /** (r, b, c) cells of a depth×width sketch counting occurrences of
    * `key` (one increment per input row). The key replicates depth ways
    * in ONE scan (explode, not depth unions), then a single hash
    * aggregate — at scale the d× expansion is key-only rows that
    * collapse map-side into at most d·w partial cells per partition. */
  def sketch(df: DataFrame, key: Column,
      depth: Int = 2, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val h = conv(substring(md5(
      concat_ws("|", col("r"), col("k"))), 1, 15), 16, 10).cast("long")
    df.select(key.cast("string").as("k"))
      .select(explode(array((0 until depth).map(r => lit(r.toLong)): _*))
        .as("r"), col("k"))
      .select(col("r"), pmod(h, lit(width.toLong)).as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
  }

  /** Point estimate for one key from collected cells: min over rows of
    * that key's cell (absent cell = 0). Driver-side — the sketch is
    * d·w rows by construction. */
  def estimate(cells: Map[(Long, Long), Long], key: String,
      depth: Int = 2, width: Int = 1024): Long =
    (0 until depth).map { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$r|$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val b = java.lang.Long.parseLong(hex, 16) % width
      cells.getOrElse((r.toLong, b), 0L)
    }.min
}
