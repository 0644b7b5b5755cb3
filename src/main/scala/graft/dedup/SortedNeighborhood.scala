package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood dedup candidate generation (Hernández & Stolfo,
  * SIGMOD'95) — the third blocking family in this library beside
  * MinHash-LSH ([[Dedup]]) and df-capped inverted-index pairing
  * ([[Containment]]): sort records by a key, compare each record only to
  * its NEIGHBOR in sort order. Near-duplicate texts that share a long
  * prefix (boilerplate pages, versioned documents, mirrored URLs) land
  * adjacent and pair in O(n log n) total work — no quadratic expansion,
  * no hash-family tuning; the trade is that it only finds PREFIX-aligned
  * near-dups (a changed first byte separates a pair), which is exactly
  * the published limitation of the method and why it complements rather
  * than replaces the LSH family.
  *
  * Scale shape: records block by a short prefix and the sort+lead window
  * partitions BY BLOCK — thousands of bounded partitions, never the
  * single-partition global-sort trap (the q20 contract); a global sort
  * would also be wasted, since cross-block neighbors share < the block
  * prefix by construction. The LCP is computed by a linear array fold
  * INSIDE the projection (codegen HOF, no UDF): the accumulator freezes
  * at the first mismatch (`acc = i−1` stops advancing), so the fold is
  * one pass over min(len) characters.
  *
  * DETERMINISM: sort order is totalized by (sortKey, id); the LCP is an
  * exact integer; ties and duplicate texts pair naturally (LCP = full
  * length). */
object SortedNeighborhood {

  /** (id_a, id_b, lcp): each record paired with its successor in
    * (sortKey, id) order within its `prefixLen`-char block, kept when
    * the two sort keys share ≥ `minLcp` leading characters. */
  def candidates(df: DataFrame, id: Column, sortKey: Column,
      prefixLen: Int, minLcp: Int): DataFrame = {
    require(prefixLen >= 1 && minLcp >= 1,
      s"prefixLen/minLcp must be >= 1, got $prefixLen/$minLcp")
    val rows = df.select(id.as("id"), sortKey.as("k"),
      substring(sortKey, 1, prefixLen).as("block"))
    val w = Window.partitionBy("block").orderBy("k", "id")
    rows
      .withColumn("id_b", lead("id", 1).over(w))
      .withColumn("k_b", lead("k", 1).over(w))
      .where(col("id_b").isNotNull)
      .withColumn("lcp", expr(
        """CASE WHEN least(char_length(k), char_length(k_b)) >= 1
           THEN aggregate(
             sequence(1, least(char_length(k), char_length(k_b))), 0,
             (acc, i) -> IF(acc = i - 1
                            AND substring(k, i, 1) = substring(k_b, i, 1),
                          i, acc))
           ELSE 0 END""").cast("long"))
      .where(col("lcp") >= minLcp)
      .select(col("id").as("id_a"), col("id_b"), col("lcp"))
  }
}
