package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 similarity self-join — all pairs of names within
  * Levenshtein distance ≤ 1, the fuzzy-match primitive of entity
  * canonicalization (near-identical drug/entity labels differing by a
  * typo, a dropped character, or one substituted digit).
  *
  * Shape: the FastSS / SymSpell deletion-neighborhood blocking. Every
  * name emits its delete-1 variants (itself plus each single-character
  * deletion); two names are within distance ≤ 1 **only if** they share a
  * variant (equal → the name itself; one substitution at i → both delete
  * i; one insertion/deletion → the shorter IS a variant of the longer).
  * Candidates come from an EQUI-join on the variant — never an all-pairs
  * cross join — and an exact `levenshtein` filter removes the ≤-2 false
  * candidates blocking lets through. The variant join key is
  * `xxhash64(variant)` (8 bytes), not the string: a hash collision only
  * adds a candidate the exact filter drops, so the shuffle carries
  * fixed-width keys at zero correctness cost.
  *
  * Scale notes:
  *  - Emission factor is len+1 variants per name — linear, and each
  *    variant row carries only (hash, id, name).
  *  - A hot variant (many names one edit apart — boilerplate labels)
  *    makes the candidate set quadratic IN THAT BLOCK only; the
  *    pair-level `distinct` before the levenshtein bounds re-verification
  *    at one exact computation per unordered pair. For web-scale label
  *    sets, pre-collapse exact duplicates first (Dedup.exact) so block
  *    sizes count distinct labels, not occurrences.
  *  - Generalizes to distance d by deleting up to d characters (emission
  *    O(len^d)); d = 1 is the canonicalization workhorse and what this
  *    implements.
  */
object FuzzyJoin {

  /** Pairs (a_id, a_name, b_id, b_name, dist) with levenshtein ≤ 1 and
    * a_id < b_id (each unordered pair once, no self-pairs). `df` must
    * have unique ids per name occurrence. */
  def selfJoinWithin1(df: DataFrame, idCol: String, nameCol: String)
      : DataFrame = {
    // name itself + each single-character deletion (1-based substring
    // arithmetic: prefix [1, i-1] ++ suffix [i+1, len])
    val n = col("_name")
    val variants = array_union(array(n), transform(
      sequence(lit(1), greatest(length(n), lit(1))),
      i => concat(n.substr(lit(1), i - 1),
        n.substr(i + 1, greatest(length(n) - i, lit(0))))))
    val blocked = df.select(col(idCol).cast("long").as("_id"),
        col(nameCol).as("_name"))
      .withColumn("_vh", explode(variants))
      .withColumn("_vh", xxhash64(col("_vh")))
    val a = blocked.select(col("_vh"), col("_id").as("a_id"),
      col("_name").as("a_name"))
    val b = blocked.select(col("_vh"), col("_id").as("b_id"),
      col("_name").as("b_name"))
    a.join(b, Seq("_vh"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "a_name", "b_id", "b_name")
      .distinct()
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .where(col("dist") <= 1)
  }
}
