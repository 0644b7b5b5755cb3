package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.canon.ConnectedComponents

/** Large-scale document deduplication suite — exact, MinHash+LSH, SimHash,
  * and n-gram Jaccard. All pure DataFrame/built-in-function pipelines
  * (xxhash64 is codegen'd), designed so every stage is a bounded shuffle:
  * shingle explosion is linear in corpus tokens, LSH banding turns the
  * quadratic pair search into per-bucket joins, and bucket sizes are capped
  * to keep any skewed boilerplate cluster from exploding a single reducer.
  */
object Dedup {

  /** Exact dedup: canonical row per identical `textCol` = min idCol.
    * One hash aggregation; at 100 TB group on xxhash64(text) first so the
    * shuffle key is 8 bytes, then resolve rare collisions on full text. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_dups"))
      .select(col("canonical_id"), col("n_dups"))
  }

  /** Word k-gram shingles of a text column as an array column. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) < k, array(text)) // short docs: whole text is the shingle
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k))))))
  }

  /** MinHash signatures: n independent 64-bit min-hashes per doc.
    * Hash family: xxhash64(shingle, seed_i). Computed as a NARROW
    * projection with array HOFs — no explode, no shuffle, no n-aggregate
    * codegen blowup; each row emits its full signature in one pass, so the
    * 100 TB scan stays embarrassingly parallel. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, numHashes: Int = 64): DataFrame = {
    // materialize the shingle array ONCE per row in its own projection —
    // referencing the shingles() expression inside all n signature columns
    // would recompute it n times (CollapseProject keeps the split because
    // the attribute is referenced n times, i.e. non-cheap multi-use)
    val shingled = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), k).as("_sh"))
    val sigCols = (0 until numHashes).map(i =>
      array_min(transform(col("_sh"), s => xxhash64(s, lit(i)))).as(s"h$i"))
    shingled.select(col("doc_id") +: sigCols: _*)
  }

  /** LSH candidate pairs from signatures: `bands` bands of
    * numHashes/bands rows; docs sharing any band bucket become candidates.
    * Bucket fan-out capped at `bucketCap` docs (hot boilerplate buckets are
    * truncated deterministically by doc id — a documented recall/skew
    * trade; log the drop in callers if needed). */
  def lshCandidates(signatures: DataFrame, numHashes: Int = 64,
      bands: Int = 16, bucketCap: Int = 50): DataFrame = {
    val r = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(i => col(s"h$i"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("sig"))
    }
    val buckets = signatures
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    val capped = buckets
      .groupBy("band", "sig")
      .agg(slice(sort_array(collect_list(col("doc_id"))), 1, bucketCap)
        .as("ids"))
      .where(size(col("ids")) > 1)
    // pairs within bucket (i < j), distinct across bands
    capped
      .select(explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))), p -> p.a < p.b)"))
        .as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
  }

  /** MinHash near-dup end-to-end: signatures → LSH candidates → exact
    * Jaccard verify → connected components → (doc_id, canonical_id). */
  def minhashDedup(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    // Cut lineage between stages: fusing the 64-column signature projection
    // into the band/bucket/verify plan lets CollapseProject inline the
    // shingle computation into every consumer (O(64×) recompute per row)
    // and balloons optimization time. At cluster scale these cuts become
    // persisted checkpoint tables (the pipeline's stage commits).
    val sigs = minhashSignatures(docs, idCol, textCol, k, numHashes)
      .localCheckpoint(true)
    val cands = lshCandidates(sigs, numHashes, bands).localCheckpoint(true)
    val verified = jaccardOnPairs(docs, cands, idCol, textCol, k)
      .where(col("jaccard") >= threshold)
    val comps = ConnectedComponents.run(
      verified.select(col("id_a").as("src"), col("id_b").as("dst")))
    comps.select(col("id").as("doc_id"), col("component").as("canonical_id"))
  }

  /** Exact pairwise Jaccard for given candidate pairs. */
  def jaccardOnPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol), k)).as("shingle")).distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.select(col("doc_id").as("id_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("id_b"), col("shingle"))
    val inter = pairs.join(a, "id_a").join(b, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact n-gram Jaccard similarity join above a threshold, with PREFIX
    * FILTERING (the classic exact similarity-join optimization, cf. PPJoin,
    * Xiao et al., WWW'08): order every doc's shingles by ascending global
    * frequency; for Jaccard ≥ t a matching pair MUST share one of each
    * doc's first |d| − ⌈t·|d|⌉ + 1 shingles, so the candidate join runs on
    * that small, rare-shingle prefix instead of every shingle — killing the
    * frequent-shingle bucket blowup — and the full intersection is computed
    * exactly only for candidates. Output identical to the naive all-pairs
    * join (oracle-checked in q34 + DedupSpec). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(shingles(col(textCol), k)).as("shingle")).distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val ranked = sh.join(freq, "shingle")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("df").asc, col("shingle").asc)))
      .join(sizes, "doc_id")
      .where(col("rn") <=
        col("sz") - ceil(lit(threshold) * col("sz")).cast("long") + 1)
      .select(col("doc_id"), col("shingle"))
    val candidates = ranked.select(col("doc_id").as("id_a"), col("shingle"))
      .join(ranked.select(col("doc_id").as("id_b"), col("shingle")), "shingle")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    jaccardOnPairs(docs, candidates, idCol, textCol, k)
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash per doc: bit i of the signature = sign of
    * Σ_tokens (bit i of xxhash64(token) ? +1 : −1). Computed as a NARROW
    * per-row array-HOF pipeline (no explode, no 64-aggregate shuffle): one
    * aggregate() pass accumulates the 64 bit-counts, a second folds them
    * into the signature. SQL shiftleft/shiftright accept column shift
    * amounts (the Scala functions API doesn't), hence expr(). */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sigSql =
      s"""aggregate(
            zip_with(
              aggregate(
                filter(split($textCol, ' '), t -> length(t) > 0),
                array_repeat(0L, 64),
                (acc, t) -> zip_with(acc, sequence(0, 63),
                  (a, i) -> a + IF((shiftright(xxhash64(t), i) & 1L) = 1L, 1L, -1L))),
              sequence(0, 63),
              (c, i) -> IF(c > 0L, shiftleft(1L, i), 0L)),
            0L, (s, x) -> s | x)"""
    docs.selectExpr(s"$idCol AS doc_id", s"($sigSql) AS simhash")
  }

  /** SimHash near-dup candidates: docs whose signatures match on any of the
    * four 16-bit bands differ by ≤ ~3 bits with high probability. */
  def simhashCandidates(sigs: DataFrame): DataFrame = {
    val bands = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bits"))
    }
    val buckets = sigs.select(col("doc_id"),
        explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bits").as("bits"))
    buckets.groupBy("band", "bits")
      .agg(slice(sort_array(collect_list(col("doc_id"))), 1, 50).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))), p -> p.a < p.b)"))
        .as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
  }
}
