package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) hashing — assign each key to the
  * shard whose `hash(key, shard)` is largest (Thaler & Ravishankar 1998,
  * the algorithm behind consistent cache/shard routing without a ring):
  * adding or removing ONE shard moves only ~1/S of the keys, and every
  * router computes the same assignment with no coordination state. The
  * data-platform uses: sticky writer assignment, cache-node routing,
  * deterministic work partitioning for the bucket-merge claims sink
  * family.
  *
  * DETERMINISM: the weight is the md5 hex of `key || '-' || shard` —
  * portable across engines (the q84/q91 contract), collision-free for
  * distinct inputs in any realistic keyspace, so `max_by(shard, weight)`
  * needs no tie rule. Everything is per-row projection plus one
  * key-grouped argmax whose partial aggregation keeps the explode
  * map-side — the S-way expansion never shuffles, only the (key, best)
  * pairs do. S is a routing table (≤ thousands); the expansion factor is
  * S, so at web scale prefer the two-level variant (rendezvous over
  * shard GROUPS, then within the group) — composable from this same
  * primitive. */
object Rendezvous {

  /** (key, shard) for every distinct key, shard ∈ [0, nShards). */
  def assign(spark: SparkSession, df: DataFrame, key: Column,
      nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 4096,
      s"nShards in [1,4096], got $nShards")
    val keys = df.select(key.cast("string").as("key")).distinct()
    val shards = broadcast(spark.range(nShards).select(
      col("id").cast("int").as("shard")))
    keys.crossJoin(shards)
      .select(col("key"), col("shard"),
        md5(concat(col("key"), lit("-"), col("shard").cast("string")))
          .as("w"))
      .groupBy("key")
      .agg(max_by(col("shard"), col("w")).as("shard"))
  }
}
