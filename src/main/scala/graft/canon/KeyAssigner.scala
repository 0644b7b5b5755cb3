package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dense key assignment: key = rank of the natural id in
  * global sort order, 1..N.
  *
  * Matches the reference's `_assign_keys` (sorted unique values → 1..N,
  * reference:src/kg_ae/graph/build.py:44-47) but WITHOUT the single-partition
  * `Window.orderBy` bottleneck (SURVEY.md §7.4): range-repartition by the
  * id, sort within partitions, per-partition local row_number, then add
  * broadcast cumulative offsets. Every step is distributed; the only
  * single-point data is the per-partition count vector (numPartitions rows).
  *
  * NOT `monotonically_increasing_id()` — that is non-deterministic across
  * runs/partitionings; these keys must be stable for resume + P/R checks.
  */
object KeyAssigner {

  /** labels: any DataFrame with column `idCol` (other cols dropped).
    * Returns (idCol, key: Long) with dense deterministic keys 1..N. */
  def assign(labels: DataFrame, idCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = labels.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val distinct = labels.select(col(idCol)).where(col(idCol).isNotNull).distinct()
    // Range partitioner assigns ascending key ranges to ascending partition
    // ids, so (partition id, local rank) is a global total order.
    val ranged = distinct.repartitionByRange(parts, col(idCol))
      .withColumn("_pid", spark_partition_id())
    // localCheckpoint: the ranked frame feeds BOTH the output rows and the
    // per-partition counts below, and key correctness requires the two to
    // see the SAME range-partition boundaries. Without materialization
    // that is guaranteed only by exchange reuse — repartitionByRange
    // SAMPLES its child, so two independent executions of the subtree can
    // pick different boundaries, and offsets computed against one
    // partitioning would be applied to rows numbered under another
    // (duplicate/skipped keys, silent). One eager materialization of the
    // dimension-sized distinct-id set makes the boundaries a fact.
    val localRank = ranged.withColumn(
      "_rn", row_number().over(Window.partitionBy("_pid").orderBy(col(idCol))))
      .localCheckpoint(true)
    val counts = localRank.groupBy("_pid").count() // numPartitions rows — tiny
    // cumulative offsets over the numPartitions-row count vector: one
    // narrow O(P) scan pass in an EXPLICIT single partition (a prefix sum
    // is inherently sequential over P rows; P = shuffle partitions, so
    // this stays trivial at any realistic cluster size). Equivalent to
    // the old global Window.orderBy but without the "No Partition
    // Defined" warning — which stays reserved for windows over
    // data-proportional frames — and without a quadratic self-join.
    import spark.implicits._
    val offsets = counts
      .select(col("_pid").cast("int").as("_pid"), col("count"))
      .as[(Int, Long)]
      .repartition(1).sortWithinPartitions("_pid")
      .mapPartitions { it =>
        var acc = 0L
        it.map { case (pid, c) => val off = acc; acc += c; (pid, off) }
      }
      .toDF("_pid", "_offset")
    // offsets is numPartitions rows — no static broadcast hint on purpose:
    // AQE broadcasts it at runtime from its true size, and keeping the KG
    // build free of compile-time hints lets PlanSpec assert that nothing
    // fact-proportional (claim keys!) is ever hint-broadcast.
    localRank
      .join(offsets, Seq("_pid"))
      .select(col(idCol), (col("_rn").cast("long") + col("_offset")).as("key"))
  }

}
