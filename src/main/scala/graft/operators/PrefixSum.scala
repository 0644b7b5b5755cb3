package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL running totals — the reusable form of the
  * [[graft.pack.Packing]] / [[graft.canon.KeyAssigner]] prefix-sum shape,
  * for every "cumulative X in global order" need (CDFs, running budgets,
  * stream offsets) where `Window.orderBy` with no partition — a
  * single-partition WindowExec over data-proportional input, the exact
  * 100 TB anti-pattern — would be the naive answer:
  *
  *   1. range-partition by the order key (P = shuffle partitions);
  *   2. per-partition running sums under a PARTITION-LOCAL window;
  *   3. one O(P) sequential pass over the P per-partition totals for the
  *      cross-partition offsets (trivial at any cluster size; computed in
  *      an explicit 1-partition mapPartitions, never a driver collect),
  *      broadcast-joined back.
  *
  * The result is bit-identical to the single-partition window (integer
  * sums are associative and exact) with every data-proportional step
  * distributed.
  *
  * The order key must be GLOBALLY UNIQUE (range partitioning may split
  * ties across partition boundaries, making "running total at a tied
  * key" partitioning-dependent) — pre-aggregate to distinct keys first,
  * which is also what makes a CDF well-defined. */
object PrefixSum {

  /** Input plus one `<v>_cum` LONG column per entry of `valueCols`:
    * inclusive running totals in ascending `orderCol` order. */
  def withRunningTotals(df: DataFrame, orderCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df
      .repartitionByRange(parts, col(orderCol))
      .withColumn("_pid", spark_partition_id())
    // localCheckpoint: the ranged frame feeds BOTH the row-level cums and
    // the per-partition totals; repartitionByRange SAMPLES its child, so
    // two independent executions could pick different boundaries (the
    // Packing/KeyAssigner boundary-stability note)
    val w = Window.partitionBy("_pid").orderBy(orderCol)
    val local = valueCols.foldLeft(ranged) { (d, v) =>
      d.withColumn(s"${v}_lcum", sum(col(v).cast("long")).over(w))
    }.localCheckpoint(true)
    val offsets = local.groupBy("_pid")
      .agg(sum(col(valueCols.head).cast("long")).as("_t0"),
        valueCols.drop(1).zipWithIndex.map { case (v, i) =>
          sum(col(v).cast("long")).as(s"_t${i + 1}")
        }: _*)
      .select(col("_pid").cast("int").as("_pid"),
        array(valueCols.indices.map(i =>
          coalesce(col(s"_t$i"), lit(0L))): _*).as("_ts"))
      .as[(Int, Seq[Long])]
      .repartition(1).sortWithinPartitions("_pid")
      .mapPartitions { it =>
        var acc: Array[Long] = null
        it.map { case (pid, ts) =>
          if (acc == null) acc = Array.fill(ts.size)(0L)
          val off = acc.toSeq
          acc = acc.zip(ts).map { case (a, t) => a + t }
          (pid, off)
        }
      }.toDF("_pid", "_offs")
    local.join(broadcast(offsets), Seq("_pid"))
      .select(df.columns.map(col) ++ valueCols.zipWithIndex.map {
        case (v, i) =>
          (col(s"${v}_lcum") + col("_offs")(i)).as(s"${v}_cum")
      }: _*)
  }
}
