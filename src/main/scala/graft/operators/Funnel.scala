package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis: for each key, the earliest time it
  * completed step 1, then the earliest step-2 event AT OR AFTER that,
  * then the earliest step-3 event at or after THAT, and so on — the
  * classic product-analytics funnel (view → click → purchase), computed
  * as a chain of conditional min-aggregations.
  *
  * Scale shape: each stage is one filtered scan + min-groupBy (full
  * map-side partial aggregation) joined to the previous stage's
  * key-level frame — every intermediate is key-cardinality-sized, never
  * event-sized; AQE picks broadcast for the stage joins when keys fit.
  * steps.length passes over the (filtered) event scan; no windows, so no
  * per-key history materialization and no hot-key window hazard.
  */
object Funnel {

  /** Per-key funnel times: (keyCol, `<step>_ts` per step, stage) where
    * stage = number of steps completed in order (≥1 — keys that never did
    * step 1 are absent). Step timestamps after the first null out at the
    * first incomplete step. Step names must be distinct; they become
    * column names. */
  def funnel(events: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"step names must be distinct, got $steps")
    var prevTs = s"${steps.head}_ts"
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(keyCol).agg(min(tsCol).as(prevTs))
    steps.tail.foreach { step =>
      val stepTs = s"${step}_ts"
      val stg = events.where(col(typeCol) === step)
        .join(acc.select(col(keyCol), col(prevTs)), Seq(keyCol))
        .where(col(tsCol) >= col(prevTs))
        .groupBy(keyCol).agg(min(tsCol).as(stepTs))
      acc = acc.join(stg, Seq(keyCol), "left")
      prevTs = stepTs
    }
    acc.withColumn("stage",
      steps.map(s => when(col(s"${s}_ts").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }
}
