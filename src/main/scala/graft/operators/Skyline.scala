package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows not dominated on (minimize `x`,
  * maximize `y`). Row `s` dominates row `r` iff `s.x <= r.x && s.y >= r.y`
  * with at least one strict inequality — the classic preference query
  * (Börzsönyi et al., ICDE'01).
  *
  * The naive form is a quadratic self-anti-join; this is the distributed
  * two-phase shape:
  *
  * Phase 1 — bucket prune (all narrow + one dimension-sized aggregate):
  * rows are bucketed on coarse `x` bands; per-band `max(y)` is a tiny
  * table, and the running max over STRICTLY cheaper bands (every row
  * there has strictly smaller x, by the floor-bucket construction)
  * broadcast-joins back. A row with `y <= runmax(cheaper bands)` has a
  * strictly-cheaper, no-smaller-y dominator and is dropped. Survivors
  * are a provable superset of the skyline, AND dominance among survivors
  * is decisive: for any dominated survivor r, its max-y (tie-break
  * min-band) dominator d* also survives — if d* were pruned, some
  * strictly-cheaper-band row with y >= y(d*) would dominate r with the
  * same y and a smaller band, contradicting the choice of d*. So phase 2
  * may ignore pruned rows entirely.
  *
  * Phase 2 — exact sweep over the (small) survivor set, join-based (no
  * global windows — keeps the repo's zero-WindowExec-warning contract):
  * collapse survivors to per-x `max(y)` stats, self-join the stats table
  * to get `max(y) over strictly smaller x` (strict-x dominators), and
  * keep a row iff no strict-x dominator reaches its y AND it carries its
  * own x's max y (an equal-x row with larger y dominates, strict in y).
  * The stats self-join is quadratic only in DISTINCT surviving x values
  * — frontier-sized after phase 1, never input-sized — and both joins
  * back broadcast.
  *
  * Ties: duplicate `(x, y)` points do not dominate each other (no strict
  * inequality), so all copies are kept — matching the NOT EXISTS oracle.
  */
object Skyline {

  /** @param df input
    * @param xCol minimize column (numeric; compared raw, no arithmetic)
    * @param yCol maximize column
    * @param bandWidth phase-1 x-bucket width
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
      bandWidth: Double): DataFrame = {
    val banded = df.withColumn("_band",
      floor(col(xCol) / lit(bandWidth)).cast("long"))

    // per-band max(y), then max over strictly cheaper bands via a tiny
    // band×band self-join (the band table has x-range / bandWidth rows;
    // quadratic there is constant-bounded and avoids a global window).
    val bandMax = banded.groupBy("_band").agg(max(col(yCol)).as("_bmax"))
    val cheaperMax = bandMax.as("a")
      .join(bandMax.as("b"), col("b._band") < col("a._band"), "left")
      .groupBy(col("a._band").as("_band"))
      .agg(max(col("b._bmax")).as("_runmax"))

    val survivors = banded
      .join(broadcast(cheaperMax), Seq("_band"))
      .where(col("_runmax").isNull || col(yCol) > col("_runmax"))
      .drop("_band", "_runmax")

    // exact sweep on the survivor set: per-x stats, then strict-x
    // dominator max via the stats self-join.
    val xs = survivors.groupBy(col(xCol).as("_x"))
      .agg(max(col(yCol)).as("_ymax"))
    val strictMax = xs.as("a")
      .join(xs.as("b"), col("b._x") < col("a._x"), "left")
      .groupBy(col("a._x").as("_x"), col("a._ymax").as("_ymax"))
      .agg(max(col("b._ymax")).as("_mstrict"))

    survivors
      .join(broadcast(strictMax), col(xCol) === col("_x"))
      .where(col(yCol) === col("_ymax") &&
        (col("_mstrict").isNull || col("_mstrict") < col(yCol)))
      .drop("_x", "_ymax", "_mstrict")
  }
}
