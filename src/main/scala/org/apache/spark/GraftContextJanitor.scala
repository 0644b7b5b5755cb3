package org.apache.spark

/** Escape hatch for a poisoned SparkContext registry.
  *
  * `SparkContext.stop()` clears the global active-context registry only at
  * the END of its shutdown sequence, and the `stopped` flag is flipped at
  * the START. If the first stopper is interrupted partway (an external
  * signal, a racing shutdown hook, a killed thread — bench window X on this
  * host hit exactly that), every later `stop()` call returns immediately on
  * the already-set flag WITHOUT clearing the registry. From then on
  * `SparkSession.builder.getOrCreate()` keeps handing out the dead context
  * ("Using an existing SparkContext" → "Cannot call methods on a stopped
  * SparkContext") and no new session can ever be built in the JVM — window
  * X lost all five KG-scaling rounds to this.
  *
  * The involved members (`getActive`, `isStopped`, `clearActiveContext`)
  * are `private[spark]`, hence this one-object shim in the
  * `org.apache.spark` package. It touches the registry ONLY when the
  * registered context is provably stopped — a live context is never
  * cleared.
  */
object GraftContextJanitor {

  /** True iff `sc` has begun (or finished) stopping. */
  def isStopped(sc: SparkContext): Boolean = sc.isStopped

  /** If the globally-registered active SparkContext is already stopped,
    * clear the registry (and the SparkSession default/active slots, which
    * would otherwise still point at the dead session) so the next
    * `getOrCreate` builds a genuinely fresh context. Returns true when a
    * stale entry was cleared. */
  def clearIfStopped(): Boolean = SparkContext.getActive match {
    case Some(sc) if sc.isStopped =>
      SparkContext.clearActiveContext()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      true
    case _ => false
  }
}
