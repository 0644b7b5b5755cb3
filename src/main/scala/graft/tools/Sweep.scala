package graft.tools

/** On-demand /tmp fixture janitor — the callable form of
  * [[graft.sources.SourceSynth.cleanStaleRoots]], which otherwise only runs
  * when the fixture-writing classes happen to load. Long-lived hosts can
  * sweep without waiting for a query run:
  *
  *   sbt "runMain graft.tools.Sweep [maxAgeHours=6]"
  *
  * Reaps per-pid roots (/tmp/graft_sources_<pid>, /tmp/graft_kg_oracle_<pid>)
  * whose owning process is dead AND which have aged past the cutoff, plus
  * the pre-round-4 fixed legacy roots (age-only — they carry no owner pid).
  * No Spark session; safe to run beside live Verify/Bench processes (their
  * roots are skipped by the liveness check).
  */
object Sweep {
  def main(args: Array[String]): Unit = {
    val hours = args.headOption.flatMap(_.toLongOption).getOrElse(6L)
    graft.sources.SourceSynth.cleanStaleRoots(hours)
    println(s"[sweep] reclaimed stale graft fixture roots older than " +
      s"$hours h with no live owner")
  }
}
