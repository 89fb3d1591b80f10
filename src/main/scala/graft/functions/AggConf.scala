package graft.functions

import org.apache.spark.sql.SparkSession

/**
 * Library-level session headroom for the typed-UDAF aggregates (r21,
 * VERDICT r20 next #3 — the r20 raise lived only in the four harness mains,
 * so a consumer building its own SparkSession silently lost the measured
 * ~2× on every typed-UDAF pass).
 *
 * Every graft typed UDAF ([[TopK]], [[SpaceSaving]], [[Aggregators]])
 * executes through `ObjectHashAggregateExec`, whose sort-based fallback
 * trips at `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
 * DISTINCT GROUPS per task — default 128. A batch-BM25 theta pass (one
 * group per query) or a per-bucket sketch pass (one group per time bucket)
 * crosses 128 groups immediately and falls back to SORTING ITS ENTIRE
 * INPUT; measured at sf0.1 that was 26.2 → 12.0 CPU-s on the theta stage
 * alone (r20).
 *
 * The raise is scale-safe, not a local tune: every graft UDAF buffer is
 * O(k) entries BY DESIGN (bounded partial aggregation is the point of
 * TopK / bottom-k / SpaceSaving — map output is capped at groups × k
 * entries), so 2²⁰ groups per task is ≤ ~300 MB of buffers, and real
 * per-task group counts (queries, strata, buckets) sit orders of magnitude
 * below the cap at any registered scale.
 *
 * SET-IF-UNSET: an explicit session value — builder `.config(...)`,
 * `--conf`, or a runtime `spark.conf.set` — always wins; the ensure only
 * fills the registered default in. Called from the UDAF Column factories
 * themselves, so every door inherits it with no per-main re-declaration.
 */
object AggConf {
  val FallbackThresholdKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

  /** 2²⁰ groups/task: with O(k) buffers (k ≤ ~100 across the doors) this is
    * bounded ≤ ~300 MB of aggregation state per task. */
  val FallbackThreshold: Int = 1 << 20

  /** Raise the ObjectHashAggregate fallback threshold on the active (else
    * default) session unless the caller set one explicitly. Runs at UDAF
    * Column construction — a driver-side conf write, no jobs; the conf is
    * session-dynamic, so plans built earlier in the session also execute
    * under it. */
  def ensureHashAggHeadroom(): Unit =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach { spark =>
        // sessionState.conf.contains sees only EXPLICITLY-set entries
        // (builder/--conf/runtime set) — the registered default reads as
        // absent, which is exactly the set-if-unset contract
        if (!spark.sessionState.conf.contains(FallbackThresholdKey))
          spark.conf.set(FallbackThresholdKey, FallbackThreshold.toString)
      }
}
