package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AdaptiveSparkPlanHelper}
import org.apache.spark.sql.execution.window.WindowExec

/** The single-partition-window ALLOWLIST, as code. A `WindowExec` with
  * no partitionSpec moves every row to one partition — the canonical
  * scale-killer the round-10 conversions removed from every user/doc/
  * part-dimension walk (q125/q155/q174/q181/q186/q192/q214 now ride
  * `Cumulative.rankedCumSum`; q264 rides `runningMax`). The queries
  * listed here are the REVIEWED exceptions: their global windows run
  * over dimension-bounded inputs (weeks, days, heatmap cells, sketch
  * buckets, post-limit top-100 lists) or are documented-serial boundary
  * sweeps with a stated decomposition path (q144's Kaplan–Meier factor
  * fold, q251's concurrency walk). A NEW query that introduces a global
  * window fails this spec until it is either converted or reviewed onto
  * the list with a Scaladoc justification — the regression guard that
  * keeps "no single-partition windows at data scale" true as the
  * catalog grows.
  *
  * Round 17: the sweep also drains [[graft.engine.PlanAudit]], so global
  * windows inside `Tables.eager` / `Tables.landed` INTERMEDIATES — which
  * hide behind an InMemoryTableScan / parquet scan in the final plan —
  * are policed too (q180's block-offset window was invisible before).
  * The `WindowExec: No Partition Defined` warnings in a full-suite log
  * therefore all attribute to (a) the allowlisted queries executing in
  * their oracle suites (NewOpsSpec, RobustOpsSpec, NewOpsPlanSpec,
  * DecimalDisciplineSpec, and this spec's own fn invocations) or (b)
  * explicitly-serial oracle scaffolding (DedupPropertySpec's flat-rank
  * reference model).
  */
class GlobalWindowPolicySpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries whose plans may carry empty-partitionSpec WindowExec nodes,
    * each bounded or documented (see the query's Scaladoc).
    */
  private val allowed: Set[String] = Set(
    "q129_wow_growth",          // weeks
    "q144_survival_km",         // death-time table; documented exemption
    "q163_rrf_fusion",          // post-limit top-100 lists
    "q180_sorted_neighborhood", // one row per 2-char block prefix (the
                                // rank-offset running sum; caught by the
                                // eager-plan audit, reviewed round 17)
    "q189_quantile_sketch",     // fixed-width sketch buckets
    "q210_entry_exit_bounce",   // |event types| rows
    "q211_seasonal_dow",        // 7 weekday rows
    "q220_proximity_search",    // matched-doc shortlist
    "q225_return_rate",         // weeks
    "q227_invoice_recon",       // weeks
    "q229_seasonal_decomp",     // days
    "q238_process_conformance", // observed variant paths
    "q247_freshness_skew",      // per-table watermark rows
    "q251_concurrency_profile", // documented-serial boundary sweep
    "q252_basket_economics",    // basket-size buckets
    "q253_deviation_drawdown",  // days
    "q254_activity_heatmap")    // 168 cells

  test("only reviewed queries carry single-partition windows") {
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.initialPlan)
      case other => other +: other.children.flatMap(flatten)
    }
    def hasGlobalWindow(p: SparkPlan): Boolean = flatten(p).exists {
      case w: WindowExec => w.partitionSpec.isEmpty
      case _ => false
    }
    // The final plan alone is NOT enough: Tables.eager / Tables.landed
    // materialize intermediate plans whose operators then hide behind an
    // InMemoryTableScan / parquet scan (q180's block-offset window was
    // invisible here for five rounds). PlanAudit exposes them — every
    // eager'd frame and every landed compute, including already-landed
    // keys — so this sweep sees the WHOLE set of plans a query runs.
    engine.PlanAudit.enable()
    val offenders =
      try Catalog.all
        .filterNot(_.streaming) // streaming plans are runs, not lazy plans
        .flatMap { q =>
          val finalPlan = q.fn(spark, sfDir).queryExecution.executedPlan
          val audited = engine.PlanAudit.drain().map(_.plan)
          if ((finalPlan +: audited).exists(hasGlobalWindow) &&
              !allowed(q.name)) Some(q.name)
          else None
        }
      finally engine.PlanAudit.disable()
    withClue("unreviewed single-partition windows in: ") {
      offenders shouldBe empty
    }
    // and the allowlist itself stays honest: no stale entries
    val stale = allowed.filterNot(Catalog.all.map(_.name).toSet)
    withClue("allowlisted names not in the catalog: ") { stale shouldBe empty }
  }
}
