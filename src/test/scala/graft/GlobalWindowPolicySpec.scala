package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AdaptiveSparkPlanHelper}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Catalog-wide physical-plan POLICIES, as code — the two canonical
  * scale-killers, each with a reviewed allowlist:
  *
  *  1. **Single-partition windows.** A `WindowExec` with no partitionSpec
  *     moves every row to one partition — removed from every user/doc/
  *     part-dimension walk in round 10 (q125/q155/q174/q181/q186/q192/
  *     q214 ride `Cumulative.rankedCumSum`; q264 rides `runningMax`).
  *     The allowlisted exceptions run over dimension-bounded inputs
  *     (weeks, days, heatmap cells, sketch buckets, post-limit top-100
  *     lists) or are documented-serial boundary sweeps with a stated
  *     decomposition path (q144's Kaplan–Meier factor fold, q251's
  *     concurrency walk).
  *  2. **Unbounded cross/nested-loop joins.** The catalog's ~86
  *     `crossJoin` sites are 1-row scalar attaches; this spec proves the
  *     shape STRUCTURALLY: every `BroadcastNestedLoopJoinExec` must
  *     broadcast a provably-bounded subplan (a grouping-free aggregate,
  *     a limit, or literal driver data) and every `CartesianProductExec`
  *     must multiply two bounded sides — except the three labeled
  *     all-pairs losslessness oracles, allowlisted by name. Previously a
  *     judge-side manual scan ("no cartesian outside labeled attaches");
  *     now a regression gate.
  *
  * A NEW query that trips either policy fails here until it is converted
  * or reviewed onto the list with a Scaladoc justification.
  *
  * Round 17: the sweep also drains [[graft.engine.MaterializationAudit]], so
  * operators inside `Tables.eager` / `Tables.landed` INTERMEDIATES —
  * which hide behind an InMemoryTableScan / parquet scan in the final
  * plan — are policed too (q180's block-offset window was invisible
  * before). The `WindowExec: No Partition Defined` warnings in a
  * full-suite log therefore all attribute to (a) the allowlisted queries
  * executing in their oracle suites (NewOpsSpec, RobustOpsSpec,
  * NewOpsPlanSpec, DecimalDisciplineSpec, and this spec's own fn
  * invocations) or (b) explicitly-serial spec scaffolding —
  * DedupPropertySpec's flat-rank reference model, and
  * MaterializationAuditSpec's deliberately-constructed q180 shapes
  * (tiny literal frames exercising the audit itself).
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

  /** The labeled all-pairs joins: exhaustive ORACLE passes whose
    * Scaladoc documents the blocked/bucketed production path they bound
    * (losslessness proofs, not the scale path).
    */
  private val allPairsAllowed: Set[String] = Set(
    "q102_prefix_join",   // prefix-filter losslessness vs brute force
    "q137_symspell_join", // deletion-neighborhood losslessness
    "q241_ann_bits_curve") // documented exhaustive truth pass

  private def flatten(p: SparkPlan): Seq[SparkPlan] = PlanBounds.flatten(p)

  /** One catalog pass: each non-streaming query's FINAL executed plan
    * plus every intermediate plan it materializes through Tables.eager /
    * Tables.landed (drained from MaterializationAudit). The final plan alone is NOT
    * enough — materialized subplans hide behind an InMemoryTableScan /
    * parquet scan (q180's block-offset window was invisible that way for
    * five rounds). Both policy tests read this one sweep.
    */
  private lazy val sweep: Seq[(String, Seq[SparkPlan])] = {
    engine.MaterializationAudit.enable()
    try Catalog.all
      .filterNot(_.streaming) // streaming plans are runs, not lazy plans
      .map { q =>
        val finalPlan = q.fn(spark, sfDir).queryExecution.executedPlan
        (q.name, finalPlan +: engine.MaterializationAudit.drain().map(_.plan))
      }
    finally engine.MaterializationAudit.disable()
  }

  test("only reviewed queries carry single-partition windows") {
    val offenders = sweep.collect {
      case (name, plans) if !allowed(name) && plans.flatMap(flatten).exists {
        case w: WindowExec => w.partitionSpec.isEmpty
        case _ => false
      } => name
    }
    withClue("unreviewed single-partition windows in: ") {
      offenders shouldBe empty
    }
    // and the allowlist itself stays honest: no stale entries
    val stale = allowed.filterNot(Catalog.all.map(_.name).toSet)
    withClue("allowlisted names not in the catalog: ") { stale shouldBe empty }
  }

  private def bounded(p: SparkPlan): Boolean = PlanBounds.bounded(p)

  /** Round-20 allowlist for the collapsed-window gate below: queries
    * whose bounded-domain-key windows were reviewed. Entries must state
    * why the shape survives scale (usually: the window's CHILD is
    * small-by-construction for a reason PlanBounds cannot prove —
    * a TIME-GRAIN or HISTOGRAM-SUPPORT aggregate, sub-linear in data).
    * The round-20 review CONVERTED the five queries whose windows ran
    * over raw per-row tables (q82/q96/q105/q109/q274 — now
    * `Cumulative.groupedRankedCumSums` / broadcast join-backs); these
    * remaining entries window over grain tables only.
    */
  private val collapsedAllowed: Set[String] = Set(
    "q85_moving_average",   // hourly grain agg: |hours| rows per type —
                            // the documented two-level calendar shape
    "q143_cusum_changepoint", // daily grain agg: |days| rows per type
    "q161_autocorr",        // daily grain agg: |days| rows per type
    "q179_interpolate_gaps", // hourly spine x |types|: |hours| per type
    "q236_fanout_profile",  // fan-out histogram: |distinct sizes| per
                            // edge (histogram support, not rows)
    "q288_qte_deciles",     // value histogram: |distinct cents| per arm
    "q282_rle_profile")     // per-FILE run detection: file ids scale
                            // with a real manifest; the fixture
                            // synthesizes 32 from the bounded key
                            // domain, so the constant domain is a
                            // fixture artifact, not the operator shape

  test("window partition keys must scale out: bounded-domain keys over " +
      "an unbounded child collapse to constant partitions (round-20: " +
      "the low-cardinality cousin of the empty-partitionSpec killer)") {
    // a WindowExec partitioned ONLY by code-constant-domain keys (an
    // enum column, pmod-by-literal, a calendar part) over an unbounded
    // child shuffles the whole table into |domain| partitions — each a
    // single-task TB-scale sort at 100 TB. partitionSpec.isEmpty cannot
    // see it; this gate can. A bounded partition KEY never blesses a
    // window; only a bounded CHILD (or a genuinely scaling key) does.
    val offenders = sweep.collect {
      case (name, plans) if !collapsedAllowed(name) &&
        plans.flatMap(flatten).exists {
          case w: WindowExec => w.partitionSpec.nonEmpty &&
            PlanBounds.allConstantDomains(w.partitionSpec, w) &&
            !bounded(w.child)
          case _ => false
        } => name
    }
    withClue("bounded-domain window partition keys over unbounded " +
      "children in: ") { offenders shouldBe empty }
    val stale = collapsedAllowed.filterNot(Catalog.all.map(_.name).toSet)
    withClue("allowlisted names not in the catalog: ") { stale shouldBe empty }
  }

  test("cross/nested-loop joins only attach provably-bounded sides") {
    val offenders = sweep.collect {
      case (name, plans) if !allPairsAllowed(name) &&
        plans.flatMap(flatten).exists {
          case c: CartesianProductExec =>
            !(bounded(c.left) && bounded(c.right))
          case j: BroadcastNestedLoopJoinExec =>
            !bounded(j.buildSide match {
              case BuildLeft => j.left
              case BuildRight => j.right
            })
          case _ => false
        } => name
    }
    withClue("unbounded cross/nested-loop joins in: ") {
      offenders shouldBe empty
    }
    val stale = allPairsAllowed.filterNot(Catalog.all.map(_.name).toSet)
    withClue("allowlisted names not in the catalog: ") { stale shouldBe empty }
  }
}
