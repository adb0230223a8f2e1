package graft.engine

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Spec hook exposing the INTERMEDIATE plans a query materializes before
  * its final DataFrame exists.
  *
  * [[Tables.eager]] persists-and-counts a subplan and [[Tables.landed]]
  * writes one to parquet; either way the subplan's operators are hidden
  * from the final plan behind an `InMemoryTableScan` / parquet scan, so a
  * plan-policy spec that inspects only the returned DataFrame is blind to
  * them. Round 17 proved the blind spot: q180's block-offset window (a
  * single-partition `WindowExec`, bounded by design to one row per 2-char
  * block prefix) executed inside `eager(...)` on every oracle run while
  * `GlobalWindowPolicySpec` — the allowlist that exists to catch exactly
  * that operator — never saw it.
  *
  * When enabled, the two chokepoints register every DataFrame they are
  * about to materialize (and, for `landed`, the compute plan even when the
  * table is already landed, so audit coverage does not depend on suite
  * order within the JVM); consumers drain the queue and traverse the
  * recorded frames' `executedPlan`s. Disabled — the default, and always in
  * the bench/verify mains — the hook is one volatile read per call, the
  * same spec-only observability precedent as [[Tables.landed]]'s
  * from-scratch-compute counter.
  */
object MaterializationAudit {
  final case class Recorded(site: String, plan: SparkPlan)

  @volatile private var sink: ConcurrentLinkedQueue[Recorded] = null

  def enabled: Boolean = sink != null

  /** Start recording; any previously recorded plans are discarded. */
  def enable(): Unit = sink = new ConcurrentLinkedQueue[Recorded]

  def disable(): Unit = sink = null

  /** Remove and return everything recorded since the last drain. */
  def drain(): Seq[Recorded] = {
    val s = sink
    if (s == null) Seq.empty
    else Iterator.continually(s.poll()).takeWhile(_ != null).toSeq
  }

  /** `df` is by-name so a plan that exists only for the audit (the
    * already-landed branch of [[Tables.landed]]) is never built when
    * recording is off. The executed plan is SNAPSHOTTED here, before the
    * caller persists the frame: `Dataset.persist` returns the same
    * instance, so forcing `executedPlan` after the fact would hand the
    * consumer an `InMemoryTableScan` of the whole plan — exactly the
    * substitution this hook exists to see through.
    *
    * Known spec-only side effect (r17 ADVICE): forcing `executedPlan`
    * pre-persist MEMOIZES it on the Dataset's QueryExecution, so a later
    * action invoked directly on the SAME Dataset instance (e.g. a spec
    * calling `.collect()` on the frame it passed to `eager`) re-executes
    * the raw plan and bypasses the cache it just populated — a perf skew
    * confined to audit-enabled spec runs (results are unchanged, and the
    * audit is always off in the bench/verify mains). Consumers that need
    * the cached path after recording should act through a fresh
    * `df.sparkSession.createDataFrame`-free handle such as `df.select("*")`,
    * whose new QueryExecution plans against the now-cached relation.
    */
  private[graft] def record(site: String, df: => DataFrame): Unit = {
    val s = sink
    if (s != null) s.add(Recorded(site, df.queryExecution.executedPlan))
  }
}
