package graft.engine.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup pipeline.
  *
  * ## 100 TB notes
  * Connected components over a duplicate-pair edge set is the one graph
  * problem a training-data pipeline must solve at scale. Two engine
  * implementations exist, trading round count against per-round cost:
  *
  *  - min-label propagation (`DedupQueries.componentLabels`, q43): one
  *    equi-join shuffle per round, rounds = component DIAMETER. The right
  *    default for dedup graphs, whose components are dense near-cliques
  *    of diameter 2-3.
  *  - alternating large-star/small-star (here, q69): two groupBy+join
  *    shuffles per round, rounds = O(log n) on ANY shape — including the
  *    long chain that would cost label propagation one full shuffle per
  *    hop. Kiveris et al., "Connected Components in MapReduce and
  *    Beyond" (SOCC '14).
  *
  * Both run over the |V(edges)|-bounded vertex set (only docs that appear
  * in some duplicate pair), never the full corpus.
  */
object Graph {

  /** Connected components via alternating large-star/small-star rounds.
    *
    * Input: an edge DataFrame with two numeric columns `a`, `b` (any
    * direction, duplicates and self-loops tolerated). Output:
    * (`doc_id`, `component`) with component = min vertex id of the
    * component, one row per vertex that appears in some edge — the same
    * contract as q43's label propagation.
    *
    * Each round canonicalizes edges as (small, large) pairs:
    *  - large-star: every neighbor v > u re-attaches to m(u) =
    *    min(N(u) ∪ u) — long tails collapse toward minima in parallel;
    *  - small-star: every neighbor v < u re-attaches to m(u), and u
    *    itself attaches to m(u) — stars flatten so the next large-star
    *    sees the merged neighborhood.
    * The edge set strictly shrinks toward a union of min-rooted stars;
    * convergence = the round is a no-op (set equality via count +
    * exceptAll on the distinct edge tables). Every round is groupBy/join
    * equi-shuffles on the vertex key — no driver-side data.
    *
    * Each round's result is eagerly `localCheckpoint`ed: a round
    * references the previous edge table four times, so carrying raw
    * lineage would grow the logical plan 4^rounds (driver OOM while just
    * RENDERING the plan, observed at ~12 rounds). Checkpointing resets
    * the plan to a leaf per round — on a cluster this is `checkpoint` to
    * reliable storage, the standard iterative-Spark form.
    */
  def largeSmallStarComponents(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()

    // min over the closed neighborhood of each vertex of `und`
    def closedMin(und: DataFrame): DataFrame =
      und.groupBy(col("a"))
        .agg(least(min(col("b")), col("a")).as("m"))
        .select(col("a").as("u"), col("m"))

    def undirected(df: DataFrame): DataFrame =
      df.union(df.select(col("b").as("a"), col("a").as("b")))

    var cur = canon(edges).localCheckpoint(true)
    var curCount = cur.count()
    var converged = curCount == 0
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      // large-star: (u,v) with v > u emits (m(u), v); m <= u < v keeps the
      // pair canonical and can never be a self-loop
      val undCur = undirected(cur)
      val large = undCur
        .join(closedMin(undCur), col("a") === col("u"))
        .filter(col("b") > col("a"))
        .select(col("m").as("a"), col("b"))
        .distinct()
      // small-star over the large-star output: (u,v) with v < u emits
      // (m(u), v), plus (m(u), u) — m <= v < u, so only the u = m(u)
      // self-attachment needs the self-loop filter
      val undL = undirected(large)
      val mL = closedMin(undL)
      val small = undL
        .join(mL, col("a") === col("u"))
        .filter(col("b") < col("a"))
        .select(col("m").as("a"), col("b"))
        .union(mL.select(col("m").as("a"), col("u").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct()
      val next = small.localCheckpoint(true)
      val nextCount = next.count()
      // both sides are distinct canonical sets: equal counts + empty
      // difference <=> equal sets <=> the round changed nothing
      converged = nextCount == curCount && next.exceptAll(cur).isEmpty
      cur = next
      curCount = nextCount
      rounds += 1
    }
    // same contract as label propagation: never emit a partial clustering
    if (!converged)
      throw new IllegalStateException(
        s"large/small-star components did not converge in $rounds rounds")
    // at the fixpoint the graph is a union of min-rooted stars: every
    // member's closed-neighborhood min IS the root, and the root's is itself
    closedMin(undirected(cur))
      .select(col("u").as("doc_id"), col("m").as("component"))
  }
}
