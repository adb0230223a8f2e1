package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: fold pre-aggregated DELTAS into a
  * standing gold aggregate without recomputing history — the batch
  * counterpart of the streaming running totals (q119/q265), and the
  * algebra behind every "process only today's partition" pipeline.
  *
  * Correctness rests on the merged measures being part of a COMMUTATIVE
  * MONOID: `sum` columns add (identity 0), `max` columns take greatest
  * (identity -inf / NULL-absent). For those, per-batch aggregation
  * followed by [[mergeAdditive]] is provably equal to one aggregation
  * over the union — `agg(A ∪ B) = merge(agg(A), agg(B))` — on ANY split
  * of the input (q277 oracle-checks exactly that identity; the average
  * counterexample is handled the standard way: carry sum and count,
  * divide at read time).
  *
  * ## 100 TB notes
  * The merge joins |keys-ever-seen| against |keys-in-delta| — a
  * key-space-sized shuffle instead of a history-sized recompute. At
  * scale the gold side is a bucketed table on the key, so the join
  * co-locates without a full shuffle, and the delta side is one
  * day/hour partition. AQE picks the broadcast side when a delta is
  * small.
  */
object Incremental {

  /** Merge a pre-aggregated `delta` into `gold` (both keyed by `keys`,
    * same schema): `sums` columns add with 0-identity, `maxs` columns
    * take the greatest with NULL-absent identity. Keys present in only
    * one side pass through. Column order is preserved as
    * keys ++ sums ++ maxs.
    */
  def mergeAdditive(gold: DataFrame, delta: DataFrame, keys: Seq[String],
      sums: Seq[String], maxs: Seq[String] = Nil): DataFrame = {
    val g = gold.alias("g")
    val d = delta.alias("d")
    val cond = keys.map(k => col(s"g.$k") <=> col(s"d.$k"))
      .reduce(_ && _)
    val keyCols = keys.map(k => coalesce(col(s"g.$k"), col(s"d.$k")).as(k))
    val sumCols = sums.map { c =>
      (coalesce(col(s"g.$c"), lit(0)) + coalesce(col(s"d.$c"), lit(0)))
        .as(c)
    }
    val maxCols = maxs.map { c =>
      coalesce(greatest(col(s"g.$c"), col(s"d.$c")),
        col(s"g.$c"), col(s"d.$c")).as(c)
    }
    g.join(d, cond, "full_outer")
      .select(keyCols ++ sumCols ++ maxCols: _*)
  }
}
