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

  /** Fold one micro-batch's pre-aggregated `delta` into the standing
    * parquet snapshot under `root/gold`, EXACTLY ONCE, surviving a
    * crash at any point (the q284 publish discipline, extracted so the
    * replay and crash-window paths are unit-testable):
    *
    *  - *recovery*: a crash between the two publish renames leaves
    *    `gold` absent with `gold_prev` holding the only full snapshot;
    *    it is restored before anything else (and before any rm).
    *  - *replay idempotence*: the snapshot embeds the id of the last
    *    batch folded into it (`_applied_batch`, `_`-prefixed so parquet
    *    readers skip it; it rides INSIDE the directory swap, so marker
    *    and data publish atomically together). A batch replayed after a
    *    crash past the publish but before the engine committed its
    *    checkpoint is recognized and SKIPPED — the additive merge is
    *    not idempotent on its own.
    *  - *publish by rename*: rename the old snapshot aside, move tmp
    *    in, then delete — a reader sees batch N or N+1 and never a TORN
    *    snapshot; the only exposure is the instant between the two
    *    renames, when the directory is briefly absent (a real
    *    deployment swaps a symlink or metastore pointer for true
    *    atomicity — this helper's callers are single-reader pipelines).
    *
    * Returns true when the batch was applied, false when it was a
    * recognized replay.
    */
  def publishAdditiveBatch(spark: org.apache.spark.sql.SparkSession,
      root: java.nio.file.Path, delta: DataFrame, batchId: Long,
      keys: Seq[String], sums: Seq[String]): Boolean = {
    import java.nio.file.Files
    val goldDir = root.resolve("gold")
    val prev = root.resolve("gold_prev")
    if (!Files.exists(goldDir) && Files.exists(prev))
      Files.move(prev, goldDir)
    val marker = goldDir.resolve("_applied_batch")
    val applied =
      if (Files.exists(marker))
        new String(Files.readAllBytes(marker),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      else -1L
    if (batchId <= applied) false
    else {
      val merged =
        if (Files.exists(goldDir))
          mergeAdditive(spark.read.parquet(goldDir.toString), delta,
            keys, sums)
        else delta
      val tmp = root.resolve("gold_tmp")
      merged.write.mode("overwrite").parquet(tmp.toString)
      Files.write(tmp.resolve("_applied_batch"),
        batchId.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      Fs.deleteRecursively(prev)
      if (Files.exists(goldDir)) Files.move(goldDir, prev)
      Files.move(tmp, goldDir)
      Fs.deleteRecursively(prev)
      true
    }
  }
}
