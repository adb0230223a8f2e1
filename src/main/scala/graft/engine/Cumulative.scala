package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scale-safe ranked cumulative walks.
  *
  * The naive ranked-cumulative idiom — `row_number().over(Window
  * .orderBy(...))` plus a running `sum().over(...)` on the same global
  * window — moves EVERY row to one partition (Spark logs `WindowExec:
  * No Partition Defined`). Over a dimension-sized aggregate (|users|,
  * |parts|) that is a long single task at 100×, the classic
  * tail-latency bottleneck: correct, but one core does all the work.
  *
  * [[rankedCumSum]] is the two-phase alternative (the textbook
  * distributed prefix-sum):
  *
  *  1. `repartitionByRange` on the total order — each of the N
  *     partitions holds one contiguous key range, N cores sort N
  *     range-disjoint slices;
  *  2. per-partition `row_number`/running-sum windows PARTITIONED BY
  *     `spark_partition_id()` — bounded state, parallel;
  *  3. per-partition (count, sum) subtotals — an N-row table — turned
  *     into exclusive prefix offsets by a broadcast triangular
  *     self-join (`b.pid < a.pid`), NOT another global window, so no
  *     single-partition `WindowExec` exists anywhere in the plan;
  *  4. broadcast the N-row offset table back and add.
  *
  * The output is row-identical to the single-partition window whenever
  * `order` is a TOTAL order (every caller's is — ties must be broken,
  * q155's `(cents desc, user_id)` discipline), because range partitions
  * are contiguous and ordered by partition id: global rank = local rank
  * + rows in earlier ranges, global running sum = local running sum +
  * sum of earlier ranges. Partition boundaries come from sampling and
  * are NOT deterministic — but every boundary placement yields the same
  * ranks and sums, so results are partitioning-invariant (the §7.11
  * sweep covers the converted queries like any other).
  *
  * `value` should be an exact type (BIGINT cents / centi-units or
  * decimal — the Catalog determinism contract); the helper adds partial
  * sums in whatever type `sum(value)` infers.
  */
object Cumulative {

  /** Append to `df` a global rank (`rkName`, BIGINT, ordered by
    * `order`) and running sum of `value` (`cumName`, inclusive of the
    * current row) without any single-partition window. `order` must be
    * a total order. The input is materialized once (the per-partition
    * pass and the subtotal pass must observe identical partition ids).
    */
  def rankedCumSum(df: DataFrame, order: Seq[Column], value: Column,
      rkName: String = "rk", cumName: String = "cum",
      numPartitions: Int = 32): DataFrame = {
    val ranged = df
      .repartitionByRange(numPartitions, order: _*)
      .withColumn("__pid", spark_partition_id())
    val byPid = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val local = Tables.eager(ranged
      .withColumn("__lrn", row_number().over(byPid).cast("long"))
      .withColumn("__lcum", sum(value).over(
        byPid.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    val subtotals = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"), sum(value).as("__s"))
    val earlier = subtotals.select(col("__pid").as("__pid2"),
      col("__n").as("__n2"), col("__s").as("__s2"))
    // exclusive prefix offsets over the N-row subtotal table: triangular
    // broadcast self-join, not a global window
    val offsets = subtotals
      .join(broadcast(earlier), col("__pid2") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(coalesce(sum(col("__n2")), lit(0L)).as("__noff"),
        coalesce(sum(col("__s2")), lit(0L)).as("__soff"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(rkName, (col("__lrn") + col("__noff")).cast("long"))
      .withColumn(cumName, col("__lcum") + col("__soff"))
      .drop("__pid", "__lrn", "__lcum", "__noff", "__soff")
  }
}
