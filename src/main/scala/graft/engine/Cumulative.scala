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
      numPartitions: Int = 32): DataFrame =
    rankedCumSums(df, order, Seq(value -> cumName), rkName, numPartitions)

  /** [[rankedCumSum]] for SEVERAL values in one pass: each
    * `(value, cumName)` pair gets its own inclusive running sum, all
    * sharing one range shuffle, one per-partition window pass, and one
    * offset join (the q192 two-sample shape: cum1 and cum2 over the
    * same value order must not pay two shuffles).
    */
  def rankedCumSums(df: DataFrame, order: Seq[Column],
      values: Seq[(Column, String)], rkName: String = "rk",
      numPartitions: Int = 32): DataFrame = {
    val ranged = df
      .repartitionByRange(numPartitions, order: _*)
      .withColumn("__pid", spark_partition_id())
    val byPid = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val cumFrame =
      byPid.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = Tables.eager(values.zipWithIndex.foldLeft(
      ranged.withColumn("__lrn", row_number().over(byPid).cast("long"))) {
      case (acc, ((v, _), i)) =>
        acc.withColumn(s"__lcum$i", sum(v).over(cumFrame))
    })
    val subtotals = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"),
        values.zipWithIndex.map { case ((v, _), i) =>
          sum(v).as(s"__s$i")
        }: _*)
    val earlier = subtotals.select(
      (col("__pid").as("__pid2") +: col("__n").as("__n2") +:
        values.indices.map(i => col(s"__s$i").as(s"__s${i}2"))): _*)
    // exclusive prefix offsets over the N-row subtotal table: triangular
    // broadcast self-join, not a global window
    val offsets = subtotals
      .join(broadcast(earlier), col("__pid2") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(coalesce(sum(col("__n2")), lit(0L)).as("__noff"),
        values.indices.map(i =>
          coalesce(sum(col(s"__s${i}2")), lit(0L)).as(s"__soff$i")): _*)
    val joined = local.join(broadcast(offsets), "__pid")
      .withColumn(rkName, (col("__lrn") + col("__noff")).cast("long"))
    val withCums = values.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, name), i)) =>
        acc.withColumn(name, col(s"__lcum$i") + col(s"__soff$i"))
    }
    withCums.drop(
      ("__pid" +: "__lrn" +: "__noff" +:
        values.indices.flatMap(i =>
          Seq(s"__lcum$i", s"__soff$i"))): _*)
  }

  /** Running MAX over a total order, same two-phase shape as
    * [[rankedCumSum]] (max is associative, so per-range maxima plus a
    * broadcast prefix-max offset regroup exactly): appends `cumName` =
    * max of `value` over rows up to the current one — INCLUDING it by
    * default, or strictly BEFORE it with `inclusive = false` (the
    * record-detection frame: the global first row gets NULL, exactly
    * like the flat `ROWS ... AND 1 PRECEDING` window it replaces).
    * `greatest`/`max` skip NULLs on the combine, so partition-boundary
    * rows regroup correctly in the exclusive frame too.
    */
  def runningMax(df: DataFrame, order: Seq[Column], value: Column,
      cumName: String = "run_max", numPartitions: Int = 32,
      inclusive: Boolean = true): DataFrame = {
    val ranged = df
      .repartitionByRange(numPartitions, order: _*)
      .withColumn("__pid", spark_partition_id())
    val byPid = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val frame = if (inclusive)
      byPid.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    else byPid.rowsBetween(Window.unboundedPreceding, -1)
    val local = Tables.eager(
      ranged.withColumn("__lmax", max(value).over(frame)))
    val subtotals = local.groupBy(col("__pid")).agg(max(value).as("__m"))
    val earlier = subtotals.select(col("__pid").as("__pid2"),
      col("__m").as("__m2"))
    val offsets = subtotals
      .join(broadcast(earlier), col("__pid2") < col("__pid"), "left")
      .groupBy(col("__pid"))
      .agg(max(col("__m2")).as("__moff")) // null for the first range
    local.join(broadcast(offsets), "__pid")
      // greatest skips nulls; null result only when BOTH frames are
      // empty (the global first row under the exclusive frame)
      .withColumn(cumName, greatest(col("__lmax"), col("__moff")))
      .drop("__pid", "__lmax", "__moff")
  }
}
