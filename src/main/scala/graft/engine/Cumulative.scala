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
  * sums in whatever type `sum(value)` infers. Values must also be
  * NON-NULL (same class of contract as [[groupedRankedCumSums]]'s
  * non-null keys): window `sum` skips nulls and yields NULL over an
  * all-null prefix, and the two-phase combine `local + offset`
  * null-propagates — a row whose local prefix is all-NULL inside a
  * range with non-null values in EARLIER ranges would read NULL where
  * the flat window form reads the earlier-range sum. Wrap nullable
  * values in `coalesce(v, 0)` at the call site (every current caller
  * sums inherently non-null measures; [[runningMax]] is immune — its
  * `greatest` combine skips nulls by design).
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

  /** PER-GROUP rank and running sums without partitioning any window by
    * the group key (round-20 gate: a window `PARTITION BY <enum>` over
    * an unbounded child shuffles the whole table into |enum| partitions
    * — each a single-task TB-scale sort at 100 TB, the low-cardinality
    * cousin of the global window [[rankedCumSum]] replaces).
    *
    * Shape (round-21 rewrite — one window pass, no global-rank layer):
    * range-partition on `keys ++ order` (keys lead, so each group's
    * rows occupy a contiguous run of partitions and, within a group,
    * partition id is monotone in `order`), then per-(partition, group)
    * CELL windows — `row_number`/running sums PARTITIONED BY
    * `(spark_partition_id, keys)`, bounded state, scales with data
    * partitions — and finally per-cell exclusive offsets (rows and
    * value totals of the SAME group in EARLIER partitions) computed by
    * a per-group prefix window over the BOUNDED cell table (a
    * per-(pid, group) aggregate, ≤ numPartitions x |groups| rows — the
    * dimension-sized-pre-aggregate class the plan policy permits
    * windows over), broadcast back. Per-group rank = local
    * rank + earlier-partition rows; per-group cumsum = local cum +
    * earlier-partition totals. Row-identical to
    * `row_number()/sum() OVER (PARTITION BY keys ORDER BY order)`.
    *
    * The round-20 version routed through a GLOBAL [[rankedCumSums]]
    * first and subtracted per-group block offsets; that cost a second
    * full-data window pass plus three more passes over the ranked
    * intermediate (the q96 3x-recompute in VERDICT r20 #2). This shape
    * computes the same numbers from one cached window pass and TWO
    * passes over it (the cell aggregate and the final join-back).
    *
    * `keys` must be dimension-bounded (the cell/offset tables are
    * broadcast — ≤ numPartitions x |groups| rows, same contract as
    * every broadcast dim in the catalog) and NON-NULL (the offset
    * join-back is an equi-join; a null key row would silently drop
    * where the window form keeps a null partition — wrap nullable keys
    * in `coalesce` at the call site); `order` must be total WITHIN
    * each group (keys ++ order total overall). `totalName`, when set,
    * additionally appends each group's TOTAL row count to every row
    * (from the already-bounded cell table — callers that need
    * "rank out of n per group" get n without a second full-data
    * aggregate + join, the q96 shape).
    */
  def groupedRankedCumSums(df: DataFrame, keys: Seq[Column],
      order: Seq[Column], values: Seq[(Column, String)] = Nil,
      rkName: String = "rk", numPartitions: Int = 32,
      totalName: Option[String] = None): DataFrame = {
    val keyNames = keys.indices.map(i => s"__k$i")
    val ranged = df
      .repartitionByRange(numPartitions, (keys ++ order): _*)
      .withColumn("__pid", spark_partition_id())
    val keyed = keyNames.zip(keys).foldLeft(ranged) {
      case (acc, (kn, k)) => acc.withColumn(kn, k)
    }
    val byCell = Window
      .partitionBy((col("__pid") +: keyNames.map(col)): _*)
      .orderBy(order: _*)
    val cumFrame =
      byCell.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // materialized once (eager): the cell aggregate and the final
    // join-back below must observe identical partition ids, and the
    // window pass must never recompute per consumer
    val local = Tables.eager(values.zipWithIndex.foldLeft(
      keyed.withColumn("__lrn", row_number().over(byCell).cast("long"))) {
      case (acc, ((v, _), i)) =>
        acc.withColumn(s"__lcum$i", sum(v).over(cumFrame))
    })
    // per-(pid, group) cell stats: row count + per-value totals (the
    // ORIGINAL value expression re-summed — deterministic per the
    // Catalog contract — because with negative values the inclusive
    // cum's max is NOT the total). Bounded: contiguity makes it
    // ~numPartitions + |groups| rows.
    val cells = local
      .groupBy((col("__pid") +: keyNames.map(col)): _*)
      .agg(count(lit(1)).as("__n"),
        values.zipWithIndex.map { case ((v, _), i) =>
          sum(v).as(s"__s$i")
        }: _*)
    // exclusive prefix offsets per cell — same-group earlier-partition
    // totals — via windows over the BOUNDED cell table (a per-group
    // window whose child is a provably bounded aggregate is exactly
    // the dimension-sized-pre-aggregate class the plan policy permits;
    // each group's window partition holds at most numPartitions cells).
    // One pass over cells, so it is consumed exactly once.
    val byKey = Window.partitionBy(keyNames.map(col): _*)
    val cumByPid = byKey.orderBy(col("__pid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs0 = values.indices.foldLeft(
      cells.withColumn("__noff", sum(col("__n")).over(cumByPid) - col("__n"))) {
      case (acc, i) =>
        acc.withColumn(s"__soff$i",
          sum(col(s"__s$i")).over(cumByPid) - col(s"__s$i"))
    }
    val offsT = totalName.fold(offs0) { tn =>
      // the group's total row count, from the same bounded table in the
      // same window pass (unbounded frame) — callers that need "rank
      // out of n per group" get n without a full-data aggregate + join
      offs0.withColumn(tn, sum(col("__n")).over(byKey).cast("long"))
    }.drop(("__n" +: values.indices.map(i => s"__s$i")): _*)
    val joined = local.join(broadcast(offsT), "__pid" +: keyNames)
      .withColumn(rkName, (col("__lrn") + col("__noff")).cast("long"))
    values.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, name), i)) =>
        acc.withColumn(name, col(s"__lcum$i") + col(s"__soff$i"))
    }.drop((Seq("__pid", "__lrn", "__noff") ++ keyNames ++
      values.indices.flatMap(i => Seq(s"__lcum$i", s"__soff$i"))): _*)
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
