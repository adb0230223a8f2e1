package graft.engine.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks as built-ins: AS-OF join and
  * bounded RANGE join (SURVEY §7.3 decision (a): compose existing ops —
  * no custom strategy needed; both reduce to one equi-shuffle).
  *
  * ## 100 TB notes
  *  - asofJoin is the union trick: interleave both sides in one
  *    window over (key, time) and carry the last right-row struct
  *    forward. ONE shuffle on the key, state = one struct per key —
  *    strictly better than the naive "join then keep max(right.ts)"
  *    which materializes every (left, earlier-right) pair first.
  *  - rangeJoin buckets time into window-width cells so candidates meet
  *    only inside (key, cell) — an equi-join with a 2x probe fan-out,
  *    never an inequality cross product. Catalyst cannot plan this
  *    rewrite itself; the operator encodes it.
  */
object Temporal {

  /** For each left row: the latest right row with the same key and
    * `rightTs <= leftTs` (inner semantics — unmatched left rows drop).
    * Right payload columns are packed into one struct so the matched
    * values always come from a single right row.
    *
    * `direction = "forward"` matches the EARLIEST right row with
    * `rightTs >= leftTs` instead (the other half of pandas merge_asof).
    * `toleranceUs` bounds the time gap: matches farther than the
    * tolerance are dropped (times must be epoch-µs for tolerance use).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightPayload: Seq[String],
               direction: String = "backward",
               toleranceUs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(rightPayload.nonEmpty,
      "rightPayload must name at least one column (dropFields would " +
        "otherwise empty the match struct)")
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
    // right side carries ONLY key/time/payload-struct (the matched ts
    // rides in the struct for the tolerance check), tagged 0 so a right
    // row at the same instant sorts before (backward) / after (forward)
    // the left row, keeping both bounds inclusive;
    // unionByName(allowMissingColumns) nulls __asof on left rows and the
    // left-only columns on right rows
    val r = right.select(
      col(key), col(rightTs).as("__ts"), lit(0).as("__tag"),
      struct((col(rightTs).as("__mts") +: rightPayload.map(col)): _*)
        .as("__asof"))
    val both = l.unionByName(r, allowMissingColumns = true)
    // the trailing __asof key makes ties among right rows at the same
    // (key, ts) deterministic: struct ordering is field-wise, so last()
    // always carries the same (max-payload) right row regardless of
    // partition-internal order. Left rows have __asof null (sorts first
    // under ASC, so never between a right row and its consumer).
    val base = Window.partitionBy(col(key))
    val w =
      if (direction == "backward")
        base.orderBy(col("__ts").asc, col("__tag").asc, col("__asof").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else // forward: scan from the future end; right-at-same-ts first
        base.orderBy(col("__ts").desc, col("__tag").asc, col("__asof").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap =
      if (direction == "backward") col("__ts") - col("__matched.__mts")
      else col("__matched.__mts") - col("__ts")
    both
      .withColumn("__matched", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1 && col("__matched").isNotNull)
      .filter(toleranceUs.map(t => gap <= t).getOrElse(lit(true)))
      .withColumn("__matched", col("__matched").dropFields("__mts"))
      .drop("__ts", "__tag", "__asof")
  }

  /** All (left, right) pairs with equal key and
    * `rightTs - leftTs` in (0, windowUs]. Times are epoch-µs BIGINTs.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String, windowUs: Long): DataFrame = {
    // cell = ts div width — INTEGER division: Column./ on longs is
    // double division, which mis-buckets timestamps beyond 2^53 (e.g.
    // raw epoch-ns values) and silently drops qualifying pairs. Times
    // must be non-negative (div truncates toward zero). A qualifying
    // pair is always in the same or adjacent cell, so the left probes
    // exactly two cells.
    def cell(name: String): Column = expr(s"`$name` div ${windowUs}L")
    val l = left.withColumn("__cell",
      explode(array(cell(leftTs), cell(leftTs) + 1)))
    val r = right.withColumn("__cell", cell(rightTs))
    l.join(r, Seq(key, "__cell"))
      .filter(col(rightTs) > col(leftTs)
        && col(rightTs) - col(leftTs) <= windowUs)
      .drop("__cell")
  }
}
