package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Catalog.Q
import graft.engine.Tables

/** Window functions, ranking, multi-level aggregation
  * (rollup/cube/grouping sets), and calendar/time-series analytics
  * of the relational suite. Mechanical split of the former
  * 3,806-line `RelationalQueries.scala` along its family seams
  * (round-16; the r14 EventQueries precedent): every member kept its
  * name and body, mixed back into [[RelationalQueries]], whose
  * Scaladoc carries the suite-wide 100 TB design notes.
  */
private[queries] trait RelationalWindowQueries {
  /** ROLLUP with grouping_id — subtotal rows keyed by gid. */
  val q11Rollup: Q = Q(
    "q11_rollup",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_quantity").cast("decimal(30,10)")), 2)
            .cast("double").as("sum_qty"),
          grouping_id().as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("lstatus"),
          col("cnt"), col("sum_qty"), col("gid"))
        .orderBy("gid", "rflag", "lstatus")
    },
    Some("""SELECT coalesce(l_returnflag, '(all)') AS rflag,
            coalesce(l_linestatus, '(all)') AS lstatus,
            count(*) AS cnt,
            CAST(round(sum(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE)
              AS sum_qty,
            GROUPING(l_returnflag, l_linestatus) AS gid
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            ORDER BY gid, rflag, lstatus"""))

  /** Ranked window: top-3 customers by balance within each nation. */
  val q13WindowTopK: Q = Q(
    "q13_window_topk",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      cust.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy("c_nationkey", "rn")
    },
    Some("""SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
              SELECT c_nationkey, c_custkey, c_acctbal,
                     row_number() OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
              FROM customer)
            WHERE rn <= 3 ORDER BY c_nationkey, rn"""))

  /** Running-sum window: cumulative order value per customer over time. */
  val q14RunningSum: Q = Q(
    "q14_running_sum",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders
        .select(col("o_custkey"), col("o_orderkey"),
          // decimal accumulation: window-sum evaluation order differs
          // across engines (DuckDB uses segment trees), so a double
          // running sum is not bit-stable — an exact decimal sum is.
          round(sum(col("o_totalprice").cast("decimal(30,10)")).over(w), 2)
            .cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
            CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,10))) OVER (
              PARTITION BY o_custkey
              ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
              AS running_total
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** Global top-n (TakeOrderedAndProject — no full sort at scale). */
  val q17GlobalTopN: Q = Q(
    "q17_global_topn",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      orders
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          unix_micros(col("o_orderdate").cast("timestamp_ltz")).as("order_ts_us"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
            epoch_us(o_orderdate) AS order_ts_us
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""))

  /** CUBE over two dimensions (all four grouping sets), keyed by
    * grouping_id — same shuffle shape as rollup (q11), one pass with the
    * expanded grouping-set projection.
    */
  val q46Cube: Q = Q(
    "q46_cube",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(30,10)")), 2)
            .cast("double").as("sum_price"),
          grouping_id().as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("cnt"), col("sum_price"), col("gid"))
        .orderBy("gid", "status", "priority")
    },
    Some("""SELECT coalesce(o_orderstatus, '(all)') AS status,
            coalesce(o_orderpriority, '(all)') AS priority,
            count(*) AS cnt,
            CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,10))), 2) AS DOUBLE)
              AS sum_price,
            GROUPING(o_orderstatus, o_orderpriority) AS gid
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
            ORDER BY gid, status, priority"""))

  /** lead/lag deltas + ntile quartiles inside one keyed window: per
    * customer order history, the gap to the next order and the spend
    * quartile. One shuffle on the partition key; state bounded per
    * customer.
    */
  val q47LeadNtile: Q = Q(
    "q47_lead_ntile",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("ts_us").asc, col("o_orderkey").asc)
      val wPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      o.select(col("o_custkey"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp_ltz")).as("ts_us"),
          col("o_totalprice"))
        .withColumn("next_gap_us",
          lead(col("ts_us"), 1).over(w) - col("ts_us"))
        .withColumn("spend_quartile", ntile(4).over(wPrice))
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"), col("ts_us"),
          col("next_gap_us"), col("spend_quartile"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, ts_us,
              lead(ts_us, 1) OVER (PARTITION BY o_custkey
                ORDER BY ts_us, o_orderkey) - ts_us AS next_gap_us,
              ntile(4) OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice, o_orderkey) AS spend_quartile
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                    epoch_us(o_orderdate) AS ts_us FROM orders)
            WHERE o_custkey <= 100
            ORDER BY o_custkey, o_orderkey"""))

  /** Grouped top-k via the custom typed [[graft.functions.TopByValue]]
    * Aggregator instead of a window sort: partial aggregation reduces
    * every map task's slice to at most k pairs per group BEFORE the
    * exchange — the shuffle carries k rows per (group, partition), not
    * the group (see the Aggregator's scaladoc for the comparison with
    * WindowGroupLimit). Same results as q13's window form, checked by
    * the same window-style oracle.
    */
  val q53TopkAgg: Q = Q(
    "q53_topk_agg",
    (s, dir) => {
      import s.implicits._
      val cust = Tables.load(s, dir, "customer")
      val ds = cust.select(col("c_nationkey").cast("int"),
          col("c_acctbal").cast("double"), col("c_custkey").cast("long"))
        .as[(Int, Double, Long)]
      val agg = new graft.functions.TopByValue.OfTriple(3)
      ds.groupByKey(_._1)
        .agg(agg.toColumn.name("topk"))
        .flatMap { case (nk, list) =>
          list.zipWithIndex.map { case ((bal, ck), i) => (nk, i + 1, ck, bal) }
        }
        .toDF("c_nationkey", "rank", "c_custkey", "c_acctbal")
        .orderBy("c_nationkey", "rank")
    },
    Some("""SELECT c_nationkey, rank, c_custkey, c_acctbal FROM (
              SELECT c_nationkey, c_custkey, c_acctbal,
                row_number() OVER (PARTITION BY c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
              FROM customer)
            WHERE rank <= 3 ORDER BY c_nationkey, rank"""))

  /** GROUPING SETS with NON-hierarchical sets — the grouping-set form
    * rollup (q11) and cube (q46) cannot express: exactly the two
    * single-dimension marginals, no (a,b) cell and no grand total. The
    * native `groupingSets` API compiles to the same single-pass Expand
    * as rollup/cube (each input row fans out once per set), so two
    * independent GROUP BYs cost one scan and one shuffle.
    */
  val q118GroupingSets: Q = Q(
    "q118_grouping_sets",
    (s, dir) => {
      Tables.load(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast("decimal(30,10)")), 2)
            .cast("double").as("sum_price"),
          grouping_id().as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
          col("cnt"), col("sum_price"), col("gid"))
        .orderBy("gid", "status", "priority")
    },
    Some("""SELECT coalesce(o_orderstatus, '(all)') AS status,
            coalesce(o_orderpriority, '(all)') AS priority,
            count(*) AS cnt,
            CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,10))), 2) AS DOUBLE)
              AS sum_price,
            GROUPING(o_orderstatus, o_orderpriority) AS gid
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
            ORDER BY gid, status, priority"""))

  /** Period-over-period reporting: weekly revenue with week-over-week
    * delta and growth ratio. The lag window runs over the AGGREGATED
    * ~|weeks|-row series (wrapped in a single-partition window by
    * necessity — the frame is dim-sized, which is exactly when that is
    * acceptable); the only fact-sized work is the grouped decimal sum.
    * Week index is integer division of epoch-µs (the q116 NTZ→LTZ cast
    * idiom; session TZ is UTC so the cast is lossless); `wow_diff` /
    * `wow_ratio` are raw IEEE ops on the already-rounded doubles
    * (determinism contract: no round() on doubles).
    */
  val q129WowGrowth: Q = Q(
    "q129_wow_growth",
    (s, dir) => {
      val weekly = Tables.load(s, dir, "orders")
        .select(unix_micros(col("o_orderdate").cast("timestamp_ltz"))
          .as("us"), col("o_totalprice"))
        .groupBy(expr("us div 604800000000").as("week_idx"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast("decimal(30,10)")), 2)
            .cast("double").as("revenue"))
      val series = Window.orderBy("week_idx")
      weekly
        .withColumn("prev", lag(col("revenue"), 1).over(series))
        .select(col("week_idx"), col("n_orders"), col("revenue"),
          (col("revenue") - col("prev")).as("wow_diff"),
          (col("revenue") / col("prev")).as("wow_ratio"))
        .orderBy("week_idx")
    },
    Some("""WITH w AS (SELECT epoch_us(o_orderdate) // 604800000000
                         AS week_idx,
                       count(*) AS n_orders,
                       CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,10))),
                         2) AS DOUBLE) AS revenue
                       FROM orders GROUP BY 1)
            SELECT week_idx, n_orders, revenue,
              revenue - lag(revenue) OVER (ORDER BY week_idx) AS wow_diff,
              revenue / lag(revenue) OVER (ORDER BY week_idx) AS wow_ratio
            FROM w ORDER BY week_idx"""))

  /** The remaining ranking-window family in one pass: `rank`,
    * `dense_rank`, `percent_rank`, `cume_dist` per status over order
    * value (q13/q47 cover row_number, lag/lead, ntile). All four are
    * tie-aware and thus deterministic for a given PARTITION CONTENT
    * regardless of physical row order; the row_number cut for the top-5
    * emission carries the usual orderkey tie-break. percent_rank and
    * cume_dist are single divisions of exact small ints — identical
    * IEEE results on both engines.
    */
  val q133RankFamily: Q = Q(
    "q133_rank_family",
    (s, dir) => {
      val byStatus = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc)
      val cut = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          col("o_totalprice"))
        .withColumn("rnk", rank().over(byStatus))
        .withColumn("drnk", dense_rank().over(byStatus))
        .withColumn("prnk", percent_rank().over(byStatus))
        .withColumn("cdist", cume_dist().over(byStatus))
        .withColumn("rn", row_number().over(cut))
        .filter(col("rn") <= 5)
        .select(col("o_orderstatus"), col("o_orderkey"),
          col("o_totalprice"), col("rnk").cast("long").as("rnk"),
          col("drnk").cast("long").as("drnk"), col("prnk"), col("cdist"))
        .orderBy("o_orderstatus", "o_orderkey")
    },
    Some("""SELECT o_orderstatus, o_orderkey, o_totalprice,
              CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk,
              prnk, cdist
            FROM (SELECT o_orderstatus, o_orderkey, o_totalprice,
                    rank() OVER w AS rnk,
                    dense_rank() OVER w AS drnk,
                    percent_rank() OVER w AS prnk,
                    cume_dist() OVER w AS cdist,
                    row_number() OVER (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
                  FROM orders
                  WINDOW w AS (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice DESC))
            WHERE rn <= 5 ORDER BY o_orderstatus, o_orderkey"""))

  /** Cohort LTV triangle — the standard subscription/commerce lifetime-
    * value accounting: customers are cohorted by their FIRST order
    * month, and each cohort's revenue is tracked by age (months since
    * acquisition), cumulatively — reading down a column compares
    * cohorts at equal age; reading across a row shows one cohort
    * maturing. q80's cohort retention counts ACTIVITY; this one
    * accumulates MONEY, which is what the acquisition-payback decision
    * actually consumes. Ages capped at 11 (first-year LTV triangle).
    *
    * Determinism: months are exact integers (y*12+m); revenue sums
    * accumulate in decimal(30,10) and round IN DECIMAL to cents; the
    * cumulative sum then adds already-rounded decimals (exact), so the
    * final double cast is bit-stable on both engines.
    *
    * ## 100 TB notes
    * One shuffle on o_custkey computes first-order months (map-side
    * combined min); attaching the cohort back to orders is a self-join
    * on the same key (rides the same exchange under AQE); the triangle
    * rollup is a tiny grouped agg, and the running sum windows over
    * the ~cohorts x 12 result — driver-scale, not data-scale.
    */
  val q209CohortLtv: Q = Q(
    "q209_cohort_ltv",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("ym"),
          col("o_totalprice"))
      val cohort = orders.groupBy(col("o_custkey"))
        .agg(min(col("ym")).as("cohort_ym"))
      val cells = orders.join(cohort, Seq("o_custkey"))
        .withColumn("age", col("ym") - col("cohort_ym"))
        .filter(col("age") <= 11)
        .groupBy(col("cohort_ym"), col("age"))
        .agg(countDistinct(col("o_custkey")).as("n_active"),
          round(sum(col("o_totalprice").cast("decimal(30,10)")), 2)
            .as("rev_dec"))
      val w = Window.partitionBy(col("cohort_ym")).orderBy(col("age"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells
        .withColumn("cum_dec", sum(col("rev_dec")).over(w))
        .select(col("cohort_ym"), col("age"), col("n_active"),
          col("rev_dec").cast("double").as("revenue"),
          col("cum_dec").cast("double").as("cum_revenue"))
        .orderBy(col("cohort_ym"), col("age"))
    },
    Some("""WITH o AS (SELECT o_custkey,
                CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                     AS BIGINT) AS ym,
                o_totalprice FROM orders),
            c AS (SELECT o_custkey, min(ym) AS cohort_ym
                  FROM o GROUP BY o_custkey),
            cells AS (SELECT cohort_ym, o.ym - cohort_ym AS age,
                count(DISTINCT o.o_custkey) AS n_active,
                round(sum(CAST(o_totalprice AS DECIMAL(30,10))), 2)
                  AS rev_dec
              FROM o JOIN c ON o.o_custkey = c.o_custkey
              WHERE o.ym - cohort_ym <= 11
              GROUP BY 1, 2)
            SELECT cohort_ym, age, n_active,
              CAST(rev_dec AS DOUBLE) AS revenue,
              CAST(sum(rev_dec) OVER (PARTITION BY cohort_ym ORDER BY age
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue
            FROM cells ORDER BY cohort_ym, age"""))

  /** Day-of-week seasonal index — the multiplicative seasonality table
    * demand forecasting divides by before modeling trend: for each
    * weekday, average revenue per CALENDAR DAY of that weekday relative
    * to the all-days average. Normalizing by distinct active dates (not
    * by row counts) is the part naive GROUP BY dow gets wrong: a
    * weekday that appears 53 times in the window vs 52 would otherwise
    * look ~2 % "hotter" from calendar arithmetic alone. Weekday
    * numbering is pinned to Sunday=0 on both engines (Spark's
    * dayofweek is Sunday=1, shifted by -1; DuckDB's is Sunday=0
    * natively). Revenue accumulates in decimal and rounds to cents IN
    * DECIMAL; the index is a fixed double op tree (two divisions) over
    * window totals of those exact decimals.
    *
    * ## 100 TB notes
    * One map-side-combined aggregate on a 7-value key; the distinct-
    * date count per dow is a two-level agg that reuses the same
    * exchange; the global totals are windows over the 7-row result.
    * Scan-bound, shuffle-trivial.
    */
  val q211SeasonalDow: Q = Q(
    "q211_seasonal_dow",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select((dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          to_date(col("o_orderdate")).as("d"), col("o_totalprice"))
      val perDow = o.groupBy(col("dow"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("d")).as("n_days"),
          round(sum(col("o_totalprice").cast("decimal(30,10)")), 2)
            .as("rev_dec"))
      val wAll = Window.partitionBy(lit(1))
      perDow
        .withColumn("tot_rev", sum(col("rev_dec")).over(wAll))
        .withColumn("tot_days", sum(col("n_days")).over(wAll))
        .select(col("dow"), col("n_orders"), col("n_days"),
          col("rev_dec").cast("double").as("revenue"),
          ((col("rev_dec").cast("double") / col("n_days").cast("double")) /
            (col("tot_rev").cast("double") / col("tot_days").cast("double")))
            .as("seasonal_index"))
        .orderBy(col("dow"))
    },
    Some("""WITH o AS (SELECT CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
                CAST(o_orderdate AS DATE) AS d, o_totalprice FROM orders),
            pd AS (SELECT dow, count(*) AS n_orders,
                count(DISTINCT d) AS n_days,
                round(sum(CAST(o_totalprice AS DECIMAL(30,10))), 2)
                  AS rev_dec
              FROM o GROUP BY dow)
            SELECT dow, n_orders, n_days,
              CAST(rev_dec AS DOUBLE) AS revenue,
              (CAST(rev_dec AS DOUBLE) / CAST(n_days AS DOUBLE))
                / (CAST(sum(rev_dec) OVER () AS DOUBLE)
                   / CAST(sum(n_days) OVER () AS DOUBLE)) AS seasonal_index
            FROM pd ORDER BY dow"""))

  /** Repeat-purchase interval histogram — the inter-order gap
    * distribution that drives replenishment-reminder timing and churn
    * cutoffs ("a customer 3x past their modal gap is churning"). Per
    * customer, consecutive orders (ordered by date then key — a total
    * order, so same-day orders cannot flip) yield gaps in whole days
    * (exact integer day arithmetic on the epoch), bucketed into weeks;
    * the histogram also carries each bucket's distinct-customer reach.
    *
    * ## 100 TB notes
    * One shuffle on o_custkey feeds the lag window; the week rollup is
    * map-side combined on a small key domain. No joins at all.
    */
  val q212PurchaseGaps: Q = Q(
    "q212_purchase_gaps",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          (unix_micros(col("o_orderdate").cast("timestamp_ltz"))
            / lit(86400000000L)).cast("long").as("day"),
          col("o_orderkey"))
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day").asc, col("o_orderkey").asc)
      o.withColumn("prev_day", lag(col("day"), 1).over(byCust))
        .filter(col("prev_day").isNotNull)
        .select(col("o_custkey"),
          ((col("day") - col("prev_day")) / 7).cast("long").as("gap_weeks"))
        .groupBy(col("gap_weeks"))
        .agg(count(lit(1)).as("n_gaps"),
          countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy(col("gap_weeks"))
    },
    Some("""WITH o AS (SELECT o_custkey,
                epoch_us(o_orderdate) // 86400000000 AS day, o_orderkey
              FROM orders),
            g AS (SELECT o_custkey,
                (day - lag(day) OVER (PARTITION BY o_custkey
                  ORDER BY day, o_orderkey)) // 7 AS gap_weeks
              FROM o)
            SELECT gap_weeks, count(*) AS n_gaps,
              count(DISTINCT o_custkey) AS n_customers
            FROM g WHERE gap_weeks IS NOT NULL
            GROUP BY gap_weeks ORDER BY gap_weeks"""))

  /** Popularity-baseline recommender eval — the hit-rate@10 floor every
    * recommender must beat before it ships: hold out each repeat
    * customer's LAST order (leave-last-out, by date then key — a total
    * order, so the holdout is deterministic), rank parts by distinct
    * trainers buying them, and score a "hit" when the held-out basket
    * contains any global top-10 part. One row: eligible users, hits,
    * hit rate (one division of exact counts) — the number that turns
    * "our model gets 0.31" into "versus 0.24 for just recommending
    * bestsellers".
    *
    * ## 100 TB notes
    * The holdout election is one window over the o_custkey shuffle;
    * train/test basket expansion joins lineitem on orderkey (bucketable
    * at scale); the top-10 is a TakeOrderedAndProject over the part
    * aggregate and broadcasts into the test-basket semi-join. Nothing
    * retains per-user state beyond the one window pass.
    */
  val q222PopBaseline: Q = Q(
    "q222_pop_baseline",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val marked = orders
        .withColumn("rn", row_number().over(w))
        .withColumn("n_orders", count(lit(1)).over(
          Window.partitionBy(col("o_custkey"))))
      val test = marked.filter(col("rn") === 1 && col("n_orders") >= 2)
        .select(col("o_orderkey"), col("o_custkey"))
      val train = marked.filter(col("rn") =!= 1 || col("n_orders") < 2)
        .select(col("o_orderkey"), col("o_custkey"))
      val top10 = li.join(train, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey"))
        .agg(countDistinct(col("o_custkey")).as("n_buyers"))
        .orderBy(col("n_buyers").desc, col("l_partkey").asc)
        .limit(10)
        .select(col("l_partkey"))
      val testBaskets = li.join(test, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_partkey"))
      val hits = testBaskets
        .join(broadcast(top10), Seq("l_partkey"), "left_semi")
        .select(col("o_custkey")).distinct()
      val nUsers = test.select(col("o_custkey")).distinct()
        .agg(count(lit(1)).as("n_users"))
      val nHits = hits.agg(count(lit(1)).as("n_hits"))
      nUsers.crossJoin(broadcast(nHits))
        .select(col("n_users"), col("n_hits"),
          (col("n_hits").cast("double") / col("n_users").cast("double"))
            .as("hit_rate"))
    },
    Some("""WITH m AS (SELECT o_orderkey, o_custkey,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn,
                count(*) OVER (PARTITION BY o_custkey) AS n_orders
              FROM orders),
            test AS (SELECT o_orderkey, o_custkey FROM m
                     WHERE rn = 1 AND n_orders >= 2),
            train AS (SELECT o_orderkey, o_custkey FROM m
                      WHERE rn != 1 OR n_orders < 2),
            top10 AS (SELECT l_partkey FROM (
                SELECT l_partkey, count(DISTINCT o_custkey) AS n_buyers
                FROM lineitem JOIN train ON l_orderkey = o_orderkey
                GROUP BY l_partkey)
              ORDER BY n_buyers DESC, l_partkey ASC LIMIT 10),
            tb AS (SELECT DISTINCT t.o_custkey
                   FROM lineitem l JOIN test t ON l.l_orderkey = t.o_orderkey
                   WHERE l.l_partkey IN (SELECT l_partkey FROM top10)),
            nu AS (SELECT count(DISTINCT o_custkey) AS n_users FROM test),
            nh AS (SELECT count(*) AS n_hits FROM tb)
            SELECT n_users, n_hits,
              CAST(n_hits AS DOUBLE) / CAST(n_users AS DOUBLE) AS hit_rate
            FROM nu, nh"""))

  /** Seasonal decomposition, integer-exact — the trend-adjusted weekday
    * effect: a centered 7-day moving window is the classic decomposition
    * trend (it absorbs level and slope, which q211's raw per-day
    * averages cannot — a revenue RAMP leaks into naive per-dow means),
    * and the residual seasonal deviation falls out WITHOUT a single
    * float: scaling by 7 turns `daily - trend` into
    * `7*daily - window_sum` (both exact BIGINTs), and only the final
    * per-weekday mean divides. Windows touching missing days are
    * excluded (the count-=7 guard), not silently averaged short.
    * Weekday comes from pure integer epoch-day arithmetic
    * ((day+4) mod 7, Sunday=0 — epoch day 0 is a Thursday), so no
    * date-function semantics can diverge between engines.
    *
    * ## 100 TB notes
    * The daily rollup is the only data-scale work (map-side combined
    * on date); the RANGE window and dow rollup run over the ~|days|
    * aggregate — driver-scale. The RANGE frame is on the integer day
    * index, so absent days genuinely shrink the frame (and trip the
    * completeness guard) instead of sliding over 7 present rows.
    */
  val q229SeasonalDecomp: Q = Q(
    "q229_seasonal_decomp",
    (s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .groupBy((unix_micros(col("o_orderdate").cast("timestamp_ltz"))
          / lit(86400000000L)).cast("long").as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val w = Window.orderBy(col("day")).rangeBetween(-3, 3)
      val dev = daily
        .withColumn("win_sum", sum(col("cents")).over(w))
        .withColumn("win_n", count(lit(1)).over(w))
        .filter(col("win_n") === 7)
        .select(pmod(col("day") + 4, lit(7)).as("dow"),
          (col("cents") * 7 - col("win_sum")).as("dev7"))
      dev.groupBy(col("dow"))
        .agg(count(lit(1)).as("n_windows"), sum(col("dev7")).as("sum_dev7"))
        .select(col("dow"), col("n_windows"), col("sum_dev7"),
          (col("sum_dev7").cast("double") / col("n_windows").cast("double"))
            .as("mean_dev7_cents"))
        .orderBy(col("dow"))
    },
    Some("""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
                  AS day,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            d AS (SELECT (day + 4) % 7 AS dow, cents * 7 - win_sum AS dev7
                  FROM (SELECT day, cents,
                          CAST(sum(cents) OVER w AS BIGINT) AS win_sum,
                          count(*) OVER w AS win_n
                        FROM daily
                        WINDOW w AS (ORDER BY day
                          RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING))
                  WHERE win_n = 7)
            SELECT dow, count(*) AS n_windows,
              CAST(sum(dev7) AS BIGINT) AS sum_dev7,
              CAST(sum(dev7) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                AS mean_dev7_cents
            FROM d GROUP BY dow ORDER BY dow"""))

  /** Seasonal-naive forecast backtest — before anyone ships a revenue
    * forecast, the baseline it must beat: predict each day's revenue
    * as the SAME WEEKDAY one week earlier (the seasonal-naive model,
    * M-competition's standard yardstick), walk it over the whole
    * history, and report per weekday the MAE in exact cents and the
    * MAPE (per-day ratios decimal-summed per the Catalog contract).
    * Only days whose lag-7 neighbor EXISTS score (a LAG over the
    * day-indexed series would silently compare across gaps; the
    * self-join on day-7 cannot). The per-dow split shows where the
    * weekly pattern carries information and where it's noise.
    *
    * ## 100 TB notes
    * The daily rollup is the only data-scale pass; the lag-7 self-join
    * and rollup run over the |days| aggregate — driver-scale. Weekday
    * from pure epoch-day arithmetic, as in q229.
    */
  val q245ForecastBacktest: Q = Q(
    "q245_forecast_backtest",
    (s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .groupBy((unix_micros(col("o_orderdate").cast("timestamp_ltz"))
          / lit(86400000000L)).cast("long").as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val lagged = daily.select((col("day") + 7).as("day"),
        col("cents").as("forecast"))
      val scored = daily.join(lagged, Seq("day"))
        .select(pmod(col("day") + 4, lit(7)).as("dow"),
          col("cents"), col("forecast"),
          abs(col("cents") - col("forecast")).as("abs_err"))
      scored.groupBy(col("dow"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("abs_err")).as("sum_abs_err"),
          (round(sum((col("abs_err").cast("double") /
            col("cents").cast("double")).cast("decimal(30,10)")), 6)
            .cast("double") / count(lit(1))).as("mape"))
        .select(col("dow"), col("n_days"), col("sum_abs_err"),
          (col("sum_abs_err").cast("double") / col("n_days").cast("double"))
            .as("mae_cents"), col("mape"))
        .orderBy(col("dow"))
    },
    Some("""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
                  AS day,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            sc AS (SELECT (a.day + 4) % 7 AS dow, a.cents,
                f.cents AS forecast, abs(a.cents - f.cents) AS abs_err
              FROM daily a JOIN daily f ON f.day = a.day - 7)
            SELECT dow, count(*) AS n_days,
              CAST(sum(abs_err) AS BIGINT) AS sum_abs_err,
              CAST(sum(abs_err) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                AS mae_cents,
              CAST(round(sum(CAST(CAST(abs_err AS DOUBLE)
                  / CAST(cents AS DOUBLE) AS DECIMAL(30,10))), 6)
                AS DOUBLE) / count(*) AS mape
            FROM sc GROUP BY dow ORDER BY dow"""))

  /** Revenue bridge — the finance waterfall from list revenue to net:
    * gross extended price, minus the discount given, plus the tax
    * collected, equals net invoiced — four component rows with exact
    * decimal cents and each component's share of gross (one double
    * division). The bridge's internal consistency (gross - discount +
    * tax = net TO THE CENT) is itself part of the check: each
    * component is rounded IN DECIMAL from its own exact accumulation,
    * and the net row is computed from the same per-row product the
    * invoice reconciliation (q227) uses, so the bridge and the
    * reconciliation can never quietly diverge.
    *
    * ## 100 TB notes
    * One scan, one 1-row aggregate with four decimal accumulators —
    * map-side combined, nothing else.
    */
  val q250RevenueBridge: Q = Q(
    "q250_revenue_bridge",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      def cents(c: Column) =
        (round(sum(c.cast("decimal(30,10)")), 2) * 100).cast("long")
      val m = li.agg(
        cents(col("l_extendedprice")).as("gross"),
        cents(col("l_extendedprice") * col("l_discount")).as("discount"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          col("l_tax")).as("tax"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("net"))
      val rows = Seq(
        ("a_gross", col("gross")), ("b_discount", col("discount")),
        ("c_tax", col("tax")), ("d_net", col("net")))
      rows.map { case (name, c) =>
        m.select(lit(name).as("component"), c.as("cents"),
          (c.cast("double") / col("gross").cast("double"))
            .as("share_of_gross"))
      }.reduce(_ unionByName _).orderBy(col("component"))
    },
    Some("""WITH m AS (SELECT
                CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,10))), 2)
                  * 100 AS BIGINT) AS gross,
                CAST(round(sum(CAST(l_extendedprice * l_discount
                  AS DECIMAL(30,10))), 2) * 100 AS BIGINT) AS discount,
                CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                  * l_tax AS DECIMAL(30,10))), 2) * 100 AS BIGINT) AS tax,
                CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                  * (1.0 + l_tax) AS DECIMAL(30,10))), 2) * 100 AS BIGINT)
                  AS net
              FROM lineitem)
            SELECT component, cents,
              CAST(cents AS DOUBLE) / CAST(gross AS DOUBLE)
                AS share_of_gross
            FROM (SELECT 'a_gross' AS component, gross AS cents, gross
                    FROM m
                  UNION ALL SELECT 'b_discount', discount, gross FROM m
                  UNION ALL SELECT 'c_tax', tax, gross FROM m
                  UNION ALL SELECT 'd_net', net, gross FROM m)
            ORDER BY component"""))

  /** Cumulative-deviation drawdown — the deepest sustained
    * under-performance stretch: scale daily revenue deviation from the
    * overall mean by n (s_d = n*cents_d - S, exact — no division), walk
    * its cumulative sum, and report the maximum peak-to-trough drop
    * and its trough day (earliest on ties — total-order election). Plain cumulative revenue never decreases, so drawdown
    * needs the deviation series; the result reads as "from its best
    * relative position, the business fell this many n-scaled cents
    * behind the average run-rate by trough_day". All
    * exact BIGINTs.
    *
    * ## 100 TB notes
    * The daily rollup is the only data-scale pass; cumulative sum,
    * running max, and the argmax election run over the |days|
    * aggregate. Same prefix-sum decomposition note as q251 at cluster
    * scale.
    */
  val q253DeviationDrawdown: Q = Q(
    "q253_deviation_drawdown",
    (s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .groupBy((unix_micros(col("o_orderdate").cast("timestamp_ltz"))
          / lit(86400000000L)).cast("long").as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val wAll = Window.partitionBy(lit(1))
      val ord = Window.orderBy(col("day").asc)
      val dev = daily
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("s", sum(col("cents")).over(wAll))
        .withColumn("c", sum(D38(col("cents")) * D38(col("n")) -
          D38(col("s"))).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val withPeak = dev
        .withColumn("peak", max(col("c")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("dd", col("peak") - col("c"))
      withPeak
        .withColumn("rn", row_number().over(
          Window.orderBy(col("dd").desc, col("day").asc)))
        .filter(col("rn") === 1)
        .select(col("n").as("n_days"),
          col("dd").cast("decimal(38,0)").cast("double")
            .as("max_drawdown_ncents"),
          col("day").as("trough_day"))
    },
    Some("""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
                  AS day,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            g AS (SELECT day, cents,
                count(*) OVER () AS n,
                CAST(sum(cents) OVER () AS BIGINT) AS s
              FROM daily),
            c AS (SELECT day, n,
                sum(CAST(cents AS HUGEINT) * n - s) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
              FROM g),
            p AS (SELECT day, n, c,
                max(c) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
              FROM c),
            d AS (SELECT day, n, peak - c AS dd,
                row_number() OVER (ORDER BY peak - c DESC, day ASC) AS rn
              FROM p)
            SELECT CAST(n AS BIGINT) AS n_days,
              CAST(dd AS DOUBLE) AS max_drawdown_ncents,
              day AS trough_day
            FROM d WHERE rn = 1"""))

  /** decimal(38,0) cast shared by the drawdown walk. */
  private def D38(c: Column): Column = c.cast("decimal(38,0)")

  /** New-vs-returning revenue mix by month — the growth-quality lens on
    * the revenue curve: per order month, how much revenue came from
    * customers in their FIRST month versus established ones, with
    * exact-decimal cents and the new-revenue share (one division)?
    * q154 tracks USER states and q209 follows cohorts forward; this is
    * the composition read across the calendar — flat revenue with a
    * shrinking new-share is a retention business aging, the same
    * topline with a growing new-share is a leaky funnel buying growth.
    *
    * ## 100 TB notes
    * ONE full-data shuffle: orders reduce to customer-months
    * (map-side-combined exact-decimal sums — |customers|×|months|
    * rows), the first-month flag is a window over that reduced
    * relation (per-customer partitions, bounded state), and the month
    * rollup needs plain `count`s because the reduced relation is
    * distinct-by-construction — the original join + two
    * `countDistinct`s (an Expand doubling every order row before a
    * second shuffle) measured 7.3 s at sf0.1; this shape is the same
    * values without the expand.
    */
  val q255NewVsReturning: Q = Q(
    "q255_new_vs_returning",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("ym"),
          col("o_totalprice"))
      // customer-month grain: exact partial sums, one row per
      // (customer, month) — countDistinct becomes a plain count
      val cm = orders.groupBy(col("o_custkey"), col("ym"))
        .agg(sum(col("o_totalprice").cast("decimal(30,10)")).as("amt"))
      val byCust = Window.partitionBy(col("o_custkey"))
      val flagged = cm.withColumn("is_new",
        col("ym") === min(col("ym")).over(byCust))
      def cents(c: Column) = (round(sum(c), 2) * 100).cast("long")
      val zero = lit(0).cast("decimal(30,10)")
      flagged.groupBy(col("ym"))
        .agg(count(when(col("is_new"), 1)).as("n_new_cust"),
          count(when(!col("is_new"), 1)).as("n_ret_cust"),
          cents(when(col("is_new"), col("amt")).otherwise(zero))
            .as("new_cents"),
          cents(when(!col("is_new"), col("amt")).otherwise(zero))
            .as("ret_cents"))
        .select(col("ym"), col("n_new_cust"), col("n_ret_cust"),
          col("new_cents"), col("ret_cents"),
          (col("new_cents").cast("double") /
            (col("new_cents") + col("ret_cents")).cast("double"))
            .as("new_share"))
        .orderBy(col("ym"))
    },
    Some("""WITH o AS (SELECT o_custkey,
                CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                  AS BIGINT) AS ym,
                o_totalprice FROM orders),
            f AS (SELECT o_custkey, min(ym) AS first_ym
                  FROM o GROUP BY o_custkey),
            j AS (SELECT o.ym, o.o_custkey, o_totalprice,
                    o.ym = first_ym AS is_new
                  FROM o JOIN f ON o.o_custkey = f.o_custkey)
            SELECT ym,
              count(DISTINCT CASE WHEN is_new THEN o_custkey END)
                AS n_new_cust,
              count(DISTINCT CASE WHEN NOT is_new THEN o_custkey END)
                AS n_ret_cust,
              CAST(round(sum(CAST(CASE WHEN is_new THEN o_totalprice
                ELSE 0.0 END AS DECIMAL(30,10))), 2) * 100 AS BIGINT)
                AS new_cents,
              CAST(round(sum(CAST(CASE WHEN NOT is_new THEN o_totalprice
                ELSE 0.0 END AS DECIMAL(30,10))), 2) * 100 AS BIGINT)
                AS ret_cents,
              CAST(round(sum(CAST(CASE WHEN is_new THEN o_totalprice
                ELSE 0.0 END AS DECIMAL(30,10))), 2) * 100 AS DOUBLE)
                / CAST(round(sum(CAST(CASE WHEN is_new THEN o_totalprice
                    ELSE 0.0 END AS DECIMAL(30,10))), 2) * 100
                  + round(sum(CAST(CASE WHEN NOT is_new THEN o_totalprice
                    ELSE 0.0 END AS DECIMAL(30,10))), 2) * 100 AS DOUBLE)
                AS new_share
            FROM j GROUP BY ym ORDER BY ym"""))

  /** Brand-concentration trend — q217's HHI with a time axis: per
    * order YEAR, the Herfindahl index of revenue across part brands,
    * plus the year's top brand (total-order election) and its share.
    * A rising series is consolidation (fewer brands carrying the
    * shelf), a falling one is fragmentation — the trend is the signal,
    * and a single-point HHI cannot show it. Same no-float-shares
    * discipline as q217: exact cents, decimal(38,0) squared sums, one
    * division per row.
    *
    * ## 100 TB notes
    * lineitem joins orders (orderkey, bucketable) and part (dimension,
    * AQE-broadcast); the (year, brand) rollup is map-side combined;
    * the HHI moment rollup and top-brand election run over the
    * years x brands aggregate — driver-scale.
    */
  val q256HhiTrend: Q = Q(
    "q256_hhi_trend",
    (s, dir) => {
      def D(c: Column) = c.cast("decimal(38,0)")
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("yr"))
      val part = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val cells = li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("yr"), col("p_brand"))
        .agg(sum(col("cents")).as("cents"))
      val elect = Window.partitionBy(col("yr"))
        .orderBy(col("cents").desc, col("p_brand").asc)
      val top = cells.withColumn("rn", row_number().over(elect))
        .filter(col("rn") === 1)
        .select(col("yr"), col("p_brand").as("top_brand"),
          col("cents").as("top_cents"))
      val m = cells.groupBy(col("yr"))
        .agg(count(lit(1)).as("n_brands"), sum(col("cents")).as("total"),
          sum(D(col("cents")) * D(col("cents"))).as("sumsq"))
      m.join(top, Seq("yr"))
        .select(col("yr").cast("long").as("yr"), col("n_brands"),
          col("total").as("total_cents"), col("top_brand"),
          (col("top_cents").cast("double") / col("total").cast("double"))
            .as("top_share"),
          (col("sumsq").cast("double") /
            (col("total").cast("double") * col("total").cast("double")))
            .as("hhi"))
        .orderBy(col("yr"))
    },
    Some("""WITH cells AS (SELECT year(o_orderdate) AS yr, p_brand,
                CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                            JOIN part ON l_partkey = p_partkey
              GROUP BY 1, 2),
            t AS (SELECT yr, p_brand AS top_brand, cents AS top_cents
                  FROM (SELECT *, row_number() OVER (PARTITION BY yr
                          ORDER BY cents DESC, p_brand ASC) AS rn
                        FROM cells)
                  WHERE rn = 1),
            m AS (SELECT yr, count(*) AS n_brands,
                CAST(sum(cents) AS BIGINT) AS total_cents,
                sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
                  AS sumsq
              FROM cells GROUP BY yr)
            SELECT CAST(m.yr AS BIGINT) AS yr, n_brands, total_cents,
              top_brand,
              CAST(top_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
                AS top_share,
              CAST(sumsq AS DOUBLE)
                / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE))
                AS hhi
            FROM m JOIN t ON m.yr = t.yr ORDER BY yr"""))
}
