package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Catalog.Q
import graft.engine.Tables

/** Join / aggregation / window / set-op suite (SURVEY.md §2.3-§2.5
  * extensions — the reference has no joins, windows, or set ops, but a
  * credible engine needs them; see SURVEY.md §7.4).
  *
  * Scale design notes (100 TB):
  *  - FIXED-size dimension joins (nation, region) are explicitly
  *    `broadcast()` — no shuffle of the fact side. Tables that scale
  *    with the data (customer in q07) are NOT hinted: AQE picks
  *    broadcast while they fit and shuffle-join beyond;
  *  - fact-fact joins (lineitem x orders) shuffle on the join key and are
  *    AQE-coalesced; at cluster scale these tables would be bucketed by
  *    orderkey, making the exchange disappear;
  *  - windows partition by a key (never a global window), so state is
  *    bounded per key group;
  *  - the only global sorts are over already-aggregated (small) results,
  *    or top-n (TakeOrderedAndProject — no full sort materialization).
  */
object RelationalQueries {

  /** Broadcast-hash dimension join: customer -> nation -> region. */
  val q06JoinDims: Q = Q(
    "q06_join_dims",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val nation = Tables.load(s, dir, "nation")
      val region = Tables.load(s, dir, "region")
      cust
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          // the decimal sum is cent-rounded BEFORE the double cast: a
          // low-scale decimal -> double is bit-identical across engines
          // (high-scale is not — DuckDB converts int128 then divides by
          // 10^scale, two roundings), and the single IEEE division after
          // it is too. No double round() anywhere (tie hazard).
          (round(sum(col("c_acctbal").cast("decimal(30,10)")), 2)
            .cast("double") / count(lit(1))).as("avg_bal"))
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name, count(*) AS n_cust,
            CAST(round(sum(CAST(c_acctbal AS DECIMAL(30,10))), 2) AS DOUBLE)
              / count(*) AS avg_bal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** Star join: fact-fact shuffle join (lineitem x orders) + broadcast
    * dims; revenue per nation.
    */
  val q07StarRevenue: Q = Q(
    "q07_star_revenue",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val orders = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val nation = Tables.load(s, dir, "nation")
      // nation is a FIXED-size dim: broadcast is always right. customer
      // SCALES with the fact data (~15 GB at TPC-H sf100), so it is NOT
      // hinted — AQE broadcasts it while it fits and falls back to a
      // shuffle join beyond that; at cluster scale both fact tables would
      // be bucketed on the join keys (r1 VERDICT design debt, resolved).
      li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          // per-row product in double (bit-identical both engines), then an
          // EXACT decimal sum — order-independent, so Spark's partial-agg
          // combine order can't flip a rounding boundary vs the oracle.
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(30,10)")), 2).cast("double").as("revenue"),
          count_distinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    },
    Some("""SELECT n_name,
            CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
              AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue,
            count(DISTINCT o_orderkey) AS n_orders, count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  /** Left-semi join (EXISTS): customers having at least one 'F' order. */
  val q08SemiJoin: Q = Q(
    "q08_semi_join",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val orders = Tables.load(s, dir, "orders")
      val fOrders = orders.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey"))
      cust.join(fOrders, Seq("c_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_cust FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Left-anti join (NOT EXISTS): customers with no orders at all. */
  val q09AntiJoin: Q = Q(
    "q09_anti_join",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val orders = Tables.load(s, dir, "orders")
      val withOrders = orders.select(col("o_custkey").as("c_custkey"))
      cust.join(withOrders, Seq("c_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("c_nationkey")
    },
    Some("""SELECT c_nationkey, count(*) AS n_cust FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Multi-aggregate stats incl. exact distinct count per group. */
  val q10AggStats: Q = Q(
    "q10_agg_stats",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("cnt"),
          // exact decimal sums (partial-agg order can't change them),
          // ROUNDED IN DECIMAL (exact half-away, identical across engines)
          // before the double cast; averages are emitted as one unrounded
          // IEEE division — double round() is never applied (tie hazard).
          round(sum(col("l_quantity").cast("decimal(30,10)")), 2)
            .cast("double").as("sum_qty"),
          (round(sum(col("l_extendedprice").cast("decimal(30,10)")), 2)
            .cast("double") / count(lit(1))).as("avg_price"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          count_distinct(col("l_suppkey")).as("n_supp"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS cnt,
            CAST(round(sum(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE)
              AS sum_qty,
            CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,10))), 2) AS DOUBLE)
              / count(*) AS avg_price,
            min(l_extendedprice) AS min_price,
            max(l_extendedprice) AS max_price,
            count(DISTINCT l_suppkey) AS n_supp
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

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

  /** Exact multi-column distinct counts (single + tuple). */
  val q12DistinctExact: Q = Q(
    "q12_distinct_exact",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.agg(
        count_distinct(col("l_partkey")).as("d_part"),
        count_distinct(col("l_suppkey")).as("d_supp"),
        count_distinct(col("l_partkey"), col("l_suppkey")).as("d_part_supp"))
    },
    // NB: Spark count_distinct(a, b) drops rows where ANY column is NULL;
    // DuckDB count(DISTINCT (a, b)) would count NULL-bearing tuples — the
    // WHERE-guarded subquery pins the Spark semantics explicitly instead
    // of relying on the fixture keys being non-null.
    Some("""SELECT count(DISTINCT l_partkey) AS d_part,
            count(DISTINCT l_suppkey) AS d_supp,
            (SELECT count(DISTINCT (l_partkey, l_suppkey)) FROM lineitem
             WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL)
              AS d_part_supp
            FROM lineitem"""))

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

  /** Pivot (wide aggregation): order counts per priority × status.
    * The pivot values are passed explicitly — with an inferred value list
    * Spark must run an extra distinct job over 100 TB just to name the
    * output columns; a declared list keeps it a single pass.
    */
  val q15Pivot: Q = Q(
    "q15_pivot",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      orders.groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L) // absent combos: NULL under pivot, 0 under FILTER
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
            count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
            count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
            count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Set operations: INTERSECT and EXCEPT over customer key sets. */
  val q16SetOps: Q = Q(
    "q16_setops",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      val orders = Tables.load(s, dir, "orders")
      val fCust = orders.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      val oCust = orders.filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("k"))
      val allCust = cust.select(col("c_custkey").as("k"))
      val anyCust = orders.select(col("o_custkey").as("k"))
      val both = fCust.intersect(oCust).select(lit("both_f_and_o").as("op"), col("k"))
      val none = allCust.except(anyCust).select(lit("no_orders").as("op"), col("k"))
      both.unionByName(none).orderBy("op", "k")
    },
    Some("""SELECT * FROM (
              SELECT 'both_f_and_o' AS op, k FROM (
                SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
                INTERSECT
                SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
              UNION ALL
              SELECT 'no_orders' AS op, k FROM (
                SELECT c_custkey AS k FROM customer
                EXCEPT
                SELECT o_custkey FROM orders))
            ORDER BY op, k"""))

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

  /** Exact grouped quantiles, DISCRETE variant: the value at rank
    * ceil(p*n) within each group. Discrete (an actual element, no
    * interpolation arithmetic) is chosen deliberately: the picked double
    * is bit-identical across engines, whereas continuous-quantile
    * interpolation formulas can differ in op order.
    *
    * Computed as a two-phase distributed selection, NOT a per-group
    * row_number sort: with only a handful of group keys, a window sorted
    * by raw rows would funnel ~n/3 rows into each of 3 partitions — a
    * 33 TB in-partition sort at the target scale. Instead: (1) histogram
    * shuffle on (group, value) — well-distributed however few groups;
    * (2) cumulative counts over the DISTINCT-value table, whose size is
    * bounded by the value domain, not the row count; the rank-r value is
    * the first distinct value whose cumulative count reaches r. Same
    * result, plan survives any group skew.
    */
  val q40QuantilesDisc: Q = Q(
    "q40_quantiles_disc",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val hist = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("c"))
      val byFlag = Window.partitionBy(col("l_returnflag"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(
          byFlag.orderBy(col("l_extendedprice"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(byFlag))
      def pick(p: Double) =
        min(when(col("cum") >= ceil(col("n") * p), col("l_extendedprice")))
      cum.groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n"),
          pick(0.25).as("p25"), pick(0.5).as("p50"),
          pick(0.75).as("p75"), pick(0.9).as("p90"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, max(n) AS n,
              max(CASE WHEN rn = ceil(n * 0.25) THEN l_extendedprice END) AS p25,
              max(CASE WHEN rn = ceil(n * 0.5)  THEN l_extendedprice END) AS p50,
              max(CASE WHEN rn = ceil(n * 0.75) THEN l_extendedprice END) AS p75,
              max(CASE WHEN rn = ceil(n * 0.9)  THEN l_extendedprice END) AS p90
            FROM (SELECT l_returnflag, l_extendedprice,
                    row_number() OVER (PARTITION BY l_returnflag
                      ORDER BY l_extendedprice) AS rn,
                    count(*) OVER (PARTITION BY l_returnflag) AS n
                  FROM lineitem)
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Exact weighted median per group — the price point at which half
    * the QUANTITY (not half the rows) has been sold: the smallest price
    * whose cumulative quantity reaches half the group total, decided by
    * the integer comparison 2*cum >= tot (no division, no float). The
    * robust "typical price" a mean can't give under heavy-tailed order
    * sizes, and the weighted counterpart of q40's discrete quantiles —
    * same histogram-cumulative shape: group to (flag, price) first, so
    * the window walks DISTINCT prices per group, not raw rows.
    *
    * The WHOLE query runs in integer CENTI-UNITS
    * (`floor(l_quantity*100)` as BIGINT, the q155 discipline): a sum
    * of decimal(30,2) saturates to the precision cap (38,2), and
    * arithmetic on precision-38 decimals (`cum * 2`) is exactly where
    * Spark's precision-loss rules and a DuckDB version's DOUBLE
    * promotion can disagree, flipping exact ties at the median
    * crossing — and even a REPORTED decimal column is a cross-engine
    * surface, because double→decimal cast rounding differs between
    * Spark (shortest-representation HALF_UP via BigDecimal.valueOf)
    * and DuckDB builds that scale the raw binary double. So there is
    * no decimal anywhere: the group quantity total is emitted as the
    * exact BIGINT centi sum `tot_qty_centi`, and `wmedian` is a
    * raw-double passthrough (selection, not arithmetic). BIGINT
    * (HUGEINT-widened on DuckDB) is exact on both engines; nothing
    * left in the query can disagree across engines or versions.
    *
    * ## 100 TB notes
    * One shuffle to the (flag, price) histogram with map-side partials
    * (the heavy reduction), then per-flag windows over distinct prices
    * only. Centi-unit quantities accumulate in int64 — exact, order-
    * independent — so the crossing point is partitioning-invariant.
    * (int64 centi-quantity holds ~9.2e16 = 9.2e14 quantity units;
    * fine past sf100k.)
    */
  val q175WeightedMedian: Q = Q(
    "q175_weighted_median",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val hist = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(sum(floor(col("l_quantity") * 100).cast("long")).as("wc"))
      val byFlag = Window.partitionBy(col("l_returnflag"))
      val cum = hist
        .withColumn("cum", sum(col("wc")).over(
          byFlag.orderBy(col("l_extendedprice"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum(col("wc")).over(byFlag))
      cum.groupBy(col("l_returnflag"))
        .agg(
          min(when(col("cum") * 2 >= col("tot"), col("l_extendedprice")))
            .as("wmedian"),
          max(col("tot")).as("tot_qty_centi"))
        .orderBy("l_returnflag")
    },
    Some("""WITH hist AS (SELECT l_returnflag, l_extendedprice,
                sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS wc
              FROM lineitem GROUP BY 1, 2),
            cum AS (SELECT l_returnflag, l_extendedprice,
                sum(wc) OVER (PARTITION BY l_returnflag
                  ORDER BY l_extendedprice
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(wc) OVER (PARTITION BY l_returnflag) AS tot
              FROM hist)
            SELECT l_returnflag,
              min(CASE WHEN cum * 2 >= tot THEN l_extendedprice END)
                AS wmedian,
              CAST(max(tot) AS BIGINT) AS tot_qty_centi
            FROM cum GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Distributed second moments, deterministically: population variance /
    * stddev of price and covariance(quantity, price) per group — never
    * the stddev()/covar() builtins, whose double accumulation order is
    * partitioning-dependent. The moment formula n*Sxy - Sx*Sy suffers
    * catastrophic cancellation, so ulp-level input differences explode:
    * the fix is EXACT arithmetic until the final op. Prices are integer
    * cents and quantities integers in this domain, so every sum and the
    * whole numerator are exact integers (decimal(38,0) on Spark, HUGEINT
    * on DuckDB); the single scale-0 cast to double is correctly rounded
    * on both engines, and the closing division is one identical IEEE op
    * tree. One partial-agg shuffle; scales like any grouped sum (the
    * int64 cents sums would widen to decimal at ~sf10, stated inline).
    */
  val q41Moments: Q = Q(
    "q41_moments",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      // exact integer units: cents for price, whole units for quantity
      val centsY = round(col("l_extendedprice") * 100).cast("long")
      val intX = round(col("l_quantity")).cast("long")
      // sums in decimal(38,0): exact, order-independent; int64 would
      // overflow sum(cents^2) beyond ~sf1
      def isum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
      val agged = li
        .select(col("l_returnflag"), centsY.as("yc"), intX.as("xi"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          isum(col("yc")).as("sy"), isum(col("yc") * col("yc")).as("syy"),
          isum(col("xi")).as("sx"), isum(col("xi") * col("yc")).as("sxy"))
      val nDec = col("n").cast("decimal(38,0)")
      val numVar = (nDec * col("syy") - col("sy") * col("sy")).cast("double")
      val numCov = (nDec * col("sxy") - col("sx") * col("sy")).cast("double")
      val nD = col("n").cast("double")
      val varY = numVar / (nD * nD * 10000.0) // cents^2 -> currency^2
      agged.select(col("l_returnflag"), col("n"),
          varY.as("var_price"),
          sqrt(varY).as("stddev_price"),
          (numCov / (nD * nD * 100.0)).as("covar_qty_price"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, n,
              CAST(n*syy - sy*sy AS DOUBLE) / (nd * nd * 10000.0) AS var_price,
              sqrt(CAST(n*syy - sy*sy AS DOUBLE) / (nd * nd * 10000.0))
                AS stddev_price,
              CAST(n*sxy - sx*sy AS DOUBLE) / (nd * nd * 100.0)
                AS covar_qty_price
            FROM (SELECT l_returnflag, count(*) AS n, count(*)::DOUBLE AS nd,
                    sum(yc) AS sy, sum(yc*yc) AS syy,
                    sum(xi) AS sx, sum(xi*yc) AS sxy
                  FROM (SELECT l_returnflag,
                          CAST(round(l_extendedprice * 100) AS BIGINT) AS yc,
                          CAST(round(l_quantity) AS BIGINT) AS xi
                        FROM lineitem) GROUP BY l_returnflag)
            ORDER BY l_returnflag"""))

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

  /** Deterministic string aggregation: nations per region as a sorted,
    * comma-joined list. collect_list's arrival order is partitioning-
    * dependent, so the array is SORTED before joining — the only way a
    * concatenation aggregate is reproducible on a cluster. State is
    * bounded by group member count (fine for dimension rollups; don't
    * string-agg a fact table).
    */
  val q55StringAgg: Q = Q(
    "q55_string_agg",
    (s, dir) => {
      val nation = Tables.load(s, dir, "nation")
      val region = Tables.load(s, dir, "region")
      nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"),
          array_join(array_sort(collect_list(col("n_name"))), ",")
            .as("nations"))
        .orderBy("r_name")
    },
    Some("""SELECT r_name, count(*) AS n_nations,
              string_agg(n_name, ',' ORDER BY n_name) AS nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** Regex extraction inside a projection: the leading digit of
    * o_orderpriority ('1-URGENT' -> 1) feeding a conditional aggregate —
    * regexp_extract parity holds across engines for such anchored
    * digit-class patterns (no engine-specific regex features).
    */
  val q56RegexExtract: Q = Q(
    "q56_regex_extract",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.select(col("o_orderstatus"),
          // try_cast: regexp_extract yields '' on non-match, and a strict
          // ANSI cast would crash the query instead of producing NULL
          regexp_extract(col("o_orderpriority"), "^(\\d+)", 1)
            .try_cast("int").as("prio"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          count(when(col("prio") <= 2, 1)).as("n_high_prio"),
          min(col("prio")).as("min_prio"), max(col("prio")).as("max_prio"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n_orders,
              count(*) FILTER (prio <= 2) AS n_high_prio,
              min(prio) AS min_prio, max(prio) AS max_prio
            FROM (SELECT o_orderstatus,
                    TRY_CAST(regexp_extract(o_orderpriority, '^(\d+)', 1) AS INT)
                      AS prio
                  FROM orders)
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Snapshot CDC diff — the change-detection complement to the medallion
    * snapshot machinery (S3/q05 pick the latest snapshot; q84 merges a
    * change stream; THIS derives the change set between two table
    * versions): a full-outer join on the key classifies every row as
    * inserted / deleted / updated / unchanged, aggregated per nation.
    * The two versions are derived deterministically from `customer`
    * (v1 drops keys % 10 = 0; v2 drops keys % 7 = 0 and bumps acctbal
    * on keys % 3 = 0) so the oracle reconstructs both sides exactly.
    *
    * ## 100 TB notes
    * One co-partitioned shuffle per side on the key — and on a real
    * lake both snapshot versions are bucketed/partitioned identically
    * by construction (same writer), so the exchange disappears and the
    * diff is a zipped per-bucket merge. Payload comparison stays cheap
    * by hashing wide payloads into one comparison column first; here
    * the payload is a single double, compared directly. This is the
    * audit that validates any incremental pipeline: replaying the CDC
    * stream onto v1 must reproduce v2.
    */
  val q87SnapshotDiff: Q = Q(
    "q87_snapshot_diff",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val v1 = cust.filter(pmod(col("c_custkey"), lit(10)) =!= 0)
      val v2 = cust.filter(pmod(col("c_custkey"), lit(7)) =!= 0)
        .select(col("c_custkey"), col("c_nationkey"),
          when(pmod(col("c_custkey"), lit(3)) === 0,
            col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"))
      val j = v1.as("a").join(v2.as("b"),
        col("a.c_custkey") === col("b.c_custkey"), "full_outer")
      val status = when(col("a.c_custkey").isNull, "inserted")
        .when(col("b.c_custkey").isNull, "deleted")
        .when(col("a.c_acctbal") =!= col("b.c_acctbal"), "updated")
        .otherwise("unchanged")
      j.select(
          coalesce(col("a.c_nationkey"), col("b.c_nationkey")).as("nation"),
          status.as("status"))
        .groupBy(col("nation"), col("status"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("nation", "status")
    },
    Some("""WITH c AS (SELECT c_custkey, c_nationkey, c_acctbal
                       FROM customer),
            v1 AS (SELECT * FROM c WHERE c_custkey % 10 != 0),
            v2 AS (SELECT c_custkey, c_nationkey,
                     CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
                          ELSE c_acctbal END AS c_acctbal
                   FROM c WHERE c_custkey % 7 != 0),
            d AS (SELECT coalesce(a.c_nationkey, b.c_nationkey) AS nation,
                    CASE WHEN a.c_custkey IS NULL THEN 'inserted'
                         WHEN b.c_custkey IS NULL THEN 'deleted'
                         WHEN a.c_acctbal != b.c_acctbal THEN 'updated'
                         ELSE 'unchanged' END AS status
                  FROM v1 a FULL OUTER JOIN v2 b
                    ON a.c_custkey = b.c_custkey)
            SELECT nation, status, count(*) AS n_rows
            FROM d GROUP BY nation, status ORDER BY nation, status"""))

  /** One PageRank iteration over the trade graph (customer-nation →
    * supplier-nation, edge weight = lineitem count), from a uniform
    * start vector, damping 0.85 — the link-analysis complement to the
    * connected-components queries (q43/q69).
    *
    * Determinism at scale: each edge's contribution `w/out_w` is
    * computed as the EXACT fixed-point integer `(w * 10^15) div out_w`
    * (both positive, so engine floor/truncate differences cannot bite;
    * each term <= 10^15, so the 25-term per-node sum is far from Long
    * range). The sum is order-independent bigint arithmetic; the final
    * rank is one fixed double op tree `0.006 + 0.034 * (q / 1e15)`
    * (= 0.15/N + 0.85 * r0 * sum, N = 25, r0 = 1/25), bit-identical
    * across engines. At 100 TB the edge aggregation is the q07 star
    * join's shuffle; the per-node contribution join shuffles the
    * 625-row edge table, not the facts.
    */
  val q89PagerankStep: Q = Q(
    "q89_pagerank_step",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val nation = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val edges = li
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("u"), col("s_nationkey").as("v"))
        .agg(count(lit(1)).as("w"))
      val outW = edges.groupBy("u").agg(sum("w").as("out_w"))
      val contrib = edges.join(outW, "u")
        .select(col("v"),
          expr("(CAST(w AS DECIMAL(38,0)) * 1000000000000000) " +
            "div CAST(out_w AS DECIMAL(38,0))").as("q"))
        .groupBy("v").agg(sum("q").as("in_q"))
      nation
        .join(contrib, col("n_nationkey") === col("v"), "left")
        .select(col("n_nationkey"), col("n_name"),
          coalesce(col("in_q"), lit(0L)).as("in_q"))
        .withColumn("pr",
          lit(0.006) + lit(0.034) * (col("in_q").cast("double") / lit(1.0e15)))
        .orderBy("n_nationkey")
    },
    Some("""WITH e AS (SELECT c_nationkey AS u, s_nationkey AS v,
                         count(*) AS w
                       FROM lineitem
                       JOIN orders ON l_orderkey = o_orderkey
                       JOIN customer ON o_custkey = c_custkey
                       JOIN supplier ON l_suppkey = s_suppkey
                       GROUP BY 1, 2),
            o AS (SELECT u, CAST(sum(w) AS BIGINT) AS out_w
                  FROM e GROUP BY u),
            c AS (SELECT v, CAST(sum(CAST(
                      (CAST(w AS HUGEINT) * 1000000000000000)
                        // CAST(out_w AS HUGEINT) AS BIGINT)) AS BIGINT)
                    AS in_q
                  FROM e JOIN o USING (u) GROUP BY v)
            SELECT n_nationkey, n_name, coalesce(in_q, 0) AS in_q,
              0.006 + 0.034 * (CAST(coalesce(in_q, 0) AS DOUBLE) / 1e15)
                AS pr
            FROM nation LEFT JOIN c ON n_nationkey = v
            ORDER BY n_nationkey"""))

  /** Broadcast interval-dimension join: classify orders into price
    * tiers defined as [lo, hi) intervals — including an OVERLAPPING
    * "vip" tier, which is exactly why this is a join and not a CASE
    * bin: a row can land in several tiers, so no single-valued bucket
    * expression can express it.
    *
    * 100 TB: the tier table is a fixed-size dim -> `broadcast()`; the
    * plan is a BroadcastNestedLoopJoin whose inner side is 4 rows, so
    * the cost is 4 comparisons per fact row, map-side, no shuffle of
    * the fact table (the only exchange is the final tier aggregation).
    * Disjoint tiers would instead compile to the q113-style bin
    * expression; the operator exists for the general interval-dim case.
    */
  val q112TierJoin: Q = Q(
    "q112_tier_join",
    (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val tiers = Seq(
        ("budget", 0.0, 100000.0),
        ("mid", 100000.0, 250000.0),
        ("premium", 250000.0, 600000.0),
        ("vip", 400000.0, 600000.0)).toDF("tier", "lo", "hi")
      orders
        .join(broadcast(tiers),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast("decimal(30,10)")), 2)
            .cast("double").as("total_price"))
        .orderBy("tier")
    },
    Some("""SELECT tier, count(*) AS n_orders,
            CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,10))), 2)
              AS DOUBLE) AS total_price
            FROM orders
            JOIN (VALUES ('budget', 0.0, 100000.0),
                         ('mid', 100000.0, 250000.0),
                         ('premium', 250000.0, 600000.0),
                         ('vip', 400000.0, 600000.0)) t(tier, lo, hi)
              ON o_totalprice >= lo AND o_totalprice < hi
            GROUP BY tier ORDER BY tier"""))

  /** Equi-width histogram (10 buckets) over l_extendedprice — the
    * profiling complement to q40's equi-depth quantiles.
    *
    * Two passes: (1) global min/max (one partial-agg reduce), broadcast
    * as a 1-row relation; (2) a map-only bin expression + the bucket
    * aggregation. The bin index is ONE double op tree —
    * floor((v - lo) / ((hi - lo) / 10)) clamped to 9 so v = max lands
    * in the last bucket — identical IEEE ops on both engines, so even a
    * value exactly on a bucket edge bins identically. A single-valued
    * column (hi = lo) is pinned to bucket 0 by an explicit CASE on both
    * engines, never left to NaN binning. At 100 TB both
    * passes are full scans but shuffle only the 10-row result;
    * at cluster scale pass (1) would come free from parquet
    * column statistics.
    */
  val q113Histogram: Q = Q(
    "q113_histogram",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val stats = li.agg(min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      li.select(col("l_extendedprice").as("v"))
        .crossJoin(broadcast(stats))
        // hi = lo (single-valued column) would make the width 0/0 = NaN,
        // where Spark's non-ANSI floor->cast yields bucket 0 but DuckDB's
        // CAST(floor(NaN) AS BIGINT) errors — pin the degenerate case to
        // bucket 0 explicitly, with the identical CASE on the oracle side
        .select(col("v"),
          when(col("hi") === col("lo"), lit(0L)).otherwise(
            least(floor((col("v") - col("lo")) /
              ((col("hi") - col("lo")) / lit(10.0))), lit(9L))).as("bucket"),
          col("lo"), col("hi"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("v").cast("decimal(30,10)")), 2).cast("double")
            .as("sum_v"),
          (first(col("lo")) + col("bucket").cast("double") *
            ((first(col("hi")) - first(col("lo"))) / lit(10.0)))
            .as("bucket_lo"))
        .select(col("bucket"), col("bucket_lo"), col("n_rows"), col("sum_v"))
        .orderBy("bucket")
    },
    Some("""WITH s AS (SELECT min(l_extendedprice) AS lo,
                              max(l_extendedprice) AS hi FROM lineitem),
            b AS (SELECT CASE WHEN hi = lo THEN 0
                      ELSE least(CAST(floor((l_extendedprice - lo) /
                        ((hi - lo) / 10.0)) AS BIGINT), 9) END AS bucket,
                    l_extendedprice AS v, lo, hi
                  FROM lineitem CROSS JOIN s)
            SELECT bucket,
              any_value(lo) + CAST(bucket AS DOUBLE) *
                ((any_value(hi) - any_value(lo)) / 10.0) AS bucket_lo,
              count(*) AS n_rows,
              CAST(round(sum(CAST(v AS DECIMAL(30,10))), 2) AS DOUBLE)
                AS sum_v
            FROM b GROUP BY bucket ORDER BY bucket"""))

  /** Pairwise Pearson correlation matrix over the four lineitem value
    * columns, from ONE pass of moment sums (the q41 posture extended to
    * cross-moments).
    *
    * Determinism: every sum (x, x^2, x*y) is accumulated EXACTLY in
    * decimal(30,10) over bit-identical per-row double products, rounded
    * to 2 in decimal, and only then cast to double — both engines then
    * evaluate the identical correlation op tree (IEEE mul/sub/div and
    * correctly-rounded sqrt), so the result is bit-identical without
    * any tolerance. The 15 aggregates ride one partial-agg reduce to a
    * single row; the 6 output rows are projections of that row — at
    * 100 TB this is one scan, no shuffle beyond the reduce, vs six
    * separate corr() passes.
    *
    * l_extendedprice is pre-scaled by 0.001 on BOTH engines: Pearson
    * correlation is exactly scale-invariant, and the scaling keeps every
    * rounded moment sum's cent-unscaled integer below 2^53 — beyond
    * that, Spark's single-rounding BigDecimal->double cast and DuckDB's
    * two-rounding int128->double-then-divide cast can disagree by 1 ulp
    * (the q06 low-scale-only cast-parity rule, hit here because sums of
    * SQUARES reach 2.2e15 at sf0.1 already).
    */
  val q114CorrMatrix: Q = Q(
    "q114_corr_matrix",
    (s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      // widen: 15 decimal sums per row are compute-bound, and the
      // single-row-group fixture scan would run them on ONE thread
      // (order-independent exact sums, so the shuffle cannot change
      // the result; no-op at scale — see Tables.widen)
      val li = Tables.widen(s, Tables.load(s, dir, "lineitem")
        .select(col("l_quantity"),
          (col("l_extendedprice") * lit(0.001)).as("l_extendedprice"),
          col("l_discount"), col("l_tax")))
      def dsum(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        round(sum(e.cast("decimal(30,10)")), 2).cast("double")
      // materialize the 1-row moment table: the six union branches below
      // would otherwise EACH recompute the full scan+aggregate (measured
      // in PLANS.md as 6 shuffles / 6 scans before this eager)
      val sums = Tables.eager(li.agg(
        count(lit(1)).cast("double").as("n"),
        cols.map(c => dsum(col(c)).as(s"s_$c")) ++
          cols.map(c => dsum(col(c) * col(c)).as(s"ss_$c")) ++
          cols.combinations(2).map { case Seq(x, y) =>
            dsum(col(x) * col(y)).as(s"sp_${x}_$y")
          }.toSeq: _*))
      val pairs = cols.combinations(2).map { case Seq(x, y) =>
        sums.select(
          lit(x).as("xcol"), lit(y).as("ycol"),
          ((col("n") * col(s"sp_${x}_$y") - col(s"s_$x") * col(s"s_$y")) /
            (sqrt(col("n") * col(s"ss_$x") - col(s"s_$x") * col(s"s_$x")) *
              sqrt(col("n") * col(s"ss_$y") - col(s"s_$y") * col(s"s_$y"))))
            .as("corr"))
      }.toSeq
      pairs.reduce(_.unionByName(_)).orderBy("xcol", "ycol")
    },
    Some {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      def dsum(e: String) =
        s"CAST(round(sum(CAST($e AS DECIMAL(30,10))), 2) AS DOUBLE)"
      val aggs = (Seq("CAST(count(*) AS DOUBLE) AS n") ++
        cols.map(c => s"${dsum(c)} AS s_$c") ++
        cols.map(c => s"${dsum(s"$c * $c")} AS ss_$c") ++
        cols.combinations(2).map { case Seq(x, y) =>
          s"${dsum(s"$x * $y")} AS sp_${x}_$y"
        }).mkString(", ")
      val rows = cols.combinations(2).map { case Seq(x, y) =>
        s"""SELECT '$x' AS xcol, '$y' AS ycol,
              (n * sp_${x}_$y - s_$x * s_$y) /
                (sqrt(n * ss_$x - s_$x * s_$x) *
                 sqrt(n * ss_$y - s_$y * s_$y)) AS corr
            FROM m"""
      }.mkString(" UNION ALL ")
      s"""WITH li AS (SELECT l_quantity,
                        l_extendedprice * CAST(0.001 AS DOUBLE)
                          AS l_extendedprice,
                        l_discount, l_tax FROM lineitem),
          m AS (SELECT $aggs FROM li) $rows ORDER BY xcol, ycol"""
    })

  /** FULL OUTER join — the one join type the suite lacked (inner q06,
    * left q90's gap-fill frame, semi q08, anti q09, cross q103's 1-row
    * broadcast, as-of/range/interval in EventQueries): per-day order
    * counts reconciled against per-day shipment counts. Ship dates run
    * past the last order date and order days can ship nothing, so BOTH
    * unmatched regions are genuinely exercised — the null pattern in the
    * output is the proof of outerness, deliberately not coalesced away.
    *
    * ## 100 TB notes
    * Both sides pre-aggregate to |days| rows BEFORE the join (partial
    * aggs ride the scans; the join input is already tiny), so the full
    * outer join — which cannot broadcast (both sides must keep unmatched
    * rows) — shuffles only day-grain tables. The reconciliation-report
    * shape: aggregate first, outer-join the summaries, never
    * full-outer-join raw facts.
    */
  val q116FullOuter: Q = Q(
    "q116_full_outer",
    (s, dir) => {
      val dayUs = (c: org.apache.spark.sql.Column) =>
        unix_micros(date_trunc("day", c).cast("timestamp_ltz"))
      val o = Tables.load(s, dir, "orders")
        .groupBy(dayUs(col("o_orderdate")).as("day_us"))
        .agg(count(lit(1)).as("n_orders"))
      val l = Tables.load(s, dir, "lineitem")
        .groupBy(dayUs(col("l_shipdate")).as("day_us"))
        .agg(count(lit(1)).as("n_ships"))
      o.join(l, Seq("day_us"), "full_outer")
        .orderBy("day_us")
    },
    Some("""WITH o AS (SELECT epoch_us(date_trunc('day', o_orderdate))
                         AS day_us, count(*) AS n_orders
                       FROM orders GROUP BY 1),
            l AS (SELECT epoch_us(date_trunc('day', l_shipdate))
                    AS day_us, count(*) AS n_ships
                  FROM lineitem GROUP BY 1)
            SELECT day_us, n_orders, n_ships
            FROM o FULL JOIN l USING (day_us)
            ORDER BY day_us"""))

  /** UNPIVOT (melt) — the inverse of q15's pivot, and the missing
    * wide-to-long reshape: per-returnflag measure columns melted into
    * (flag, measure, value) rows via the native `unpivot` operator (no
    * union-of-projections re-scan on the Spark side; Catalyst expands it
    * to one Expand node over the aggregated input). The oracle is the
    * portable UNION ALL form over the same aggregate.
    *
    * ## 100 TB notes
    * Unpivot AFTER aggregation: the Expand multiplies rows by the
    * measure count, so melting the |flags|-row summary emits 3x|flags|
    * rows, while melting raw lineitem first would 3x the corpus before
    * the shuffle. Same aggregate-first rule as q116.
    */
  val q117Unpivot: Q = Q(
    "q117_unpivot",
    (s, dir) => {
      val sumD = (c: String) =>
        round(sum(col(c).cast("decimal(30,10)")), 2).cast("double")
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sumD("l_quantity").as("sum_qty"),
          sumD("l_extendedprice").as("sum_price"),
          sumD("l_discount").as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")
    },
    Some("""WITH a AS (SELECT l_returnflag,
              CAST(round(sum(CAST(l_quantity AS DECIMAL(30,10))), 2)
                AS DOUBLE) AS sum_qty,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,10))), 2)
                AS DOUBLE) AS sum_price,
              CAST(round(sum(CAST(l_discount AS DECIMAL(30,10))), 2)
                AS DOUBLE) AS sum_disc
            FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, measure, value FROM (
              SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value
                FROM a
              UNION ALL
              SELECT l_returnflag, 'sum_price', sum_price FROM a
              UNION ALL
              SELECT l_returnflag, 'sum_disc', sum_disc FROM a)
            ORDER BY l_returnflag, measure"""))

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

  /** Robust outlier detection via MAD (median absolute deviation): per
    * group, the discrete median of the metric, then the discrete median
    * of absolute deviations from it, then a count of rows beyond
    * 3 x MAD. Two rank-pick passes (the q40 histogram/cum-rank idiom —
    * no interpolating percentile, whose midpoint arithmetic differs
    * between engines) and one counting pass; the 5-row median table is
    * broadcast back to the fact both times, so the only fact-sized
    * shuffles are the two per-(group, value) histograms. Every compared
    * value is an ACTUAL element of the data (exact cents-valued
    * doubles), so engine parity is structural, not numeric luck.
    */
  val q124MadOutliers: Q = Q(
    "q124_mad_outliers",
    (s, dir) => {
      // the fixture's metrics are uniform, where the maximum deviation
      // is only ~2 x MAD and a 3 x MAD detector is dead code — so plant
      // sparse anomalies (~0.1% of rows, x100 spikes; the q61
      // planted-fixture idiom) that the detector must flag
      val li = Tables.load(s, dir, "orders")
        .select(col("o_orderstatus").as("flag"),
          when(pmod(col("o_orderkey"), lit(997)) === 0,
            col("o_totalprice") * 100).otherwise(col("o_totalprice"))
            .as("x"))
      // discrete median of `c` per flag: histogram -> cumulative rank ->
      // first value whose cum rank reaches ceil(n/2)
      def discMedian(df: DataFrame, c: String, out: String): DataFrame = {
        val byFlag = Window.partitionBy(col("flag"))
        df.groupBy(col("flag"), col(c)).agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum(col("cnt")).over(
            byFlag.orderBy(col(c))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", sum(col("cnt")).over(byFlag))
          .groupBy(col("flag"))
          .agg(min(when(col("cum") >= ceil(col("n") * 0.5), col(c)))
            .as(out))
      }
      val med = discMedian(li, "x", "med")
      val dev = li.join(broadcast(med), "flag")
        .select(col("flag"), abs(col("x") - col("med")).as("d"))
      val mad = discMedian(dev, "d", "mad")
      li.join(broadcast(med), "flag").join(broadcast(mad), "flag")
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"),
          max(col("med")).as("med"), max(col("mad")).as("mad"),
          count(when(abs(col("x") - col("med")) > col("mad") * 3, 1))
            .as("n_outliers"))
        .orderBy("flag")
    },
    Some("""WITH li AS (SELECT o_orderstatus AS flag,
                          CASE WHEN o_orderkey % 997 = 0
                               THEN o_totalprice * 100
                               ELSE o_totalprice END AS x
                        FROM orders),
            m AS (SELECT flag,
                    min(CASE WHEN cum >= ceil(n * 0.5) THEN x END) AS med
                  FROM (SELECT flag, x,
                          sum(cnt) OVER (PARTITION BY flag ORDER BY x
                            ROWS UNBOUNDED PRECEDING) AS cum,
                          sum(cnt) OVER (PARTITION BY flag) AS n
                        FROM (SELECT flag, x, count(*) AS cnt FROM li
                              GROUP BY 1, 2))
                  GROUP BY flag),
            d AS (SELECT li.flag, abs(x - med) AS d
                  FROM li JOIN m USING (flag)),
            md AS (SELECT flag,
                     min(CASE WHEN cum >= ceil(n * 0.5) THEN d END) AS mad
                   FROM (SELECT flag, d,
                           sum(cnt) OVER (PARTITION BY flag ORDER BY d
                             ROWS UNBOUNDED PRECEDING) AS cum,
                           sum(cnt) OVER (PARTITION BY flag) AS n
                         FROM (SELECT flag, d, count(*) AS cnt FROM d
                               GROUP BY 1, 2))
                   GROUP BY flag)
            SELECT flag, count(*) AS n, max(med) AS med, max(mad) AS mad,
              count(CASE WHEN abs(x - med) > mad * 3 THEN 1 END)
                AS n_outliers
            FROM li JOIN m USING (flag) JOIN md USING (flag)
            GROUP BY flag ORDER BY flag"""))

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

  /** Bloom-filter membership as dataflow — the set-membership sketch
    * beside q120's frequency sketch: the filter is the DISTINCT set of
    * bit positions lit by k Carter–Wegman hashes over the key set (a
    * |bits|-bounded table regardless of input size), and a probe is a
    * member iff all k of its positions are lit — a broadcast join plus a
    * count-match. Probes are the customer keys shifted into a
    * half-overlapping range, so present keys, absent keys, and (2^17 bits
    * at ~10 bits/key) a realistic ~1-5% false-positive rate occurs at the
    * larger SFs. The
    * aggregate proves the contract both engines recompute identically:
    * zero false NEGATIVES ever, false positives counted exactly.
    *
    * ## 100 TB notes
    * The build side is a distinct over k x |keys| exploded rows that
    * map-side-collapses to <= |bits| rows — broadcast however big the key
    * set was; the probe side never shuffles (broadcast join + local
    * agg). This is the relational skeleton of Spark's own
    * `bloom_filter_agg`/`might_contain` runtime pruning
    * (`RuntimePruningSpec` exercises the native pair).
    */
  val q130BloomMembership: Q = Q(
    "q130_bloom_membership",
    (s, dir) => {
      val hashes = 5L
      val bits = 131072L
      val prime = 2147483647L
      def pos(k: Column, i: Column): Column =
        (k * (i * 1048573L + 7L) + (i * 2097143L + 31L)) % prime % bits
      val keys = Tables.load(s, dir, "customer").select(col("c_custkey"))
      val lit5 = sequence(lit(0L), lit(hashes - 1))
      val bitset = keys
        .select(explode(lit5).as("i"), col("c_custkey"))
        .select(pos(col("c_custkey"), col("i")).as("b"))
        .distinct()
      val mx = keys.agg(max(col("c_custkey")).as("mx")) // 1 row
      val probes = keys.crossJoin(broadcast(mx))
        .select((col("c_custkey") + expr("mx div 2")).as("probe"))
      val truth = probes
        .join(keys.select(col("c_custkey").as("probe")), Seq("probe"),
          "left_semi").select(col("probe"), lit(true).as("present"))
      val hit = probes
        .select(col("probe"), explode(lit5).as("i"))
        .join(broadcast(bitset), pos(col("probe"), col("i")) === col("b"),
          "left")
        .groupBy(col("probe"))
        .agg((count(col("b")) === hashes).as("bloom_hit"))
      hit.join(truth, Seq("probe"), "left")
        .select(col("probe"), coalesce(col("present"), lit(false))
          .as("present"), col("bloom_hit"))
        .groupBy(col("present"))
        .agg(count(lit(1)).as("n_probes"),
          count(when(col("bloom_hit"), 1)).as("n_hits"),
          count(when(col("present") && !col("bloom_hit"), 1))
            .as("n_false_negatives"),
          count(when(!col("present") && col("bloom_hit"), 1))
            .as("n_false_positives"))
        .orderBy("present")
    },
    Some("""WITH keys AS (SELECT c_custkey FROM customer),
            hh AS (SELECT unnest(generate_series(0, 4)) AS i),
            bitset AS (SELECT DISTINCT
                (c_custkey * (i * 1048573 + 7) + (i * 2097143 + 31))
                  % 2147483647 % 131072 AS b
              FROM keys CROSS JOIN hh),
            probes AS (SELECT c_custkey +
                (SELECT max(c_custkey) FROM keys) // 2 AS probe
              FROM keys),
            truth AS (SELECT probe,
                probe IN (SELECT c_custkey FROM keys) AS present
              FROM probes),
            hit AS (SELECT probe, count(b) = 5 AS bloom_hit
              FROM (SELECT p.probe, p.i, bs.b
                    FROM (SELECT probe, i FROM probes CROSS JOIN hh) p
                    LEFT JOIN bitset bs
                      ON (p.probe * (p.i * 1048573 + 7)
                          + (p.i * 2097143 + 31)) % 2147483647 % 131072 = bs.b)
              GROUP BY probe)
            SELECT present, count(*) AS n_probes,
              count(CASE WHEN bloom_hit THEN 1 END) AS n_hits,
              count(CASE WHEN present AND NOT bloom_hit THEN 1 END)
                AS n_false_negatives,
              count(CASE WHEN NOT present AND bloom_hit THEN 1 END)
                AS n_false_positives
            FROM hit JOIN truth USING (probe)
            GROUP BY present ORDER BY present"""))

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

  /** Snowflake-chain join: region → nation → customer → orders revenue,
    * the DEPTH dimension of q07's star (which fans three dims around one
    * fact). Each dimension hop is a broadcast hash join, so the
    * orders-sized stream flows through three build-side lookups without
    * ever shuffling — the canonical normalized-schema rollup plan at
    * 100 TB (and the case where join REORDERING matters: Catalyst is
    * free to collapse dim–dim joins first because they are all
    * broadcast).
    */
  val q135SnowflakeChain: Q = Q(
    "q135_snowflake_chain",
    (s, dir) => {
      val region = Tables.load(s, dir, "region")
        .select(col("r_regionkey"), col("r_name"))
      val nation = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_totalprice"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice").cast("decimal(30,10)")), 2)
            .cast("double").as("revenue"))
        .orderBy("r_name")
    },
    Some("""SELECT r_name, count(*) AS n_orders,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,10))), 2)
                AS DOUBLE) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** Equi-DEPTH histogram (quantile binning) — the partner of q113's
    * equi-width bins: per returnflag, 8 buckets of (as close as ties
    * allow) equal row counts, assigned at VALUE granularity from the
    * q40 histogram/cumulative-rank idiom, so all rows of one value land
    * in one bucket (tie-coherent, hence engine-deterministic). Emits per
    * bucket the row count and value bounds. Same scale shape as q40:
    * per-flag histogram shuffle, windows over the histogram reusing that
    * partitioning.
    */
  val q136EquidepthHistogram: Q = Q(
    "q136_equidepth_histogram",
    (s, dir) => {
      val buckets = 8L
      val byFlag = Window.partitionBy("l_returnflag")
      val hist = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(
          byFlag.orderBy(col("l_extendedprice"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("cnt")).over(byFlag))
      hist
        // value-level depth bucket from the cum rank of the value's LAST
        // row: floor((cum-1) * B / n), clamped by construction to B-1
        .withColumn("bucket",
          expr(s"(cum - 1) * $buckets div n"))
        .groupBy(col("l_returnflag"), col("bucket"))
        .agg(count(lit(1)).as("n_values"),
          sum(col("cnt")).as("n_rows"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        .orderBy("l_returnflag", "bucket")
    },
    Some("""WITH h AS (SELECT l_returnflag, l_extendedprice,
                         count(*) AS cnt
                       FROM lineitem GROUP BY 1, 2),
            c AS (SELECT *,
                    sum(cnt) OVER (PARTITION BY l_returnflag
                      ORDER BY l_extendedprice
                      ROWS UNBOUNDED PRECEDING) AS cum,
                    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
                  FROM h)
            SELECT l_returnflag, CAST((cum - 1) * 8 // n AS BIGINT)
                AS bucket,
              count(*) AS n_values, CAST(sum(cnt) AS BIGINT) AS n_rows,
              min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
            FROM c GROUP BY 1, 2 ORDER BY l_returnflag, bucket"""))

  /** Percentile winsorization — the robust-preprocessing partner of
    * q124's MAD detector: per status, order values are CLAMPED into
    * [p05, p95] (discrete rank-picked percentiles, actual elements —
    * the q40 idiom, no interpolation) over the q124 planted-spike
    * fixture, so the clamp genuinely fires. Emits per group the clamp
    * counts and the decimal-exact sums before/after — the exact "how
    * much did winsorization move the total" audit a feature pipeline
    * records. Two passes over the (group, value) histogram plus one
    * broadcast join back; all comparisons against actual data elements.
    */
  val q157Winsorize: Q = Q(
    "q157_winsorize",
    (s, dir) => {
      val li = Tables.load(s, dir, "orders")
        .select(col("o_orderstatus").as("flag"),
          when(pmod(col("o_orderkey"), lit(997)) === 0,
            col("o_totalprice") * 100).otherwise(col("o_totalprice"))
            .as("x"))
      val byFlag = Window.partitionBy(col("flag"))
      val cum = li.groupBy(col("flag"), col("x"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(
          byFlag.orderBy(col("x"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("cnt")).over(byFlag))
      def pick(p: Double) =
        min(when(col("cum") >= ceil(col("n") * p), col("x")))
      val bounds = cum.groupBy(col("flag"))
        .agg(pick(0.05).as("p05"), pick(0.95).as("p95"))
      li.join(broadcast(bounds), "flag")
        .select(col("flag"), col("x"),
          least(greatest(col("x"), col("p05")), col("p95")).as("w"),
          col("p05"), col("p95"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"),
          count(when(col("x") < col("p05"), 1)).as("n_clamped_low"),
          count(when(col("x") > col("p95"), 1)).as("n_clamped_high"),
          max(col("p05")).as("p05"), max(col("p95")).as("p95"),
          round(sum(col("x").cast("decimal(30,10)")), 2).cast("double")
            .as("raw_sum"),
          round(sum(col("w").cast("decimal(30,10)")), 2).cast("double")
            .as("winsorized_sum"))
        .orderBy("flag")
    },
    Some("""WITH li AS (SELECT o_orderstatus AS flag,
                          CASE WHEN o_orderkey % 997 = 0
                               THEN o_totalprice * 100
                               ELSE o_totalprice END AS x
                        FROM orders),
            c AS (SELECT flag, x,
                    sum(cnt) OVER (PARTITION BY flag ORDER BY x
                      ROWS UNBOUNDED PRECEDING) AS cum,
                    sum(cnt) OVER (PARTITION BY flag) AS n
                  FROM (SELECT flag, x, count(*) AS cnt FROM li
                        GROUP BY 1, 2)),
            b AS (SELECT flag,
                    min(CASE WHEN cum >= ceil(n * 0.05) THEN x END) AS p05,
                    min(CASE WHEN cum >= ceil(n * 0.95) THEN x END) AS p95
                  FROM c GROUP BY flag)
            SELECT flag, count(*) AS n,
              count(CASE WHEN x < p05 THEN 1 END) AS n_clamped_low,
              count(CASE WHEN x > p95 THEN 1 END) AS n_clamped_high,
              max(p05) AS p05, max(p95) AS p95,
              CAST(round(sum(CAST(x AS DECIMAL(30,10))), 2) AS DOUBLE)
                AS raw_sum,
              CAST(round(sum(CAST(least(greatest(x, p05), p95)
                AS DECIMAL(30,10))), 2) AS DOUBLE) AS winsorized_sum
            FROM li JOIN b USING (flag)
            GROUP BY flag ORDER BY flag"""))

  /** Wilson score intervals for per-group proportions — the
    * small-sample-safe confidence interval every rate dashboard should
    * use instead of the normal approximation (which goes negative near
    * 0): fulfillment rate per order priority with 95 % bounds. The op
    * tree is counts → one rate division → the Wilson closed form, whose
    * only non-arithmetic op is the correctly-rounded IEEE sqrt (the
    * q148 rule) — a FIXED chain both engines execute identically. One
    * map-side-combined aggregate; five rows.
    */
  val q160WilsonInterval: Q = Q(
    "q160_wilson_interval",
    (s, dir) => {
      val z = 1.959963984540054 // Phi^-1(0.975)
      val cells = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"),
          count(when(col("o_orderstatus") === "F", 1)).as("k"))
      val nD = col("n").cast("double")
      val p = col("k").cast("double") / nD
      // z² as an ENGINE-side product of the shared literal — a
      // pre-multiplied decimal literal might not round-trip to the
      // identical double on both engines
      val z2 = lit(z) * lit(z)
      val denom = lit(1.0) + z2 / nD
      val center = (p + z2 / (lit(2.0) * nD)) / denom
      val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD
        + z2 / (lit(4.0) * nD * nD))) / denom
      cells.select(col("priority"), col("n"), col("k"),
          p.as("rate"), (center - half).as("wilson_lo"),
          (center + half).as("wilson_hi"))
        .orderBy("priority")
    },
    Some(s"""WITH c AS (SELECT o_orderpriority AS priority,
                          count(*) AS n,
                          count(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                            AS k
                        FROM orders GROUP BY 1),
             w AS (SELECT priority, n, k,
                     CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                     CAST(n AS DOUBLE) AS nd,
                     1.959963984540054 * 1.959963984540054 AS z2
                   FROM c)
             SELECT priority, n, k, p AS rate,
               (p + z2 / (2.0 * nd)) / (1.0 + z2 / nd)
               - (1.959963984540054 * sqrt(p * (1.0 - p) / nd
                   + z2 / (4.0 * nd * nd))) / (1.0 + z2 / nd) AS wilson_lo,
               (p + z2 / (2.0 * nd)) / (1.0 + z2 / nd)
               + (1.959963984540054 * sqrt(p * (1.0 - p) / nd
                   + z2 / (4.0 * nd * nd))) / (1.0 + z2 / nd) AS wilson_hi
             FROM w ORDER BY priority"""))

  /** Z-order (Morton) clustering layout audit — the data-skipping
    * story behind lakehouse `OPTIMIZE ZORDER BY (a, b)`: interleave the
    * bits of two scan dimensions, bucket rows by the top 6 z-bits
    * (64 would-be files), and report each bucket's row count and
    * per-dimension min/max. Because z-order is locality-preserving in
    * BOTH dimensions at once, every bucket's (min,max) envelope covers
    * ~1/8 of each dimension's range — so a point or range predicate on
    * EITHER column prunes ~7/8 of the files from their min/max stats
    * alone, which no single-column sort can do for both columns. The
    * bit-spread is the standard Morton magic-number sequence, written
    * with decimal mask literals as the same exact integer op tree on
    * both engines.
    *
    * Scale shape: pure projection (5 shifts/masks per dimension) + one
    * 64-group aggregate — map-side combined, one shuffle of 64 rows. At
    * 100 TB the same z-value IS the repartitionByRange key for the
    * actual rewrite; this query is its stats audit.
    */
  val q167ZorderLayout: Q = Q(
    "q167_zorder_layout",
    (s, dir) => {
      def spread(c: Column): Column = {
        // 16-bit value -> 32 bits with zeros interleaved (Morton)
        val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(16711935L))
        val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(252645135L))
        val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(858993459L))
        s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(1431655765L))
      }
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
      // normalize each dimension to the full 16-bit range with EXACT
      // integer division against this run's max (div, not a double
      // divide+floor, whose rounding could disagree with DuckDB's //)
      val maxes = li.agg(max(col("l_partkey")).as("maxp"),
        max(col("l_suppkey")).as("maxs"))
      val px = expr("CAST(l_partkey AS BIGINT) * 65536 div (maxp + 1)")
      val sx = expr("CAST(l_suppkey AS BIGINT) * 65536 div (maxs + 1)")
      val z = spread(px).bitwiseOR(shiftleft(spread(sx), 1))
      li.crossJoin(broadcast(maxes))
        .select(col("l_partkey"), col("l_suppkey"),
          shiftright(z, 26).as("z_bucket"))
        .groupBy(col("z_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("min_part"),
          max(col("l_partkey")).as("max_part"),
          min(col("l_suppkey")).as("min_supp"),
          max(col("l_suppkey")).as("max_supp"))
        .orderBy(col("z_bucket"))
    },
    Some("""WITH mx AS (SELECT max(l_partkey) AS maxp,
                max(l_suppkey) AS maxs FROM lineitem),
            sp AS (SELECT l_partkey, l_suppkey,
                (CAST(l_partkey AS BIGINT) * 65536) // (maxp + 1) AS px,
                (CAST(l_suppkey AS BIGINT) * 65536) // (maxs + 1) AS sx
              FROM lineitem, mx),
            s1 AS (SELECT l_partkey, l_suppkey,
                (px | (px << 8)) & 16711935 AS px,
                (sx | (sx << 8)) & 16711935 AS sx FROM sp),
            s2 AS (SELECT l_partkey, l_suppkey,
                (px | (px << 4)) & 252645135 AS px,
                (sx | (sx << 4)) & 252645135 AS sx FROM s1),
            s3 AS (SELECT l_partkey, l_suppkey,
                (px | (px << 2)) & 858993459 AS px,
                (sx | (sx << 2)) & 858993459 AS sx FROM s2),
            s4 AS (SELECT l_partkey, l_suppkey,
                (px | (px << 1)) & 1431655765 AS px,
                (sx | (sx << 1)) & 1431655765 AS sx FROM s3),
            zv AS (SELECT l_partkey, l_suppkey,
                (px | (sx << 1)) >> 26 AS z_bucket FROM s4)
            SELECT z_bucket, count(*) AS n_rows,
              min(l_partkey) AS min_part, max(l_partkey) AS max_part,
              min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
            FROM zv GROUP BY z_bucket ORDER BY z_bucket"""))

  /** Per-brand Pareto frontier (skyline) — minimize retail price while
    * maximizing size: a part is ON the frontier iff no other part of
    * the same brand has price <= AND size >= with one strict. The
    * 2-D skyline reduces to ONE window pass: order each brand by
    * (price asc, size desc, partkey asc) and keep rows whose size
    * strictly exceeds the running max over PRECEDING rows — everything
    * before the current row has price <=, so a preceding max-size >=
    * current size is exactly a dominator. Exact (price, size)
    * duplicates collapse to the lowest partkey (neither dominates the
    * other; the deterministic tiebreak keeps one representative — the
    * same convention in both engines' identical window specs).
    *
    * Scale shape: the window partitions by brand, so no global sort and
    * no single-partition frame — per-group state is one running max.
    * One shuffle on brand; map-side nothing to combine (row-level
    * verdicts).
    */
  val q168Skyline: Q = Q(
    "q168_skyline",
    (s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("price").asc, col("p_size").desc, col("p_partkey").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.load(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_size"),
          // decimal(15,2) cents -> exact bigint so the frontier verdict
          // never rides on float comparison
          (col("p_retailprice") * 100).cast("long").as("price"))
        .withColumn("max_size_before", max(col("p_size")).over(w))
        .filter(col("max_size_before").isNull ||
          col("p_size") > col("max_size_before"))
        .select(col("p_brand"), col("p_partkey"), col("price"),
          col("p_size"))
        .orderBy("p_brand", "price", "p_partkey")
    },
    Some("""WITH base AS (SELECT p_brand, p_partkey, p_size,
                CAST(p_retailprice * 100 AS BIGINT) AS price
              FROM part),
            flagged AS (SELECT p_brand, p_partkey, price, p_size,
                max(p_size) OVER (PARTITION BY p_brand
                  ORDER BY price ASC, p_size DESC, p_partkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS max_size_before
              FROM base)
            SELECT p_brand, p_partkey, price, p_size FROM flagged
            WHERE max_size_before IS NULL OR p_size > max_size_before
            ORDER BY p_brand, price, p_partkey"""))

  /** Benford first-significant-digit audit over `l_extendedprice` — the
    * classic fraud / synthetic-data smoke test: naturally-occurring
    * multi-scale amounts follow P(d) = log10(1 + 1/d), so a digit
    * histogram far from that curve flags fabricated or truncated data.
    * The first significant digit is extracted STRUCTURALLY (strip every
    * non-1-9 character from the decimal's canonical text form, take the
    * head) — never floor(log10(x)), whose float rounding misclassifies
    * exact powers of ten. Observed shares are exact integer ppm (floor
    * cross-multiplication); the Benford expectation ships as a 9-entry
    * integer-ppm table (301030 .. 45757 — it sums to exactly 1,000,000),
    * so the whole audit is BIGINT-exact end to end: no libm ln() whose
    * last-ulp behavior could differ between engines.
    *
    * Scale shape: one map-side-combined 9-group aggregate over a
    * single-column projection; the 1-row total joins back by broadcast.
    */
  val q182Benford: Q = Q(
    "q182_benford",
    (s, dir) => {
      val expPpm = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
        4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L,
        9 -> 45757L)
      val digit = substring(regexp_replace(
        col("l_extendedprice").cast("string"), "[^1-9]", ""), 1, 1)
        .cast("long")
      val g = Tables.load(s, dir, "lineitem")
        .select(digit.as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      val tot = g.agg(sum(col("n_obs")).as("n_total"))
      val exp = expPpm.foldLeft(when(lit(false), 0L)) {
        case (acc, (d, p)) => acc.when(col("digit") === d, p)
      }
      g.crossJoin(broadcast(tot))
        .select(col("digit"), col("n_obs"),
          expr("n_obs * 1000000 div n_total").as("obs_ppm"),
          exp.as("exp_ppm"),
          (expr("n_obs * 1000000 div n_total") - exp).as("delta_ppm"))
        .orderBy(col("digit"))
    },
    Some("""WITH d AS (SELECT CAST(substring(regexp_replace(
                  CAST(l_extendedprice AS VARCHAR), '[^1-9]', '', 'g'),
                  1, 1) AS BIGINT) AS digit
              FROM lineitem),
            g AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit),
            t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM g)
            SELECT digit, n_obs,
              n_obs * 1000000 // n_total AS obs_ppm,
              CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
                WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
                WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
                WHEN 9 THEN 45757 END AS exp_ppm,
              n_obs * 1000000 // n_total - CASE digit
                WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939
                WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947
                WHEN 7 THEN 57992 WHEN 8 THEN 51153 WHEN 9 THEN 45757
                END AS delta_ppm
            FROM g, t ORDER BY digit"""))

  /** Referential-integrity audit — orphan counts and exact-ppm orphan
    * rates across every foreign-key edge of the star schema in ONE
    * result: lineitem -> {orders, part, supplier}, orders -> customer,
    * {customer, supplier} -> nation, nation -> region. q09 proves the
    * anti-join operator on one edge; this is the DQ *report* a pipeline
    * gate consumes (the reference's quality layer checks emptiness and
    * row floors — plugins/data_quality_operator.py:60-66 — this is the
    * schema-wide cross-table generalization that layer lacks). Each
    * edge is `child LEFT ANTI JOIN parent` counted
    * against the child's total; edges are unioned with a stable edge
    * name so the report is one ordered relation.
    *
    * ## 100 TB notes
    * Dimension parents (nation, region, part, supplier, customer) reach
    * the anti-join by broadcast — no shuffle of the fact side; the one
    * fact-fact edge (lineitem -> orders) shuffles on orderkey exactly as
    * q09 does (bucketed co-location removes it on a real cluster). Each
    * edge's count is a 1-row map-side-combined aggregate; the union of
    * eight 1-row frames is free.
    */
  val q183OrphanAudit: Q = Q(
    "q183_orphan_audit",
    (s, dir) => {
      def edge(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String, bcast: Boolean): DataFrame = {
        val p = parent.select(col(pk))
        val par = if (bcast) broadcast(p) else p
        val orphans = child.select(col(ck))
          .join(par, col(ck) === col(pk), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        child.agg(count(lit(1)).as("n_child"))
          .crossJoin(broadcast(orphans))
          .select(lit(name).as("edge"), col("n_child"), col("n_orphans"),
            expr("n_orphans * 1000000 div n_child").as("orphan_ppm"))
      }
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val part = Tables.load(s, dir, "part")
      val supp = Tables.load(s, dir, "supplier")
      val cust = Tables.load(s, dir, "customer")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region")
      Seq(
        edge("customer->nation", cust, "c_nationkey", nat, "n_nationkey",
          bcast = true),
        edge("lineitem->orders", li, "l_orderkey", ord, "o_orderkey",
          bcast = false),
        edge("lineitem->part", li, "l_partkey", part, "p_partkey",
          bcast = true),
        edge("lineitem->supplier", li, "l_suppkey", supp, "s_suppkey",
          bcast = true),
        edge("nation->region", nat, "n_regionkey", reg, "r_regionkey",
          bcast = true),
        edge("orders->customer", ord, "o_custkey", cust, "c_custkey",
          bcast = true),
        edge("supplier->nation", supp, "s_nationkey", nat, "n_nationkey",
          bcast = true))
        .reduce(_.unionByName(_))
        .orderBy(col("edge"))
    },
    Some("""WITH e AS (
              SELECT 'customer->nation' AS edge,
                (SELECT count(*) FROM customer) AS n_child,
                (SELECT count(*) FROM customer c WHERE NOT EXISTS
                  (SELECT 1 FROM nation n
                   WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans
              UNION ALL
              SELECT 'lineitem->orders',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                  (SELECT 1 FROM orders o
                   WHERE o.o_orderkey = l.l_orderkey))
              UNION ALL
              SELECT 'lineitem->part',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                  (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
              UNION ALL
              SELECT 'lineitem->supplier',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                  (SELECT 1 FROM supplier s
                   WHERE s.s_suppkey = l.l_suppkey))
              UNION ALL
              SELECT 'nation->region',
                (SELECT count(*) FROM nation),
                (SELECT count(*) FROM nation n WHERE NOT EXISTS
                  (SELECT 1 FROM region r
                   WHERE r.r_regionkey = n.n_regionkey))
              UNION ALL
              SELECT 'orders->customer',
                (SELECT count(*) FROM orders),
                (SELECT count(*) FROM orders o WHERE NOT EXISTS
                  (SELECT 1 FROM customer c
                   WHERE c.c_custkey = o.o_custkey))
              UNION ALL
              SELECT 'supplier->nation',
                (SELECT count(*) FROM supplier),
                (SELECT count(*) FROM supplier s WHERE NOT EXISTS
                  (SELECT 1 FROM nation n
                   WHERE n.n_nationkey = s.s_nationkey)))
            SELECT edge, n_child, n_orphans,
              n_orphans * 1000000 // n_child AS orphan_ppm
            FROM e ORDER BY edge"""))

  /** Zone-map file-skipping audit — WHY data layout matters at 100 TB,
    * quantified: the same orders rows are assigned to files two ways
    * (arrival order `o_orderkey div 8192`, and weekly date partitions
    * `epoch_us div 7-days` — the layout a date-partitioned lake writes),
    * per-file min/max zone maps are computed for `o_orderdate`, and a
    * fixed 30-day predicate window (anchored at global-min + 300 days,
    * so it scales with the fixture) counts which files a scan could
    * SKIP outright (zone disjoint from the predicate range). Arrival
    * order leaves dates uncorrelated with files — near-zero skipping;
    * the date layout skips nearly everything. This is the measurement
    * behind q167's z-order layout and every `repartitionByRange` call
    * in the sinks: zone maps only prune when layout correlates with
    * the filter column.
    *
    * Scale shape: two map-side-combined aggregates keyed by file id
    * (file count ~ rows/8192 — bounded), a 1-row bounds broadcast, and
    * a 2-row union. Exact integer µs arithmetic throughout; rates in
    * exact ppm.
    */
  val q187ZonemapSkip: Q = Q(
    "q187_zonemap_skip",
    (s, dir) => {
      val weekUs = 7L * 86400L * 1000000L
      val dayUs = 86400L * 1000000L
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp_ltz")).as("d_us"))
      val bounds = o.agg(min(col("d_us")).as("gmin"))
        .select(col("gmin"),
          (col("gmin") + 300L * dayUs).as("lo"),
          (col("gmin") + 330L * dayUs).as("hi"))
      val rows = o.crossJoin(broadcast(bounds))
      def layout(name: String, fileId: Column): DataFrame =
        rows.groupBy(fileId.as("f"))
          .agg(min(col("d_us")).as("zmin"), max(col("d_us")).as("zmax"),
            count(lit(1)).as("n_rows"), min(col("lo")).as("lo"),
            min(col("hi")).as("hi"))
          .withColumn("skip", col("zmax") < col("lo") || col("zmin") > col("hi"))
          .agg(count(lit(1)).as("n_files"),
            count(when(col("skip"), 1)).as("n_skipped"),
            coalesce(sum(when(col("skip"), col("n_rows"))), lit(0L))
              .as("rows_skipped"))
          .select(lit(name).as("layout"), col("n_files"), col("n_skipped"),
            expr("n_skipped * 1000000 div n_files").as("skip_ppm"),
            col("rows_skipped"))
      layout("arrival", expr("o_orderkey div 8192"))
        .unionByName(layout("bydate", expr(s"d_us div $weekUs")))
        .orderBy(col("layout"))
    },
    Some("""WITH o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS d_us
              FROM orders),
            b AS (SELECT min(d_us) + 300 * 86400000000 AS lo,
                min(d_us) + 330 * 86400000000 AS hi FROM o),
            za AS (SELECT o_orderkey // 8192 AS f, min(d_us) AS zmin,
                max(d_us) AS zmax, count(*) AS n_rows
              FROM o GROUP BY 1),
            zd AS (SELECT d_us // 604800000000 AS f, min(d_us) AS zmin,
                max(d_us) AS zmax, count(*) AS n_rows
              FROM o GROUP BY 1),
            ra AS (SELECT 'arrival' AS layout, count(*) AS n_files,
                count(*) FILTER (zmax < lo OR zmin > hi) AS n_skipped,
                coalesce(sum(n_rows) FILTER (zmax < lo OR zmin > hi), 0)
                  AS rows_skipped
              FROM za, b),
            rd AS (SELECT 'bydate' AS layout, count(*) AS n_files,
                count(*) FILTER (zmax < lo OR zmin > hi) AS n_skipped,
                coalesce(sum(n_rows) FILTER (zmax < lo OR zmin > hi), 0)
                  AS rows_skipped
              FROM zd, b)
            SELECT layout, n_files, n_skipped,
              n_skipped * 1000000 // n_files AS skip_ppm,
              CAST(rows_skipped AS BIGINT) AS rows_skipped
            FROM (SELECT * FROM ra UNION ALL SELECT * FROM rd)
            ORDER BY layout"""))

  /** Mergeable fixed-grid quantile sketch with a PROVABLE error bound —
    * the quantile member of the sketch family (CMS q120 / Bloom q130 /
    * HLL q141): 256 equal-width integer-cent buckets between the global
    * min/max of `l_extendedprice` form a histogram whose per-partition
    * pieces merge by addition (the mergeability that matters on 1000
    * executors); the p50/p90/p99 estimate is the lower edge of the
    * first bucket whose cumulative count crosses the order-statistic
    * rank. Because the true order statistic lies INSIDE that bucket,
    * |estimate - exact| < bucket width by construction — the query
    * emits estimate, the exact quantile (q40's distinct-value
    * histogram-cumulative order statistic), the error, the bound, and
    * the per-row proof `within_bound`. All arithmetic is integer cents.
    *
    * Scale shape: one bounds pass + one 256-group histogram pass (both
    * map-side combined; the grid is fixed-width state like CMS), the
    * cumulative walks run over 256 / |distinct| rows; the exact side is
    * the expensive one at 100 TB — which is exactly the sketch's selling
    * point, and here it doubles as the oracle of the bound.
    */
  val q189QuantileSketch: Q = Q(
    "q189_quantile_sketch",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select((col("l_extendedprice") * 100).cast("long").as("v"))
      val bounds = li.agg(min(col("v")).as("gmin"), max(col("v")).as("gmax"),
          count(lit(1)).as("n"))
        .select(col("gmin"), col("n"),
          (expr("(gmax - gmin) div 256") + 1).as("wdt"))
      val withB = li.crossJoin(broadcast(bounds))
      val hist = withB
        .groupBy(expr("(v - gmin) div wdt").as("b"))
        .agg(count(lit(1)).as("c"), min(col("gmin")).as("gmin"),
          min(col("wdt")).as("wdt"), min(col("n")).as("n"))
        .withColumn("cum", sum(col("c")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val exactHist = li.groupBy(col("v")).agg(count(lit(1)).as("c"))
        .withColumn("cumv", sum(col("c")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(bounds.select(col("n").as("nv"))))
      val pcts = Seq(50, 90, 99)
      val estCols = pcts.map(p => min(when(col("cum") * 100 >= col("n") * p,
        col("gmin") + col("b") * col("wdt"))).as(s"est$p")) :+
        min(col("wdt")).as("bound")
      val est = hist.agg(estCols.head, estCols.tail: _*)
      val exactCols = pcts.map(p =>
        min(when(col("cumv") * 100 >= col("nv") * p, col("v")))
          .as(s"exact$p"))
      val exact = exactHist.agg(exactCols.head, exactCols.tail: _*)
      val joined = est.crossJoin(broadcast(exact))
      pcts.map { p =>
        joined.select(lit(p).as("pct"), col(s"est$p").as("est_cents"),
          col(s"exact$p").as("exact_cents"),
          abs(col(s"est$p") - col(s"exact$p")).as("abs_err"),
          col("bound"),
          (abs(col(s"est$p") - col(s"exact$p")) < col("bound"))
            .as("within_bound"))
      }.reduce(_.unionByName(_)).orderBy(col("pct"))
    },
    Some("""WITH li AS (SELECT CAST(l_extendedprice * 100 AS BIGINT) AS v
              FROM lineitem),
            b AS (SELECT min(v) AS gmin, count(*) AS n,
                (max(v) - min(v)) // 256 + 1 AS wdt FROM li),
            h AS (SELECT (v - gmin) // wdt AS bk, count(*) AS c
              FROM li, b GROUP BY 1),
            hc AS (SELECT bk, sum(c) OVER (ORDER BY bk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM h),
            est AS (SELECT
                min(CASE WHEN cum * 100 >= n * 50
                    THEN gmin + bk * wdt END) AS est50,
                min(CASE WHEN cum * 100 >= n * 90
                    THEN gmin + bk * wdt END) AS est90,
                min(CASE WHEN cum * 100 >= n * 99
                    THEN gmin + bk * wdt END) AS est99,
                min(wdt) AS bound
              FROM hc, b),
            vh AS (SELECT v, count(*) AS c FROM li GROUP BY v),
            vc AS (SELECT v, sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv
              FROM vh),
            ex AS (SELECT
                min(CASE WHEN cumv * 100 >= n * 50 THEN v END) AS exact50,
                min(CASE WHEN cumv * 100 >= n * 90 THEN v END) AS exact90,
                min(CASE WHEN cumv * 100 >= n * 99 THEN v END) AS exact99
              FROM vc, b)
            SELECT pct, est_cents, exact_cents,
              abs(est_cents - exact_cents) AS abs_err, bound,
              abs(est_cents - exact_cents) < bound AS within_bound
            FROM (
              SELECT 50 AS pct, est50 AS est_cents, exact50 AS exact_cents,
                bound FROM est, ex
              UNION ALL
              SELECT 90, est90, exact90, bound FROM est, ex
              UNION ALL
              SELECT 99, est99, exact99, bound FROM est, ex)
            ORDER BY pct"""))

  /** Bloom-pruned join audit — the runtime-filter pattern that saves
    * shuffle bytes at 100 TB, measured end to end: the build side
    * (BUILDING-segment customers) publishes a 8192-bit / 3-hash Bloom
    * set (q130's deterministic integer hash family — no RNG, identical
    * on any engine), the probe side (every orders row) is tested
    * against it BEFORE the real join would shuffle, and the audit
    * reports exactly what the filter earned: probe rows, true matches
    * (the semi-join ground truth), Bloom-passing rows, false-positive
    * rows (pass - true; one-sided — Bloom never drops a true match,
    * and the spec asserts FN = 0 structurally via pass >= true), the
    * FP rate among true negatives, and the fraction of probe rows
    * pruned — all exact-integer ppm.
    *
    * ## 100 TB notes
    * This is precisely Spark's `spark.sql.optimizer.runtime.bloomFilter`
    * mechanics made explicit and auditable: the bitset is
    * dimension-sized and broadcast (the distinct-bit table is <= 8192
    * rows regardless of build cardinality); the probe side is touched
    * map-side only — one explode x3 bounded expansion against a
    * broadcast, no shuffle of unpruned fact rows anywhere in the
    * filter evaluation.
    */
  val q196BloomJoinAudit: Q = Q(
    "q196_bloom_join_audit",
    (s, dir) => {
      val hashes = 3L
      val bits = 8192L
      val prime = 2147483647L
      def pos(k: Column, i: Column): Column =
        (k * (i * 1048573L + 7L) + (i * 2097143L + 31L)) % prime % bits
      val is = sequence(lit(0L), lit(hashes - 1))
      val build = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val bitset = build.select(explode(is).as("i"), col("c_custkey"))
        .select(pos(col("c_custkey"), col("i")).as("b"))
        .distinct()
      val probe = Tables.load(s, dir, "orders").select(col("o_custkey"))
      val keys = Tables.eager(probe.distinct())
      val pass = keys.select(col("o_custkey"), explode(is).as("i"))
        .join(broadcast(bitset), pos(col("o_custkey"), col("i")) === col("b"),
          "left")
        .groupBy(col("o_custkey"))
        .agg((count(col("b")) === hashes).as("pass"))
      val truth = keys
        .join(build.select(col("c_custkey").as("o_custkey")),
          Seq("o_custkey"), "left_semi")
        .select(col("o_custkey"), lit(true).as("hit"))
      val flagged = probe
        .join(broadcast(pass), Seq("o_custkey"))
        .join(broadcast(truth), Seq("o_custkey"), "left")
        .select(col("pass"), coalesce(col("hit"), lit(false)).as("hit"))
      val nb = build.agg(count(lit(1)).as("n_build"))
      flagged.agg(count(lit(1)).as("n_probe"),
          count(when(col("hit"), 1)).as("n_true"),
          count(when(col("pass"), 1)).as("n_pass"))
        .crossJoin(broadcast(nb))
        .select(col("n_build"), col("n_probe"), col("n_true"),
          col("n_pass"), (col("n_pass") - col("n_true")).as("n_fp"),
          expr("(n_pass - n_true) * 1000000 div (n_probe - n_true)")
            .as("fp_ppm"),
          expr("(n_probe - n_pass) * 1000000 div n_probe")
            .as("pruned_ppm"))
    },
    Some("""WITH build AS (SELECT c_custkey FROM customer
                           WHERE c_mktsegment = 'BUILDING'),
            hh AS (SELECT unnest(generate_series(0, 2)) AS i),
            bitset AS (SELECT DISTINCT
                (c_custkey * (i * 1048573 + 7) + (i * 2097143 + 31))
                  % 2147483647 % 8192 AS b
              FROM build CROSS JOIN hh),
            keys AS (SELECT DISTINCT o_custkey FROM orders),
            pass AS (SELECT o_custkey, count(b) = 3 AS pass
              FROM (SELECT k.o_custkey, bs.b
                    FROM keys k CROSS JOIN hh
                    LEFT JOIN bitset bs ON
                      (k.o_custkey * (hh.i * 1048573 + 7)
                        + (hh.i * 2097143 + 31)) % 2147483647 % 8192 = bs.b)
              GROUP BY o_custkey),
            truth AS (SELECT o_custkey, true AS hit FROM keys
                      WHERE o_custkey IN (SELECT c_custkey FROM build)),
            flagged AS (SELECT p.pass, coalesce(t.hit, false) AS hit
              FROM orders o
              JOIN pass p ON p.o_custkey = o.o_custkey
              LEFT JOIN truth t ON t.o_custkey = o.o_custkey),
            agg AS (SELECT count(*) AS n_probe,
                count(CASE WHEN hit THEN 1 END) AS n_true,
                count(CASE WHEN pass THEN 1 END) AS n_pass
              FROM flagged),
            nb AS (SELECT count(*) AS n_build FROM build)
            SELECT n_build, n_probe, n_true, n_pass,
              n_pass - n_true AS n_fp,
              (n_pass - n_true) * 1000000 // (n_probe - n_true) AS fp_ppm,
              (n_probe - n_pass) * 1000000 // n_probe AS pruned_ppm
            FROM agg, nb"""))

  /** Join-cardinality estimator audit — the textbook CBO formula
    * |A JOIN B| ~= |A|*|B| / max(ndv_A, ndv_B) (uniform-containment
    * assumption, System R) evaluated against the ACTUAL join count for
    * the three fact joins of the star. Per edge: the four exact input
    * statistics, the estimate (exact integer floor division of exact
    * integers — the formula itself), the true count, and the signed
    * error in exact ppm of actual. This is the audit a planner's
    * statistics pipeline runs to decide whether column NDVs are stale:
    * TPC-H-shaped data is nearly uniform, so errors are small; skewed
    * production keys blow the formula up — visibly, in one row.
    *
    * ## 100 TB notes
    * Inputs are map-side-combined count/approx-free NDV aggregates
    * (exact distinct — at 100 TB you'd substitute the HLL the q141
    * family provides; the AUDIT shape is unchanged); the actual join
    * count per edge is the same shuffle the real query would pay, which
    * is the point — run it once, trust the estimator until drift.
    */
  val q202JoinCardAudit: Q = Q(
    "q202_join_card_audit",
    (s, dir) => {
      def edge(name: String, a: DataFrame, ak: String, b: DataFrame,
          bk: String): DataFrame = {
        val sa = a.agg(count(lit(1)).as("na"),
          count_distinct(col(ak)).as("nda"))
        val sb = b.agg(count(lit(1)).as("nb"),
          count_distinct(col(bk)).as("ndb"))
        val actual = a.select(col(ak))
          .join(b.select(col(bk)), col(ak) === col(bk))
          .agg(count(lit(1)).as("actual"))
        sa.crossJoin(broadcast(sb)).crossJoin(broadcast(actual))
          .select(lit(name).as("edge"), col("na"), col("nb"),
            greatest(col("nda"), col("ndb")).as("ndv_max"),
            expr("(na * nb) div greatest(nda, ndb)").as("est"),
            col("actual"),
            expr("((na * nb) div greatest(nda, ndb) - actual) * 1000000 " +
              "div actual").as("err_ppm"))
      }
      val li = Tables.load(s, dir, "lineitem")
      Seq(
        edge("lineitem-orders", li, "l_orderkey",
          Tables.load(s, dir, "orders"), "o_orderkey"),
        edge("lineitem-part", li, "l_partkey",
          Tables.load(s, dir, "part"), "p_partkey"),
        edge("orders-customer", Tables.load(s, dir, "orders"), "o_custkey",
          Tables.load(s, dir, "customer"), "c_custkey"))
        .reduce(_.unionByName(_))
        .orderBy(col("edge"))
    },
    Some("""WITH e AS (
              SELECT 'lineitem-orders' AS edge,
                (SELECT count(*) FROM lineitem) AS na,
                (SELECT count(*) FROM orders) AS nb,
                greatest((SELECT count(DISTINCT l_orderkey) FROM lineitem),
                  (SELECT count(DISTINCT o_orderkey) FROM orders))
                  AS ndv_max,
                (SELECT count(*) FROM lineitem
                 JOIN orders ON l_orderkey = o_orderkey) AS actual
              UNION ALL
              SELECT 'lineitem-part',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM part),
                greatest((SELECT count(DISTINCT l_partkey) FROM lineitem),
                  (SELECT count(DISTINCT p_partkey) FROM part)),
                (SELECT count(*) FROM lineitem
                 JOIN part ON l_partkey = p_partkey)
              UNION ALL
              SELECT 'orders-customer',
                (SELECT count(*) FROM orders),
                (SELECT count(*) FROM customer),
                greatest((SELECT count(DISTINCT o_custkey) FROM orders),
                  (SELECT count(DISTINCT c_custkey) FROM customer)),
                (SELECT count(*) FROM orders
                 JOIN customer ON o_custkey = c_custkey))
            SELECT edge, na, nb, ndv_max,
              (na * nb) // ndv_max AS est, actual,
              ((na * nb) // ndv_max - actual) * 1000000 // actual
                AS err_ppm
            FROM e ORDER BY edge"""))

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

  /** ABC inventory classification — the 80/95 cumulative-revenue-share
    * partition of the part catalog (A: the head that earns the first
    * 80 %, B: to 95 %, C: the long tail), the warehousing classic that
    * q155's single Pareto point generalizes: q155 answers "how many
    * users cover 80 %?", this CLASSIFIES every part and rolls the
    * classes up. Revenue is exact integer cents (floor(x*100), q155's
    * discipline); the class boundary test is pure integer
    * cross-multiplication on the running total (cum*100 <= tot*80), so
    * no float ever decides a class; share is one double division per
    * class row.
    *
    * ## 100 TB notes
    * Per-part revenue is one map-side-combined shuffle on partkey; the
    * ranked cumulative walk runs over the |parts|-sized aggregate via
    * [[graft.engine.Cumulative.rankedCumSum]] (range-partitioned
    * two-phase prefix sum — no single-partition window; ties broken by
    * partkey, well-defined on both engines); the global total is a
    * 1-row broadcast attach; the class rollup is 3 rows. Same shape as
    * q155, a proven scale plan.
    */
  val q214AbcClasses: Q = Q(
    "q214_abc_classes",
    (s, dir) => {
      val perPart = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
          .as("cents"))
      val cumulative = graft.engine.Cumulative.rankedCumSum(perPart,
        Seq(col("cents").desc, col("l_partkey").asc), col("cents"))
      val total = perPart.agg(sum(col("cents")).as("tot")) // 1 row
      val ranked = cumulative.crossJoin(broadcast(total))
      ranked
        .withColumn("abc_class",
          when(col("cum") * 100 <= col("tot") * 80, "A")
            .when(col("cum") * 100 <= col("tot") * 95, "B")
            .otherwise("C"))
        .groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"),
          max(col("tot")).as("tot"))
        .select(col("abc_class"), col("n_parts"), col("cents"),
          (col("cents").cast("double") / col("tot").cast("double"))
            .as("share"))
        .orderBy(col("abc_class"))
    },
    Some("""WITH pp AS (SELECT l_partkey,
                CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM lineitem GROUP BY l_partkey),
            r AS (SELECT l_partkey, cents,
                sum(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(cents) OVER () AS tot
              FROM pp),
            c AS (SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                              WHEN cum * 100 <= tot * 95 THEN 'B'
                              ELSE 'C' END AS abc_class,
                         cents, tot
                  FROM r)
            SELECT abc_class, count(*) AS n_parts,
              CAST(sum(cents) AS BIGINT) AS cents,
              CAST(sum(cents) AS DOUBLE) / CAST(max(tot) AS DOUBLE) AS share
            FROM c GROUP BY abc_class ORDER BY abc_class"""))

  /** One-way ANOVA — is the weekday effect on DAILY revenue real?
    * q211 reports the per-weekday seasonal indices; this tests whether
    * the between-weekday variation exceeds what within-weekday noise
    * explains — the F-statistic gate before anyone acts on a seasonal
    * table, completing the inference family (q148 z, q128/q188 chi2,
    * q192 KS) with the k-group mean comparison.
    *
    * Determinism: daily revenues are exact integer cents; all moments
    * (per-group sums/counts via conditional aggregation, global sum of
    * squares in decimal(38,0) — q161's discipline) are exact; the
    * between-group term sum_g Sg^2/ng is assembled as an EXPLICIT
    * 7-term left-fold of doubles (t0+t1+...+t6 in one expression tree)
    * rather than any windowed accumulation, because windowed double
    * sums don't pin associativity order across engines (DuckDB's
    * segment-tree window combine vs Spark's sequential add). Absent
    * weekdays contribute exactly 0.0 and drop out of k.
    *
    * ## 100 TB notes
    * Two map-side-combined aggregations (daily rollup, then ONE global
    * row with 16 conditional moments) — no joins, no windows, nothing
    * data-scale past the daily rollup's date-keyed shuffle.
    */
  val q216AnovaDow: Q = Q(
    "q216_anova_dow",
    (s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        .select((dayofweek(col("d")) - 1).cast("long").as("dow"),
          col("cents"))
      def D(c: Column) = c.cast("decimal(38,0)")
      val groupAggs = (0 to 6).flatMap { i =>
        Seq(sum(when(col("dow") === i, col("cents")).otherwise(0L))
            .as(s"s$i"),
          sum(when(col("dow") === i, 1L).otherwise(0L)).as(s"g$i"))
      }
      val aggs = Seq(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(D(col("cents")) * D(col("cents"))).as("sq")) ++ groupAggs
      val m = daily.agg(aggs.head, aggs.tail: _*)
      val terms = (0 to 6).map { i =>
        when(col(s"g$i") > 0,
          (col(s"s$i").cast("double") * col(s"s$i").cast("double")) /
            col(s"g$i").cast("double")).otherwise(lit(0.0))
      }
      val t = terms.reduceLeft(_ + _) // fixed left-fold: ((t0+t1)+...)+t6
      val k = (0 to 6).map(i =>
        when(col(s"g$i") > 0, 1L).otherwise(0L)).reduceLeft(_ + _)
      m.withColumn("t", t).withColumn("k", k)
        .select(col("n").as("n_days"), col("k"),
          (col("t") - (col("s").cast("double") * col("s").cast("double")) /
            col("n").cast("double")).as("ssb"),
          (col("sq").cast("double") - col("t")).as("ssw"))
        .withColumn("f_stat",
          (col("ssb") / (col("k") - 1).cast("double")) /
            (col("ssw") / (col("n_days") - col("k")).cast("double")))
        .select(col("n_days"), col("k"), col("ssb"), col("ssw"),
          col("f_stat"))
    },
    Some {
      val filterSums = (0 to 6).map { i =>
        s"""CAST(sum(cents) FILTER (dow = $i) AS BIGINT) AS s$i,
            CAST(count(*) FILTER (dow = $i) AS BIGINT) AS g$i"""
      }.mkString(",\n                ")
      val terms = (0 to 6).map { i =>
        s"""CASE WHEN g$i > 0
                 THEN (CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE))
                      / CAST(g$i AS DOUBLE) ELSE 0.0 END"""
      }.reduceLeft((a, b) => s"($a + $b)")
      val k = (0 to 6).map(i => s"CASE WHEN g$i > 0 THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM orders GROUP BY 1),
            dd AS (SELECT CAST(dayofweek(d) AS BIGINT) AS dow, cents
                   FROM daily),
            m AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS s,
                sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS sq,
                $filterSums
              FROM dd),
            e AS (SELECT n, CAST($k AS BIGINT) AS k,
                $terms AS t, s, sq FROM m),
            r AS (SELECT n AS n_days, k,
                t - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                    / CAST(n AS DOUBLE) AS ssb,
                CAST(sq AS DOUBLE) - t AS ssw
              FROM e)
            SELECT n_days, k, ssb, ssw,
              (ssb / CAST(k - 1 AS DOUBLE))
                / (ssw / CAST(n_days - k AS DOUBLE)) AS f_stat
            FROM r"""
    })

  /** Supplier-concentration HHI per nation — the Herfindahl-Hirschman
    * index procurement and antitrust teams compute to flag fragile
    * single-supplier markets: per nation, the sum of squared revenue
    * shares of its suppliers. HHI needs no float shares at all:
    * sum(c_i^2) / (sum c_i)^2 with revenue in exact integer cents,
    * squares accumulated in decimal(38,0) (q161's discipline), ONE
    * double division at the end — 1/n_suppliers = perfectly
    * fragmented, 1.0 = monopoly.
    *
    * ## 100 TB notes
    * Supplier revenue is one map-side-combined shuffle on l_suppkey;
    * the supplier->nation attach is AQE-broadcast (supplier is a
    * dimension); nation name joins off a fixed 25-row broadcast. The
    * per-nation moment rollup is map-side combined on a 25-value key.
    */
  val q217SupplierHhi: Q = Q(
    "q217_supplier_hhi",
    (s, dir) => {
      def D(c: Column) = c.cast("decimal(38,0)")
      val suppRev = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
          .as("cents"))
      val supp = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val nation = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      suppRev.join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("cents")).as("total_cents"),
          sum(D(col("cents")) * D(col("cents"))).as("sumsq"))
        .select(col("n_name"), col("n_suppliers"), col("total_cents"),
          (col("sumsq").cast("double") /
            (col("total_cents").cast("double") *
              col("total_cents").cast("double"))).as("hhi"))
        .orderBy(col("n_name"))
    },
    Some("""WITH sr AS (SELECT l_suppkey,
                CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM lineitem GROUP BY l_suppkey)
            SELECT n_name, count(*) AS n_suppliers,
              CAST(sum(cents) AS BIGINT) AS total_cents,
              CAST(sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT))
                   AS DOUBLE)
                / (CAST(sum(cents) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
                AS hhi
            FROM sr JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

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

  /** Type-7 interpolated quantiles — the LINEAR-interpolation quantile
    * definition (R's default, NumPy's 'linear') per order priority:
    * q40 returns exact ORDER STATISTICS (a value that exists in the
    * data) and q189 a bounded sketch; type-7 is the third semantics —
    * h = (n-1)p lands between ranks and the estimate blends the two
    * neighbors — and the one most tooling reports, so an engine that
    * can't reproduce it can't cross-check reports. Values are exact
    * integer cents; h, the blend fraction, and the interpolation are
    * ONE fixed double op tree; rank picks are integer comparisons
    * (floor(h)+1 against a row_number), ties collapse harmlessly
    * because equal ranks carry equal values.
    *
    * ## 100 TB notes
    * One shuffle partitions by priority; the rank window and the three
    * conditional picks ride it. At real scale the per-group sort is
    * the cost — the same cost any exact quantile pays — and the
    * histogram-compression trick (q40's distinct-value walk) applies
    * unchanged if values repeat heavily.
    */
  val q223QuantileInterp: Q = Q(
    "q223_quantile_interp",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val byP = Window.partitionBy(col("o_orderpriority"))
      val ranked = o
        .withColumn("rn", row_number().over(byP.orderBy(col("cents").asc)))
        .withColumn("n", count(lit(1)).over(byP))
      def pick(p: Double): Column = {
        val h = (col("n") - 1).cast("double") * lit(p)
        val lo = floor(h).cast("long") + 1
        val xlo = min(when(col("rn") === lo, col("cents")))
        val xhi = coalesce(min(when(col("rn") === lo + 1, col("cents"))),
          min(when(col("rn") === lo, col("cents"))))
        val hAgg = (max(col("n")) - 1).cast("double") * lit(p)
        xlo.cast("double") +
          (hAgg - floor(hAgg)) * (xhi.cast("double") - xlo.cast("double"))
      }
      ranked.groupBy(col("o_orderpriority"))
        .agg(max(col("n")).as("n"), pick(0.5).as("p50"),
          pick(0.9).as("p90"), pick(0.99).as("p99"))
        .orderBy(col("o_orderpriority"))
    },
    Some {
      def pick(p: Double): String =
        s"""(max(CASE WHEN rn = floor((n - 1) * $p)::BIGINT + 1
                 THEN cents END)::DOUBLE
             + ((max(n) - 1)::DOUBLE * $p
                - floor((max(n) - 1)::DOUBLE * $p))
               * (coalesce(
                    max(CASE WHEN rn = floor((n - 1) * $p)::BIGINT + 2
                        THEN cents END),
                    max(CASE WHEN rn = floor((n - 1) * $p)::BIGINT + 1
                        THEN cents END))::DOUBLE
                  - max(CASE WHEN rn = floor((n - 1) * $p)::BIGINT + 1
                        THEN cents END)::DOUBLE))"""
      s"""WITH o AS (SELECT o_orderpriority,
                CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders),
            r AS (SELECT o_orderpriority, cents,
                row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY cents ASC) AS rn,
                count(*) OVER (PARTITION BY o_orderpriority) AS n
              FROM o)
            SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
              ${pick(0.5)} AS p50, ${pick(0.9)} AS p90,
              ${pick(0.99)} AS p99
            FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority"""
    })

  /** Gini mean difference and Gini coefficient of order value per
    * priority — revenue inequality measured properly: the mean
    * absolute difference between two random orders, and its normalized
    * form (0 = all orders equal, ->1 = one order carries everything).
    * The naive definition is an all-pairs |xi - xj| average — O(n^2)
    * and a scale-killer; the rank identity sum((2i - n - 1) * x_(i))
    * computes it EXACTLY from one sort: each sorted value is counted
    * +1 against everything below it and -1 against everything above.
    * Tie order between equal values cannot change the sum (equal
    * coefficients apply to equal values). Weighted rank-sum in
    * decimal(38,0) (q161's discipline), two fixed double op trees.
    * q127's "gini" is Simpson diversity over categories — different
    * statistic; this is the wealth/concentration Gini.
    *
    * ## 100 TB notes
    * One shuffle on priority, one rank window on it, one
    * map-side-combined moment rollup. The O(n^2) pair join never
    * exists — that is the point.
    */
  val q224GiniMeanDiff: Q = Q(
    "q224_gini_mean_diff",
    (s, dir) => {
      def D(c: Column) = c.cast("decimal(38,0)")
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val byP = Window.partitionBy(col("o_orderpriority"))
      val ranked = o
        .withColumn("rn", row_number().over(byP.orderBy(col("cents").asc)))
        .withColumn("n", count(lit(1)).over(byP))
      ranked.groupBy(col("o_orderpriority"))
        .agg(max(col("n")).as("n"), sum(col("cents")).as("total_cents"),
          sum(D((col("rn") * 2 - col("n") - 1)) * D(col("cents")))
            .as("num"))
        .select(col("o_orderpriority"), col("n"), col("total_cents"),
          (col("num").cast("double") * 2.0 /
            (col("n") * (col("n") - 1)).cast("double")).as("gmd_cents"),
          (col("num").cast("double") /
            (col("n").cast("double") * col("total_cents").cast("double")))
            .as("gini"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH o AS (SELECT o_orderpriority,
                CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders),
            r AS (SELECT o_orderpriority, cents,
                row_number() OVER (PARTITION BY o_orderpriority
                  ORDER BY cents ASC) AS rn,
                count(*) OVER (PARTITION BY o_orderpriority) AS n
              FROM o)
            SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
              CAST(sum(cents) AS BIGINT) AS total_cents,
              CAST(sum(CAST(rn * 2 - n - 1 AS HUGEINT)
                       * CAST(cents AS HUGEINT)) AS DOUBLE) * 2.0
                / CAST(max(n) * (max(n) - 1) AS DOUBLE) AS gmd_cents,
              CAST(sum(CAST(rn * 2 - n - 1 AS HUGEINT)
                       * CAST(cents AS HUGEINT)) AS DOUBLE)
                / (CAST(max(n) AS DOUBLE) * CAST(sum(cents) AS DOUBLE))
                AS gini
            FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Return-rate SPC by brand — the supplier-quality control chart: per
    * part brand, the return rate with its z-score against the GLOBAL
    * rate under the null that brands share one rate (the p-chart test;
    * |z| > 3 is the classic out-of-control signal that triggers a
    * supplier review). Counts and ppm are exact integers; p-hat, p0,
    * and z are one fixed double op tree; the global totals window over
    * the |brands|-sized aggregate.
    *
    * ## 100 TB notes
    * lineitem joins part on partkey (dimension-sized build side — AQE
    * broadcasts it); one map-side-combined rollup on brand; the global
    * window runs over the tiny brand aggregate. Scan-bound.
    */
  val q225ReturnRate: Q = Q(
    "q225_return_rate",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_returnflag"))
      val part = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val perBrand = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returned"))
      val wAll = Window.partitionBy(lit(1))
      perBrand
        .withColumn("gn", sum(col("n_lines")).over(wAll))
        .withColumn("gr", sum(col("n_returned")).over(wAll))
        .select(col("p_brand"), col("n_lines"), col("n_returned"),
          expr("n_returned * 1000000 div n_lines").as("return_ppm"),
          ((col("n_returned").cast("double") / col("n_lines").cast("double")
            - col("gr").cast("double") / col("gn").cast("double")) /
            sqrt((col("gr").cast("double") / col("gn").cast("double") *
              (lit(1.0) - col("gr").cast("double") / col("gn").cast("double")))
              / col("n_lines").cast("double"))).as("z"))
        .orderBy(col("p_brand"))
    },
    Some("""WITH pb AS (SELECT p_brand, count(*) AS n_lines,
                CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returned
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY p_brand)
            SELECT p_brand, n_lines, n_returned,
              n_returned * 1000000 // n_lines AS return_ppm,
              ((CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE)
                - CAST(sum(n_returned) OVER () AS DOUBLE)
                  / CAST(sum(n_lines) OVER () AS DOUBLE))
               / sqrt((CAST(sum(n_returned) OVER () AS DOUBLE)
                         / CAST(sum(n_lines) OVER () AS DOUBLE)
                       * (1.0 - CAST(sum(n_returned) OVER () AS DOUBLE)
                           / CAST(sum(n_lines) OVER () AS DOUBLE)))
                      / CAST(n_lines AS DOUBLE))) AS z
            FROM pb ORDER BY p_brand"""))

  /** Shipping-lag SLA audit — order-to-ship latency per priority in
    * whole days, with the discrete p50/p95 (q40's exact order-statistic
    * walk over the lag histogram) and the share of lines breaching a
    * 90-day SLA in exact ppm. The fulfillment dashboard: urgent
    * priorities are SUPPOSED to show smaller quantiles — this makes the
    * claim checkable. Every column is an exact integer; no floats
    * anywhere.
    *
    * ## 100 TB notes
    * The lineitem-orders join shuffles on orderkey (bucketable); lags
    * collapse to a (priority, lag_days) histogram FIRST (map-side
    * combined, bounded by priorities x distinct lags), and the
    * quantile walk windows over that histogram, never over raw lines.
    */
  val q226ShipSla: Q = Q(
    "q226_ship_sla",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (unix_micros(col("l_shipdate").cast("timestamp_ltz"))
            / lit(86400000000L)).cast("long").as("ship_day"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          (unix_micros(col("o_orderdate").cast("timestamp_ltz"))
            / lit(86400000000L)).cast("long").as("order_day"))
      val lags = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          (col("ship_day") - col("order_day")).as("lag_days"))
      val hist = lags.groupBy(col("o_orderpriority"), col("lag_days"))
        .agg(count(lit(1)).as("c"))
      val byP = Window.partitionBy(col("o_orderpriority"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(
          byP.orderBy(col("lag_days"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(byP))
      def pick(p: Double) =
        min(when(col("cum") >= ceil(col("n") * p), col("lag_days")))
      cum.groupBy(col("o_orderpriority"))
        .agg(max(col("n")).as("n_lines"),
          min(col("lag_days")).as("min_days"),
          pick(0.5).as("p50_days"), pick(0.95).as("p95_days"),
          max(col("lag_days")).as("max_days"),
          sum(when(col("lag_days") > 90, col("c")).otherwise(0L))
            .as("n_breach"))
        .withColumn("breach_ppm", expr("n_breach * 1000000 div n_lines"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH lg AS (SELECT o_orderpriority,
                epoch_us(l_shipdate) // 86400000000
                  - epoch_us(o_orderdate) // 86400000000 AS lag_days
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            h AS (SELECT o_orderpriority, lag_days, count(*) AS c
                  FROM lg GROUP BY 1, 2),
            cu AS (SELECT *,
                sum(c) OVER (PARTITION BY o_orderpriority ORDER BY lag_days
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(c) OVER (PARTITION BY o_orderpriority) AS n
              FROM h)
            SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n_lines,
              min(lag_days) AS min_days,
              min(CASE WHEN cum >= ceil(n * 0.5) THEN lag_days END)
                AS p50_days,
              min(CASE WHEN cum >= ceil(n * 0.95) THEN lag_days END)
                AS p95_days,
              max(lag_days) AS max_days,
              CAST(sum(CASE WHEN lag_days > 90 THEN c ELSE 0 END) AS BIGINT)
                AS n_breach,
              CAST(sum(CASE WHEN lag_days > 90 THEN c ELSE 0 END) AS BIGINT)
                * 1000000 // CAST(max(n) AS BIGINT) AS breach_ppm
            FROM cu GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

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

  /** Leave-one-out target-encoding audit — target encoding (replace a
    * category with its mean target) is the highest-leakage feature
    * transform in tabular ML: encoding row i with a mean that INCLUDES
    * row i leaks the label. The LOO fix encodes i as
    * (S_c - x_i)/(n_c - 1), and this audit reports, per market
    * segment, the encoding's full behavior envelope: the naive mean,
    * the LOO extremes (min = (S - max_x)/(n-1), max = (S - min_x)/
    * (n-1) — numerators are exact integer cents), and the worst-case
    * leakage gap |naive - loo| either extreme realizes. A gap that
    * rivals between-segment spread means the encoder is memorizing
    * rows, not segments. Customers with no orders count with spend 0
    * (left join), not dropped — dropping them would shift every mean.
    *
    * ## 100 TB notes
    * One shuffle aggregates spend per customer; the segment rollup is
    * map-side combined on a 5-value key; extremes come from min/max in
    * the same aggregate — no per-row encoded output ever materializes.
    */
  val q230TargetEncoding: Q = Q(
    "q230_target_encoding",
    (s, dir) => {
      val spend = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val x = cust.join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_mktsegment"),
          coalesce(col("cents"), lit(0L)).as("x"))
      x.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_cents"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"))
        .select(col("c_mktsegment"), col("n"), col("sum_cents"),
          (col("sum_cents").cast("double") / col("n").cast("double"))
            .as("naive_mean"),
          ((col("sum_cents") - col("max_x")).cast("double") /
            (col("n") - 1).cast("double")).as("min_loo"),
          ((col("sum_cents") - col("min_x")).cast("double") /
            (col("n") - 1).cast("double")).as("max_loo"))
        .withColumn("max_leak_gap",
          greatest(abs(col("naive_mean") - col("min_loo")),
            abs(col("naive_mean") - col("max_loo"))))
        .orderBy(col("c_mktsegment"))
    },
    Some("""WITH sp AS (SELECT o_custkey,
                CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM orders GROUP BY o_custkey),
            x AS (SELECT c_mktsegment, coalesce(cents, 0) AS x
                  FROM customer LEFT JOIN sp ON c_custkey = o_custkey),
            g AS (SELECT c_mktsegment, count(*) AS n,
                CAST(sum(x) AS BIGINT) AS sum_cents,
                min(x) AS min_x, max(x) AS max_x
              FROM x GROUP BY c_mktsegment),
            e AS (SELECT c_mktsegment, n, sum_cents,
                CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE) AS naive_mean,
                CAST(sum_cents - max_x AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                  AS min_loo,
                CAST(sum_cents - min_x AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                  AS max_loo
              FROM g)
            SELECT c_mktsegment, n, sum_cents, naive_mean, min_loo, max_loo,
              greatest(abs(naive_mean - min_loo), abs(naive_mean - max_loo))
                AS max_leak_gap
            FROM e ORDER BY c_mktsegment"""))

  /** Drill-across — revenue per region computed from TWO fact tables
    * through the conformed customer->nation->region dimension chain:
    * path A rolls up order HEADERS (o_totalprice), path B rolls up
    * LINES (extendedprice x (1-disc) x (1+tax)); a real BI deployment
    * answers "revenue by region" from whichever mart is handy, so the
    * drill-across delta (exact signed ppm) is the number that says
    * whether those answers agree — the multi-fact conformance check
    * q227 does per-order, lifted to the reporting grain. Both paths
    * accumulate in decimal and round to cents IN DECIMAL; the ppm is
    * integer cross-multiplication on the cent values.
    *
    * ## 100 TB notes
    * Each path is a fact scan with broadcast dimension attaches
    * (nation/region fixed-size, customer AQE-decided); the final
    * region-grain join is 5 rows x 5 rows. Two scans total — the
    * irreducible drill-across cost.
    */
  val q235DrillAcross: Q = Q(
    "q235_drill_across",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val nation = Tables.load(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))
      val region = Tables.load(s, dir, "region")
        .select(col("r_regionkey"), col("r_name"))
      val custRegion = cust
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("r_name"))
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val pathA = orders
        .join(custRegion, col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"))
        .agg((round(sum(col("o_totalprice").cast("decimal(30,10)")), 2)
          * 100).cast("long").as("hdr_cents"))
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).as("net"))
      val pathB = li
        .join(orders.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(custRegion, col("o_custkey") === col("c_custkey"))
        .groupBy(col("r_name"))
        .agg((round(sum(col("net").cast("decimal(30,10)")), 2) * 100)
          .cast("long").as("line_cents"))
      pathA.join(pathB, Seq("r_name"))
        .select(col("r_name"), col("hdr_cents"), col("line_cents"),
          expr("(line_cents - hdr_cents) * 1000000 div hdr_cents")
            .as("delta_ppm"))
        .orderBy(col("r_name"))
    },
    Some("""WITH cr AS (SELECT c_custkey, r_name
              FROM customer JOIN nation ON c_nationkey = n_nationkey
                            JOIN region ON n_regionkey = r_regionkey),
            pa AS (SELECT r_name,
                CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,10))), 2)
                  * 100 AS BIGINT) AS hdr_cents
              FROM orders JOIN cr ON o_custkey = c_custkey
              GROUP BY r_name),
            pb AS (SELECT r_name,
                CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                    * (1.0 + l_tax) AS DECIMAL(30,10))), 2) * 100
                  AS BIGINT) AS line_cents
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                            JOIN cr ON o_custkey = c_custkey
              GROUP BY r_name)
            SELECT pa.r_name, hdr_cents, line_cents,
              (line_cents - hdr_cents) * 1000000 // hdr_cents AS delta_ppm
            FROM pa JOIN pb ON pa.r_name = pb.r_name
            ORDER BY pa.r_name"""))

  /** Join fan-out profile — the EMPIRICAL group-size distribution of
    * the three star FK edges (orders per customer, lines per order,
    * lines per part): q202 audits what the optimizer's uniform
    * formula PREDICTS; this is what the data actually does, and the
    * p99/max tail is the number that decides salting (q115) and
    * skew-split (AQE) thresholds. Quantiles are exact discrete order
    * statistics walked over the (edge, group-size) histogram — the
    * same q40 machinery — so every column is an exact integer.
    *
    * ## 100 TB notes
    * Each edge is one map-side-combined count on its key; sizes then
    * collapse to an (edge, size) histogram BEFORE the quantile walk,
    * so the window runs over distinct sizes, never over groups.
    */
  val q236FanoutProfile: Q = Q(
    "q236_fanout_profile",
    (s, dir) => {
      def sizes(df: DataFrame, key: String, edge: String): DataFrame =
        df.groupBy(col(key)).agg(count(lit(1)).as("sz"))
          .select(lit(edge).as("edge"), col("sz"))
      val orders = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val all3 = sizes(orders, "o_custkey", "orders_per_customer")
        .unionByName(sizes(li, "l_orderkey", "lines_per_order"))
        .unionByName(sizes(li, "l_partkey", "lines_per_part"))
      val hist = all3.groupBy(col("edge"), col("sz"))
        .agg(count(lit(1)).as("c"))
      val byEdge = Window.partitionBy(col("edge"))
      val cum = hist
        .withColumn("cum", sum(col("c")).over(
          byEdge.orderBy(col("sz"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("c")).over(byEdge))
      def pick(p: Double) =
        min(when(col("cum") >= ceil(col("n") * p), col("sz")))
      cum.groupBy(col("edge"))
        .agg(max(col("n")).as("n_groups"),
          pick(0.5).as("p50"), pick(0.99).as("p99"),
          max(col("sz")).as("max_size"))
        .orderBy(col("edge"))
    },
    Some("""WITH s1 AS (SELECT 'orders_per_customer' AS edge,
                count(*) AS sz FROM orders GROUP BY o_custkey),
            s2 AS (SELECT 'lines_per_order' AS edge, count(*) AS sz
                   FROM lineitem GROUP BY l_orderkey),
            s3 AS (SELECT 'lines_per_part' AS edge, count(*) AS sz
                   FROM lineitem GROUP BY l_partkey),
            a AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2
                  UNION ALL SELECT * FROM s3),
            h AS (SELECT edge, sz, count(*) AS c FROM a GROUP BY edge, sz),
            cu AS (SELECT *,
                sum(c) OVER (PARTITION BY edge ORDER BY sz
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(c) OVER (PARTITION BY edge) AS n
              FROM h)
            SELECT edge, CAST(max(n) AS BIGINT) AS n_groups,
              min(CASE WHEN cum >= ceil(n * 0.5) THEN sz END) AS p50,
              min(CASE WHEN cum >= ceil(n * 0.99) THEN sz END) AS p99,
              max(sz) AS max_size
            FROM cu GROUP BY edge ORDER BY edge"""))

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

  /** Attribute fill-rate profile — the first profiling query anyone
    * runs on an unfamiliar dataset: per (table, column), how many rows
    * carry a usable value (non-null AND non-blank for strings — the
    * reference's own quality gate treats empty-after-trim as missing,
    * reference data_quality_operator.py:24-38)? One row per audited
    * column with exact fill ppm. Profiled columns span every table
    * family: keys, categoricals, free text, and the JSON props blob.
    *
    * ## 100 TB notes
    * Pure map-side conditional counts — each table is scanned once
    * with column pruning down to the audited columns; no shuffle
    * wider than one row per table.
    */
  val q246FillRate: Q = Q(
    "q246_fill_rate",
    (s, dir) => {
      def profile(df: DataFrame, table: String,
          cols: Seq[String]): DataFrame = {
        val aggs = count(lit(1)).as("n_rows") +: cols.map(c =>
          sum(when(col(c).isNotNull &&
            length(trim(col(c).cast("string"))) > 0, 1L).otherwise(0L))
            .as(s"f_$c"))
        val one = df.agg(aggs.head, aggs.tail: _*)
        cols.map { c =>
          one.select(lit(table).as("table_name"), lit(c).as("column_name"),
            col("n_rows"), col(s"f_$c").as("n_filled"),
            expr(s"f_$c * 1000000 div n_rows").as("fill_ppm"))
        }.reduce(_ unionByName _)
      }
      profile(Tables.load(s, dir, "customer"), "customer",
          Seq("c_name", "c_mktsegment"))
        .unionByName(profile(Tables.load(s, dir, "orders"), "orders",
          Seq("o_orderstatus", "o_orderpriority")))
        .unionByName(profile(Tables.load(s, dir, "documents"), "documents",
          Seq("text", "lang", "source")))
        .unionByName(profile(Tables.load(s, dir, "events"), "events",
          Seq("event_type", "props")))
        .orderBy(col("table_name"), col("column_name"))
    },
    Some {
      def p(table: String, c: String): String =
        s"""SELECT '$table' AS table_name, '$c' AS column_name,
              count(*) AS n_rows,
              CAST(sum(CASE WHEN $c IS NOT NULL
                AND length(trim(CAST($c AS VARCHAR))) > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
              CAST(sum(CASE WHEN $c IS NOT NULL
                AND length(trim(CAST($c AS VARCHAR))) > 0
                THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // count(*)
                AS fill_ppm
            FROM $table"""
      val parts = Seq(
        p("customer", "c_name"), p("customer", "c_mktsegment"),
        p("orders", "o_orderstatus"), p("orders", "o_orderpriority"),
        p("documents", "text"), p("documents", "lang"),
        p("documents", "source"),
        p("events", "event_type"), p("events", "props"))
      s"""SELECT * FROM (${parts.mkString(" UNION ALL ")})
          ORDER BY table_name, column_name"""
    })

  /** OTIF (on-time-in-full) supplier scorecard — the supply-chain KPI
    * procurement contracts are written against: a line scores when it
    * ships within 30 days of the order AND is not returned. Bottom-10
    * suppliers by OTIF ppm (ties by supplier key), each with volume,
    * the two failure components separated (late vs returned — a
    * supplier can fail either way, and the fix differs), and exact
    * ppm. The worst-performer ranking, not the average, is what a
    * supplier review meeting consumes.
    *
    * ## 100 TB notes
    * One lineitem-orders join on orderkey (bucketable), one
    * map-side-combined rollup on suppkey, bottom-10 via
    * TakeOrderedAndProject. Day arithmetic is exact integers.
    */
  val q249OtifScore: Q = Q(
    "q249_otif_score",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"),
          (unix_micros(col("l_shipdate").cast("timestamp_ltz"))
            / lit(86400000000L)).cast("long").as("ship_day"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          (unix_micros(col("o_orderdate").cast("timestamp_ltz"))
            / lit(86400000000L)).cast("long").as("order_day"))
      val scored = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey"),
          (col("ship_day") - col("order_day") <= 30).as("on_time"),
          (col("l_returnflag") =!= "R").as("in_full"))
      scored.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("on_time") && col("in_full"), 1L).otherwise(0L))
            .as("n_otif"),
          sum(when(!col("on_time"), 1L).otherwise(0L)).as("n_late"),
          sum(when(!col("in_full"), 1L).otherwise(0L)).as("n_returned"))
        .withColumn("otif_ppm", expr("n_otif * 1000000 div n_lines"))
        .orderBy(col("otif_ppm").asc, col("l_suppkey").asc)
        .limit(10)
    },
    Some("""WITH sc AS (SELECT l_suppkey,
                (epoch_us(l_shipdate) // 86400000000
                 - epoch_us(o_orderdate) // 86400000000) <= 30 AS on_time,
                l_returnflag != 'R' AS in_full
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            g AS (SELECT l_suppkey, count(*) AS n_lines,
                CAST(sum(CASE WHEN on_time AND in_full THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_otif,
                CAST(sum(CASE WHEN NOT on_time THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_late,
                CAST(sum(CASE WHEN NOT in_full THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returned
              FROM sc GROUP BY l_suppkey)
            SELECT l_suppkey, n_lines, n_otif, n_late, n_returned,
              n_otif * 1000000 // n_lines AS otif_ppm
            FROM g ORDER BY otif_ppm ASC, l_suppkey ASC LIMIT 10"""))

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

  /** Basket economics — the merchandising table relating basket SIZE to
    * basket VALUE: per lines-per-order bucket, how many orders, their
    * share, and the average order value (exact decimal line-revenue
    * sums; one division per row). Whether AOV grows sub- or
    * super-linearly with basket size is the "add one more item"
    * upsell economics, and reading it needs the joint table, not two
    * marginals.
    *
    * ## 100 TB notes
    * One shuffle on orderkey builds per-order (size, cents); the
    * bucket rollup is map-side combined on a tiny key; the share
    * window runs over the bucket aggregate.
    */
  val q252BasketEconomics: Q = Q(
    "q252_basket_economics",
    (s, dir) => {
      val perOrder = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("cents"))
      val buckets = perOrder.groupBy(col("n_lines"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      buckets
        .withColumn("total_orders",
          sum(col("n_orders")).over(Window.partitionBy(lit(1))))
        .select(col("n_lines"), col("n_orders"),
          (col("n_orders").cast("double") /
            col("total_orders").cast("double")).as("order_share"),
          (col("cents").cast("double") / col("n_orders").cast("double"))
            .as("avg_order_cents"))
        .orderBy(col("n_lines"))
    },
    Some("""WITH po AS (SELECT l_orderkey, count(*) AS n_lines,
                CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
              FROM lineitem GROUP BY l_orderkey),
            b AS (SELECT n_lines, count(*) AS n_orders,
                CAST(sum(cents) AS BIGINT) AS cents
              FROM po GROUP BY n_lines)
            SELECT n_lines, n_orders,
              CAST(n_orders AS DOUBLE)
                / CAST(sum(n_orders) OVER () AS DOUBLE) AS order_share,
              CAST(cents AS DOUBLE) / CAST(n_orders AS DOUBLE)
                AS avg_order_cents
            FROM b ORDER BY n_lines"""))

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

  /** Column-encoding selection audit — the per-column statistics a
    * 100 TB parquet writer tunes its encodings with: exact NDV, NDV as
    * ppm of rows, and the heaviest single value's share, folded into
    * the standard decision rule (low-cardinality → dictionary; a
    * dominant value on top → dictionary + run-length). Six columns
    * across lineitem/orders are unpivoted (`stack`) into one
    * (column, value) stream so a single aggregation pass covers them
    * all; `l_partkey` is the deliberate PLAIN control (NDV ~ rows).
    * The thresholds (NDV ≤ 4096 — a dictionary page that stays
    * CPU-cache-resident; top share ≥ 20 %) are the audit's declared
    * policy, not engine magic.
    *
    * ## 100 TB notes
    * The unpivot multiplies rows ×#columns BEFORE aggregation, but
    * map-side partial aggregation collapses each partition to its
    * distinct (column, value) pairs — the shuffle carries vocabulary,
    * not data. At petabyte scale the same numbers come free from
    * parquet footer statistics; this query is the from-first-
    * principles version that validates those footers. Timestamps
    * become epoch-DAY strings before grouping (exact integer µs
    * arithmetic, the Catalog contract — no raw timestamps anywhere).
    */
  val q271EncodingAudit: Q = Q(
    "q271_encoding_audit",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val liU = li.select(expr(
        """stack(4,
             'l_returnflag', l_returnflag,
             'l_linestatus', l_linestatus,
             'l_shipday', CAST(unix_micros(CAST(l_shipdate AS
                 TIMESTAMP_LTZ)) div 86400000000 AS STRING),
             'l_partkey', CAST(l_partkey AS STRING))
           AS (col_name, val)"""))
      val ordU = ord.select(expr(
        """stack(2,
             'o_orderpriority', o_orderpriority,
             'o_orderstatus', o_orderstatus)
           AS (col_name, val)"""))
      val grouped = liU.unionAll(ordU)
        .groupBy(col("col_name"), col("val"))
        .agg(count(lit(1)).as("c"))
      grouped.groupBy(col("col_name"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("ndv"),
          max(col("c")).as("top"))
        .select(col("col_name"), col("n"), col("ndv"),
          expr("ndv * 1000000 div n").as("ndv_ppm"),
          expr("top * 1000000 div n").as("top_share_ppm"),
          expr("""CASE
              WHEN ndv <= 4096 AND top * 1000000 div n >= 200000
                THEN 'DICT_RLE'
              WHEN ndv <= 4096 THEN 'DICT'
              ELSE 'PLAIN' END""").as("encoding"))
        .orderBy("col_name")
    },
    Some("""WITH u AS (
              SELECT 'l_returnflag' AS col_name, l_returnflag AS val
              FROM lineitem
              UNION ALL SELECT 'l_linestatus', l_linestatus FROM lineitem
              UNION ALL SELECT 'l_shipday',
                CAST(epoch_us(CAST(l_shipdate AS TIMESTAMP))
                  // 86400000000 AS VARCHAR) FROM lineitem
              UNION ALL SELECT 'l_partkey', CAST(l_partkey AS VARCHAR)
              FROM lineitem
              UNION ALL SELECT 'o_orderpriority', o_orderpriority
              FROM orders
              UNION ALL SELECT 'o_orderstatus', o_orderstatus
              FROM orders),
            g AS (SELECT col_name, val, count(*) AS c
                  FROM u GROUP BY 1, 2),
            a AS (SELECT col_name, CAST(sum(c) AS BIGINT) AS n,
                    count(*) AS ndv, CAST(max(c) AS BIGINT) AS top
                  FROM g GROUP BY 1)
            SELECT col_name, n, ndv,
              ndv * 1000000 // n AS ndv_ppm,
              top * 1000000 // n AS top_share_ppm,
              CASE
                WHEN ndv <= 4096 AND top * 1000000 // n >= 200000
                  THEN 'DICT_RLE'
                WHEN ndv <= 4096 THEN 'DICT'
                ELSE 'PLAIN' END AS encoding
            FROM a ORDER BY col_name"""))

  /** Delete-one-group jackknife for a RATIO metric — the variance
    * estimator scalable A/B systems actually use (per-unit ratios
    * don't average; the delete-one-bucket jackknife over G hash
    * buckets — here the 25 nations — handles ratio-of-sums metrics
    * without per-row resampling). Each replicate is the metric with
    * one group deleted, computed from the group SUMS
    * (`(C-c_i)/(N-n_i)` — no second data pass), and every replicate
    * and the spread statistics live in exact integers: replicates in
    * MICRO-units (`r_i = (C-c_i)*1e6 div (N-n_i)` BIGINT), mean by
    * integer div, and the sum of squared deviations in scale-0
    * decimal (squared micro-deviations overflow int64; decimal(19,0)
    * × decimal(19,0) → decimal(38,0) stays exact — the sanctioned
    * exact-integer use of wide decimals, summed but never divided).
    * The `(G-1)/G` correction and the `sqrt` are one final double op
    * tree (correctly-rounded IEEE, the q148 discipline). Output: one
    * row per replicate (nation, its sums, its leave-out ratio) each
    * carrying the shared summary columns — the full diagnostic
    * table, not just the SE.
    *
    * ## 100 TB notes
    * One shuffle to per-group sums (map-side combined); everything
    * after runs on G rows with two broadcast scalar attaches. This is
    * the whole point of the group jackknife: replicates come from
    * ALGEBRA on the group sums, never from re-scanning data — at any
    * scale the estimator costs one aggregation.
    */
  val q285JackknifeRatio: Q = Q(
    "q285_jackknife_ratio",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val byNation = o.join(broadcast(c),
          o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      val tot = byNation.agg(sum(col("n_orders")).as("tn"),
        sum(col("cents")).as("tc"), count(lit(1)).as("g")) // 1 row
      val reps = byNation.crossJoin(broadcast(tot))
        .select(col("nation"), col("n_orders"), col("cents"),
          col("tn"), col("tc"), col("g"),
          expr("(tc - cents) * 1000000 div (tn - n_orders)").as("r_micro"))
      val spread = reps.agg(sum(col("r_micro")).as("rsum")) // 1 row
      val withMean = reps.crossJoin(broadcast(spread))
        .withColumn("rbar", expr("rsum div g"))
      val dev = expr("CAST(r_micro - rbar AS DECIMAL(19,0))")
      val ss = withMean.agg(sum(dev * dev).as("ss"))
      withMean.crossJoin(broadcast(ss))
        .select(col("nation"), col("n_orders"), col("cents"),
          col("r_micro"),
          expr("tc * 1000000 div tn").as("full_ratio_micro"),
          col("rbar").as("mean_rep_micro"),
          sqrt(expr("CAST(ss AS DOUBLE) * (g - 1) / g")).as("jack_se"))
        .orderBy("nation")
    },
    Some("""WITH o AS (SELECT o_custkey,
                CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders),
            bn AS (SELECT c_nationkey AS nation, count(*) AS n_orders,
                     CAST(sum(cents) AS BIGINT) AS cents
                   FROM o JOIN customer ON o_custkey = c_custkey
                   GROUP BY 1),
            t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS tn,
                    CAST(sum(cents) AS BIGINT) AS tc,
                    count(*) AS g FROM bn),
            reps AS (SELECT nation, n_orders, cents, tn, tc, g,
                       (tc - cents) * 1000000 // (tn - n_orders) AS r_micro
                     FROM bn, t),
            sp AS (SELECT CAST(sum(r_micro) AS BIGINT) AS rsum FROM reps),
            wm AS (SELECT reps.*, rsum // g AS rbar FROM reps, sp),
            s2 AS (SELECT sum(CAST(r_micro - rbar AS HUGEINT)
                     * CAST(r_micro - rbar AS HUGEINT)) AS ss FROM wm)
            SELECT nation, n_orders, cents, r_micro,
              tc * 1000000 // tn AS full_ratio_micro,
              rbar AS mean_rep_micro,
              sqrt(CAST(ss AS DOUBLE) * (g - 1) / g) AS jack_se
            FROM wm, s2 ORDER BY nation"""))

  val all: Seq[Q] = Seq(q06JoinDims, q07StarRevenue, q08SemiJoin, q09AntiJoin,
    q10AggStats, q11Rollup, q12DistinctExact, q13WindowTopK, q14RunningSum,
    q15Pivot, q16SetOps, q17GlobalTopN, q40QuantilesDisc, q41Moments,
    q46Cube, q47LeadNtile, q53TopkAgg, q55StringAgg, q56RegexExtract,
    q87SnapshotDiff, q89PagerankStep, q112TierJoin, q113Histogram,
    q114CorrMatrix, q116FullOuter, q117Unpivot, q118GroupingSets,
    q124MadOutliers, q129WowGrowth, q130BloomMembership, q133RankFamily,
    q135SnowflakeChain, q136EquidepthHistogram, q157Winsorize,
    q160WilsonInterval, q167ZorderLayout, q168Skyline, q175WeightedMedian,
    q182Benford, q183OrphanAudit, q187ZonemapSkip, q189QuantileSketch,
    q196BloomJoinAudit, q202JoinCardAudit, q209CohortLtv, q211SeasonalDow,
    q212PurchaseGaps, q214AbcClasses, q216AnovaDow, q217SupplierHhi,
    q222PopBaseline, q223QuantileInterp, q224GiniMeanDiff, q225ReturnRate,
    q226ShipSla, q229SeasonalDecomp, q230TargetEncoding, q235DrillAcross,
    q236FanoutProfile, q245ForecastBacktest, q246FillRate, q249OtifScore,
    q250RevenueBridge, q252BasketEconomics, q253DeviationDrawdown,
    q255NewVsReturning, q256HhiTrend, q271EncodingAudit, q285JackknifeRatio)
}
