package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Catalog.Q
import graft.engine.{Gold, Quality, Silver, Tables}

/** The reference's own query surface (SURVEY.md §2), re-expressed over the
  * driver fixtures: gold group-count (A1), silver cleaning projection
  * (P1-P6), DQ checks (P7-P9, A2), and the latest-snapshot reader's
  * relational analog (S3 as row_number()=1).
  */
object ReferenceQueries {

  /** A1: flagship 2-key group-count (reference
    * plugins/brewery_operators.py:379) — count(col) = non-null count.
    */
  val q01GoldCount: Q = Q(
    "q01_gold_count",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      Gold.groupCount(li, Seq(col("l_returnflag"), col("l_linestatus")),
          col("l_orderkey"), "cnt")
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus, count(l_orderkey) AS cnt
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** P1-P6: silver projection — rename/trim/lower/concat_ws/casts
    * (reference plugins/brewery_operators.py:255-265). try_cast of a
    * non-numeric string demonstrates the malformed->NULL semantics.
    */
  val q02Silver: Q = Q(
    "q02_silver_projection",
    (s, dir) => {
      val part = Tables.load(s, dir, "part")
      Silver.project(part, Seq(
        "id" -> col("p_partkey"),
        "part_name" -> trim(col("p_name")),
        "brand" -> lower(col("p_brand")),
        "full_desc" -> Silver.fullAddress(col("p_name"), col("p_brand"), col("p_type")),
        "type_clean" -> trim(col("p_type")),
        "size_d" -> col("p_size").cast("double"),
        "brand_num" -> Silver.castDoubleLenient(col("p_brand")),
        "price_num" -> Silver.castDoubleLenient(col("p_retailprice").cast("string"))
      )).orderBy("id")
    },
    Some("""SELECT p_partkey AS id, trim(p_name) AS part_name,
            lower(p_brand) AS brand,
            concat_ws(', ', p_name, p_brand, p_type) AS full_desc,
            trim(p_type) AS type_clean, CAST(p_size AS DOUBLE) AS size_d,
            TRY_CAST(p_brand AS DOUBLE) AS brand_num,
            TRY_CAST(CAST(p_retailprice AS VARCHAR) AS DOUBLE) AS price_num
            FROM part ORDER BY id"""))

  /** P7: null-or-empty critical-column scan (reference
    * plugins/data_quality_operator.py:68-71), one scan for all columns.
    */
  val q03DqReport: Q = Q(
    "q03_dq_report",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      Quality.report(cust, Seq("c_name", "c_mktsegment"))
        .orderBy("column_name")
    },
    Some("""SELECT * FROM (
              SELECT 'c_name' AS column_name,
                     count(*) FILTER (WHERE c_name IS NULL OR c_name = '') AS violations
              FROM customer
              UNION ALL
              SELECT 'c_mktsegment',
                     count(*) FILTER (WHERE c_mktsegment IS NULL OR c_mktsegment = '')
              FROM customer)
            ORDER BY column_name"""))

  /** P8/P9/A2: min-count + non-empty probes (reference
    * plugins/data_quality_operator.py:61-66; threshold 100 from
    * dags/dag-brewery_pipeline.py:98).
    */
  val q04DqMinCount: Q = Q(
    "q04_dq_mincount",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
      cust.agg(count(lit(1)).as("cnt"))
        .select(col("cnt"), (col("cnt") >= 100).as("pass_min_100"),
          (col("cnt") > 0).as("non_empty"))
    },
    Some("""SELECT count(*) AS cnt, count(*) >= 100 AS pass_min_100,
            count(*) > 0 AS non_empty FROM customer"""))

  /** S3: latest-snapshot selection, lifted from the reference's
    * driver-side max-by-mtime (plugins/brewery_operators.py:202-225) to
    * its relational form row_number() OVER (... DESC) = 1.
    */
  val q05LatestSnapshot: Q = Q(
    "q05_latest_snapshot",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp_ltz")).as("order_ts_us"))
        .orderBy("o_custkey")
    },
    Some("""SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS order_ts_us
            FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                         row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                  FROM orders)
            WHERE rn = 1 ORDER BY o_custkey"""))

  /** S1 promoted to DRIVER-VERIFIED (the q283 promotion, applied to the
    * paged-API source): a `paged-api` DSv2 scan (4 pages x 50, short
    * last page -> 175 rows, one InputPartition per page, executor-side
    * fetch) is aggregated per brewery_type — row count, parse-ok
    * longitude count (the bronze `try_cast` rule over the planted
    * `not-a-number` rows), distinct states, and an exact decimal-summed
    * latitude. The page payload is the source's deterministic synthetic
    * contract (`PagedSource.fetchPage` — pure arithmetic on the row
    * ordinal), so the oracle REBUILDS the identical rows in DuckDB from
    * `range(0, 175)` and must agree on every aggregate: a lost,
    * duplicated, or torn page, a wrong short-last-page stop, or a
    * mis-pruned column all break the hash. The one §2 source mechanism
    * that was spec-only is now on the driver's correctness gate.
    *
    * ## 100 TB notes
    * The scan is the production shape for API backfill: page-per-
    * partition, executor-side retry, no driver accumulation (the
    * reference's driver loop is the anti-pattern, SURVEY §2.1); the
    * aggregate is one map-side-combined shuffle over 5 keys.
    */
  val q292PagedIngest: Q = Q(
    "q292_paged_ingest",
    (s, _) => {
      val bronze = s.read.format("paged-api")
        .option("pages", 4).option("per_page", 50).load()
      bronze
        .select(col("brewery_type"), col("state_province"),
          Silver.castDoubleLenient(col("longitude")).as("lon"),
          col("latitude").cast("double").as("lat"))
        .groupBy(col("brewery_type"))
        .agg(count(lit(1)).as("n"),
          count(col("lon")).as("n_lon_ok"),
          count_distinct(col("state_province")).as("n_states"),
          round(sum(col("lat").cast("decimal(30,10)")), 6)
            .cast("double").as("sum_lat"))
        .orderBy("brewery_type")
    },
    Some("""WITH ks AS (SELECT unnest(range(0, 175)) AS k),
            rws AS (SELECT
                (['micro','brewpub','regional','nano','planning'])[(k % 5) + 1]
                  AS brewery_type,
                'S' || CAST(k % 10 AS VARCHAR) AS state_province,
                CASE WHEN k % 13 = 0 THEN NULL ELSE 1 END AS lon_ok,
                CAST(CAST(30 + (k % 20) AS VARCHAR) || '.' ||
                     CAST(k % 100 AS VARCHAR) AS DOUBLE) AS lat
              FROM ks)
            SELECT brewery_type, count(*) AS n,
              count(lon_ok) AS n_lon_ok,
              count(DISTINCT state_province) AS n_states,
              CAST(round(sum(CAST(lat AS DECIMAL(30,10))), 6) AS DOUBLE)
                AS sum_lat
            FROM rws GROUP BY 1 ORDER BY brewery_type"""))

  val all: Seq[Q] =
    Seq(q01GoldCount, q02Silver, q03DqReport, q04DqMinCount,
      q05LatestSnapshot, q292PagedIngest)
}
