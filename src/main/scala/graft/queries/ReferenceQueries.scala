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

  val all: Seq[Q] =
    Seq(q01GoldCount, q02Silver, q03DqReport, q04DqMinCount, q05LatestSnapshot)
}
