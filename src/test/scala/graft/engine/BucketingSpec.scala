package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-claims evidence: bucketed tables co-locate join keys so the
  * shuffle disappears (the RelationalQueries 100 TB note), and
  * approx_count_distinct holds its accuracy bound (the HLL path used
  * when exact distinct counts don't justify their shuffle).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with NO exchange (co-located join)") {
    val left = (1L to 5000L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 5000L).map(k => (k, s"r$k")).toDF("k", "rv")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_l")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_r")
    left.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_l")
    right.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_r")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("graft_bucket_l")
        .join(spark.table("graft_bucket_r"), "k")
      joined.count() shouldBe 5000
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      // bucketing provides the partitioning on both sides: no shuffle
      plan should not include "Exchange hashpartitioning"
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_r")
    }
  }

  test("approx_count_distinct stays within its error bound") {
    val n = 20000
    val df = (1 to n).map(i => s"id$i").toDF("id")
    val approx = df.agg(approx_count_distinct(col("id"), 0.02).as("a"))
      .as[Long].head()
    math.abs(approx - n).toDouble / n should be < 0.05
  }
}
