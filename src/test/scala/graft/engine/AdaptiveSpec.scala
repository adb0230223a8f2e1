package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adaptive Query Execution as the runtime half of the 100 TB plan
  * story: the static planner sees only pre-execution estimates, but a
  * 100 TB join whose build side COLLAPSES after a selective filter
  * should not pay a full shuffle join. These tests pin the two AQE
  * behaviors the engine leans on:
  *
  *  1. join-strategy re-plan — with static broadcast disabled (the
  *     planner's stat-less worst case), runtime shuffle statistics
  *     reveal the small side and AQE rewrites the SortMergeJoin into a
  *     broadcast join after the fact;
  *  2. partition coalescing — a 32-partition shuffle of a small
  *     aggregate is folded into a handful of post-shuffle partitions,
  *     so 100 TB configs don't drown small stages in empty tasks.
  *
  * Both assert on `executedPlan` AFTER an action, because AQE plans are
  * not final until runtime statistics exist.
  */
class AdaptiveSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    // collect() drives THIS dataset's QueryExecution (a write would spin
    // up a separate one, leaving this plan un-finalized)
    df.collect()
    val ep = df.queryExecution.executedPlan
    info(s"executedPlan class: ${ep.getClass.getSimpleName}")
    ep match {
      case a: AdaptiveSparkPlanExec =>
        info(s"isFinalPlan: ${a.isFinalPlan}")
        a.executedPlan.toString
      case p => p.toString
    }
  }

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE rewrites a static SortMergeJoin into a broadcast join at " +
    "runtime") {
    // static threshold off (the planner's worst case) but the ADAPTIVE
    // threshold on — it defaults to the static value, so leaving it
    // unset would disable the runtime conversion too
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "10485760") {
      val dir = "/root/testdata/sf0.01"
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey"), col("o_totalprice"))
      // the filter guts the build side at RUNTIME — exactly the case
      // static planning cannot see
      val cust = spark.read.parquet(s"$dir/customer.parquet")
        .filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey"))
      val joined = orders.join(cust,
        orders("o_custkey") === cust("c_custkey"))
      val plan = finalPlan(joined)
      plan should include("BroadcastHashJoin")
      (plan should not).include("SortMergeJoin")
    }
  }

  test("AQE coalesces the 32 shuffle partitions of a small aggregate") {
    // pin the static partition count explicitly — the test JVM defaults
    // to 4, which would make `< 32` pass without AQE doing anything
    withConf("spark.sql.shuffle.partitions" -> "32") {
      val dir = "/root/testdata/sf0.01"
      val agg = spark.read.parquet(s"$dir/orders.parquet")
        .groupBy(col("o_orderstatus")).count()
      val parts = agg.rdd.getNumPartitions // getNumPartitions executes
      // 3 tiny groups through 32 static partitions: AQE folds the
      // post-shuffle side to a handful
      parts should be < 8
    }
  }
}
