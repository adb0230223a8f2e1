package graft.engine

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.SparkSpec

/** Pins [[Tables.widen]]'s contract from both sides:
  *
  *  - a scan NARROWER than the cluster is round-robined out to
  *    `defaultParallelism` (the small-file repair that distributes
  *    per-row compute before the first shuffle), and
  *  - an input already AT cluster width comes back untouched — the
  *    exact object, no Exchange added — which is the 100 TB posture:
  *    a wide production scan must never pay a repair shuffle.
  *
  * Also proves widen is purely structural: rows survive unchanged.
  */
class WidenSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    collect(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeLike => e
    }.size

  test("a narrow scan is widened to defaultParallelism") {
    withTempDir { dir =>
      import spark.implicits._
      val target = spark.sparkContext.defaultParallelism
      // on a 1-core session (SPARK_GRAFT_CPUS=1) a one-split scan IS
      // cluster-wide and widen correctly no-ops — nothing to repair
      assume(target > 1, "needs a multi-core session to show the repair")
      // one tiny file -> one scan split, well under any real parallelism
      (1 to 100).toDF("id").coalesce(1).write.parquet(s"$dir/t")
      val scan = spark.read.parquet(s"$dir/t")
      val widened = Tables.widen(spark, scan)
      assert(widened ne scan, "narrow input must be repartitioned")
      widened.rdd.getNumPartitions shouldBe target
      shuffles(widened) shouldBe 1
      // structural only: the multiset of rows is untouched
      widened.as[Int].collect().sorted shouldBe (1 to 100).toArray
    }
  }

  test("an already-wide input is returned untouched (no repair shuffle)") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism
    val wide = (1 to 1000).toDF("id").repartition(target * 2)
    val out = Tables.widen(spark, wide)
    assert(out eq wide,
      "an input at/above cluster width must come back as the same object")
    shuffles(out) shouldBe 1 // only the explicit repartition above
  }

  test("exactly at cluster width is wide enough — no extra exchange") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism
    val atWidth = (1 to 1000).toDF("id").repartition(target)
    assert(Tables.widen(spark, atWidth) eq atWidth)
  }
}
