package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime scan-reduction: the two mechanisms that shrink a 100 TB scan
  * AFTER planning, when the selective predicate lives on the other side
  * of a join.
  *
  *  - Dynamic partition pruning (DPP): a filter on the dim side is
  *    turned into a partition predicate on the partitioned fact scan, so
  *    only the joined partitions are read at all.
  *  - Runtime bloom-filter pruning: for non-partition join keys, a bloom
  *    filter built from the (filtered) creation side is pushed into the
  *    application-side scan as `might_contain`, dropping non-joining
  *    rows before the shuffle.
  *
  * Neither changes results — both specs assert result equality against
  * the unpruned plan — but at scale they are the difference between
  * scanning a partition and scanning a lake. The spec pins that the
  * session actually produces these plan shapes, so a config regression
  * (e.g. AQE/DPP interplay, a disabled flag) is caught here and not in a
  * cluster bill.
  */
class RuntimePruningSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("dynamic partition pruning: fact scan reads only joined partitions") {
    withTempDir { dir =>
      val facts = (1L to 20000L).map(i => (i, i % 50, i * 1.0))
        .toDF("id", "part_key", "v")
      facts.write.mode("overwrite").partitionBy("part_key")
        .parquet(s"$dir/facts")
      // dim SCAN with a SELECTIVE predicate keeping 3 of the 50
      // partitions — DPP's planner rule requires a filter on the
      // pruning side (an unfiltered dim prunes nothing by definition)
      (0L until 50L).map(i => (i, s"t$i")).toDF("part_key", "tag")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val dim = spark.read.parquet(s"$dir/dim")
        .filter(col("tag").isin("t7", "t13", "t21"))
      val f = spark.read.parquet(s"$dir/facts")
      val j = f.join(dim, "part_key")
      val rows = j.collect()
      rows.length shouldBe 3 * 400
      // the fact-side scan must carry a runtime partition filter and
      // actually read 3 partitions, not 50
      val scans = collect(j.queryExecution.executedPlan) {
        case s: FileSourceScanExec if s.output.exists(_.name == "id") => s
      }
      scans should have size 1
      assert(scans.head.partitionFilters.exists(
        _.toString.contains("dynamicpruning")),
        s"no dynamicpruning in ${scans.head.partitionFilters}")
      scans.head.metrics("numPartitions").value shouldBe 3
      // equality with the statically-pruned equivalent
      val expect = f.filter(col("part_key").isin(7L, 13L, 21L))
        .count()
      rows.length.toLong shouldBe expect
    }
  }

  test("runtime bloom filter prunes the application side of a join") {
    withTempDir { dir =>
      // non-partition join key -> DPP can't help; bloom pruning can
      (1L to 50000L).map(i => (i, s"k${i % 1000}", i * 1.0))
        .toDF("id", "k", "v")
        .write.mode("overwrite").parquet(s"$dir/app")
      (1L to 1000L).map(i => (s"k$i", i % 7)).toDF("k", "grp")
        .write.mode("overwrite").parquet(s"$dir/create")
      val app = spark.read.parquet(s"$dir/app")
      val create = spark.read.parquet(s"$dir/create").filter(col("grp") === 0)
      val conf = Map(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        // force a shuffle join so the filter has a shuffle to save
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val j = app.join(create, "k")
        val n = j.count()
        val planStr = j.queryExecution.executedPlan.toString
        assert(planStr.contains("might_contain"),
          "no bloom-filter runtime filter in the executed plan")
        // results identical to the un-filtered plan
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
          "false")
        n shouldBe app.join(create, "k").count()
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
