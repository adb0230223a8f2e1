package graft.queries

import graft.SparkSpec

/** Semantics of the profiling trio (q112 interval-dim join, q113
  * equi-width histogram) on crafted fixtures — the oracle harness checks
  * engine parity; these pin the intended MEANING.
  */
class ProfilingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q112: an order inside the overlap lands in BOTH tiers") {
    withTempDir { dir =>
      // 450k is in premium [250k,600k) AND vip [400k,600k)
      Seq(50000.0, 150000.0, 450000.0).toDF("o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val rows = RelationalQueries.q112TierJoin.fn(spark, dir)
        .select("tier", "n_orders").as[(String, Long)].collect().toMap
      rows shouldBe Map("budget" -> 1L, "mid" -> 1L,
        "premium" -> 1L, "vip" -> 1L)
    }
  }

  test("q113: min lands in bucket 0, max clamps into bucket 9") {
    withTempDir { dir =>
      // lo=0, hi=100 -> width 10; v=100 would floor to bucket 10 without
      // the clamp; v=95 -> bucket 9 too
      Seq(0.0, 5.0, 15.0, 95.0, 100.0).toDF("l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val rows = RelationalQueries.q113Histogram.fn(spark, dir)
        .select("bucket", "n_rows").as[(Long, Long)].collect().toMap
      rows shouldBe Map(0L -> 2L, 1L -> 1L, 9L -> 2L)
    }
  }

  test("q113: bucket_lo reconstructs the bin lower bound") {
    withTempDir { dir =>
      Seq(0.0, 5.0, 15.0, 95.0, 100.0).toDF("l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val rows = RelationalQueries.q113Histogram.fn(spark, dir)
        .select("bucket", "bucket_lo").as[(Long, Double)].collect().toMap
      rows shouldBe Map(0L -> 0.0, 1L -> 10.0, 9L -> 90.0)
    }
  }
}
