package graft.queries

import graft.SparkSpec

/** Semantics of the profiling/reshape queries (q112 interval-dim join,
  * q113 equi-width histogram, q116 full outer join, q117 unpivot) on
  * crafted fixtures — the oracle harness checks engine parity; these pin
  * the intended MEANING.
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

  test("q113: a single-valued column (hi = lo) pins to bucket 0, no NaN") {
    withTempDir { dir =>
      Seq(42.0, 42.0, 42.0).toDF("l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val rows = RelationalQueries.q113Histogram.fn(spark, dir)
        .select("bucket", "n_rows").as[(Long, Long)].collect().toMap
      rows shouldBe Map(0L -> 3L)
    }
  }

  test("q116: both unmatched regions of the full outer join survive") {
    withTempDir { dir =>
      def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
      // orders on days 1,2; ships on days 2,3 -> day 1 has null ships,
      // day 3 has null orders, day 2 matches
      Seq(ts(1), ts(2)).toDF("o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      Seq(ts(2), ts(2), ts(3)).toDF("l_shipdate")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val rows = RelationalQueries.q116FullOuter.fn(spark, dir)
        .select("n_orders", "n_ships")
        .as[(Option[Long], Option[Long])].collect().toSeq
      rows shouldBe Seq((Some(1L), None), (Some(1L), Some(2L)),
        (None, Some(1L)))
    }
  }

  test("q117: melts each flag into exactly the three measures") {
    withTempDir { dir =>
      Seq(("A", 1.0, 10.0, 0.1), ("R", 2.0, 20.0, 0.2))
        .toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val rows = RelationalQueries.q117Unpivot.fn(spark, dir)
        .as[(String, String, Double)].collect().toSeq
      rows shouldBe Seq(
        ("A", "sum_disc", 0.1), ("A", "sum_price", 10.0), ("A", "sum_qty", 1.0),
        ("R", "sum_disc", 0.2), ("R", "sum_price", 20.0), ("R", "sum_qty", 2.0))
    }
  }
}
