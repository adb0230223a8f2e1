package graft.queries

import org.scalacheck.Gen

import graft.SparkSpec

/** Randomized agreement between the engine's one-window-pass operators
  * and their brute-force O(n²) definitions, which the oracle harness
  * cannot provide (DuckDB runs the SAME window trick, so engine/oracle
  * parity alone would not catch a shared blind spot in the reduction):
  *
  *  - q168 skyline: frontier == the rows no other same-brand row
  *    dominates (price <=, size >=, one strict), with exact (price,
  *    size) duplicates collapsed to the lowest partkey;
  *  - q165 k-core: the converged edge set == iterating "drop vertices
  *    of degree < k" in plain Scala until stable.
  */
class FrontierPropertySpec extends SparkSpec {
  import spark.implicits._

  test("q168 skyline equals the brute-force dominance filter on random " +
      "part tables") {
    val gen = Gen.listOfN(60, for {
      brand <- Gen.oneOf("B1", "B2", "B3")
      size <- Gen.choose(1, 8)
      cents <- Gen.choose(1, 12)
    } yield (brand, size, cents))
    (1 to 3).foreach { round =>
      withTempDir { dir =>
        val rows = gen.sample.get.zipWithIndex.map { case ((b, sz, c), i) =>
          (i.toLong + 1, b, sz, c.toDouble) // whole-dollar price
        }
        rows.toDF("p_partkey", "p_brand", "p_size", "p_retailprice")
          .write.mode("overwrite").parquet(s"$dir/part.parquet")
        val got = RelationalQueries.q168Skyline.fn(spark, dir)
          .select("p_brand", "p_partkey")
          .as[(String, Long)].collect().toSet
        // brute force: dominated iff some same-brand row is <= on price,
        // >= on size, strict somewhere; duplicates keep lowest partkey
        val all = rows.map { case (pk, b, sz, price) =>
          (pk, b, sz, Math.round(price * 100))
        }
        val expected = all.filter { case (pk, b, sz, pr) =>
          val dominated = all.exists { case (_, b2, sz2, pr2) =>
            b2 == b && pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz)
          }
          val dupWinner = all.filter { case (_, b2, sz2, pr2) =>
            b2 == b && sz2 == sz && pr2 == pr
          }.map(_._1).min
          !dominated && pk == dupWinner
        }.map(t => (t._2, t._1)).toSet
        withClue(s"round $round: ") { got shouldBe expected }
      }
    }
  }

  private val HourNs = 3600L * 1000000000L

  test("q165 k-core equals brute-force peeling on random event graphs") {
    // events: (hour, user) pairs; cooccurrenceEdges cliques each hour's
    // users (bucket size capped at 8 -> keep hours small)
    val gen = Gen.listOfN(30, for {
      hour <- Gen.choose(0L, 9L)
      user <- Gen.choose(1L, 12L)
    } yield (hour, user))
    (1 to 3).foreach { round =>
      withTempDir { dir =>
        val evs = gen.sample.get.distinct.zipWithIndex.map {
          case ((h, u), i) =>
            (i.toLong + 1, h * HourNs, u, "x", 1.0, "{}")
        }
        evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        val got = GraphQueries.q165KCore.fn(spark, dir)
          .as[(Long, Long)].collect().toList.sorted
        // brute-force: hourly cliques (buckets of 2..8 users) -> peel
        val byHour = evs.groupBy(_._2).values
          .map(_.map(_._3).distinct.sorted).filter(us =>
            us.size >= 2 && us.size <= 8)
        var edges = byHour.flatMap(us =>
          for (a <- us; b <- us if a < b) yield (a, b)).toSet
        var stable = false
        while (!stable) {
          val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
            .groupBy(identity).map { case (n, xs) => n -> xs.size }
          val keep = deg.filter(_._2 >= 3).keySet
          val next = edges.filter(e => keep(e._1) && keep(e._2))
          if (next == edges) stable = true else edges = next
        }
        val expected = edges.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, xs) => (n, xs.size.toLong) }
          .toList.sorted
        withClue(s"round $round: ") { got shouldBe expected }
      }
    }
  }
}
