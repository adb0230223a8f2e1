package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the graph kernels (q110 triangles, q111 BFS) on a
  * hand-crafted events fixture small enough to reason about by hand:
  *
  *   hour 0, type "x": users 1,2,3   -> clique edges 1-2, 1-3, 2-3
  *   hour 1, type "x": users 3,4     -> edge 3-4
  *   hour 2, type "x": users 10..19  -> 10 users > MaxBucket(8): NO edges
  *
  * Graph: degrees d(1)=2 d(2)=2 d(3)=3 d(4)=1; wedges = 1+1+3+0 = 5;
  * triangles = 1 ({1,2,3}); clustering = 3*1/5 = 0.6.
  * BFS from min vertex 1: hop 0 = {1}, hop 1 = {2,3}, hop 2 = {4}.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val HourNs = 3600L * 1000000000L

  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long)]): Unit = // (hour, user_id, event_id)
    rows.map { case (h, u, id) => (id, h * HourNs, u, "x", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def fixture(dir: String): Unit = {
    val big = (10L to 19L).zipWithIndex.map { case (u, i) =>
      (2L, u, 100L + i)
    }
    writeEvents(dir,
      Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L),
        (1L, 3L, 4L), (1L, 4L, 5L)) ++ big)
  }

  test("co-occurrence edges: clique within bucket, oversized bucket dropped") {
    withTempDir { dir =>
      fixture(dir)
      val e = GraphQueries.cooccurrenceEdges(spark, dir)
        .as[(Long, Long)].collect().toSet
      e shouldBe Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    }
  }

  test("edge list lands once and serves the wedge kernels; rewritten " +
      "fixtures recompute") {
    withTempDir { dir =>
      fixture(dir)
      val before = GraphQueries.edgeComputeCount.get
      GraphQueries.cooccurrenceEdges(spark, dir).collect()
      val mid = GraphQueries.edgeComputeCount.get
      (mid - before) shouldBe 1
      // three wedge kernels + degrees + orientation: no second compute
      GraphQueries.q110Triangles.fn(spark, dir).collect()
      GraphQueries.q184TrussSupport.fn(spark, dir).collect()
      GraphQueries.q206LocalClustering.fn(spark, dir).collect()
      GraphQueries.edgeComputeCount.get shouldBe mid
      // oriented edges are a permutation of the undirected list
      val e = GraphQueries.cooccurrenceEdges(spark, dir)
        .as[(Long, Long)].collect().toSet
      val oe = GraphQueries.orientedEdges(spark, dir)
        .as[(Long, Long)].collect()
      oe.length shouldBe e.size
      oe.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .toSet shouldBe e
      // an in-place rewrite of the fixture must trigger a fresh compute
      writeEvents(dir, Seq((0L, 7L, 1L), (0L, 8L, 2L)))
      GraphQueries.cooccurrenceEdges(spark, dir)
        .as[(Long, Long)].collect().toSet shouldBe Set((7L, 8L))
      GraphQueries.edgeComputeCount.get shouldBe mid + 1
    }
  }

  test("q110: exact counts, degree stats, and clustering coefficient") {
    withTempDir { dir =>
      fixture(dir)
      val row = GraphQueries.q110Triangles.fn(spark, dir)
        .select("n_nodes", "n_edges", "max_deg", "n_wedges", "n_tri",
          "clustering")
        .as[(Long, Long, Long, Long, Long, Double)].collect().toList
      row shouldBe List((4L, 4L, 3L, 5L, 1L, 0.6))
    }
  }

  test("q111: hop distribution from the minimum vertex") {
    withTempDir { dir =>
      fixture(dir)
      val rows = GraphQueries.q111BfsHops.fn(spark, dir)
        .as[(Long, Long)].collect().toList
      rows shouldBe List((0L, 1L), (1L, 2L), (2L, 1L))
    }
  }

  test("q111: disconnected component is absent from the BFS output") {
    withTempDir { dir =>
      // component {1,2} (min vertex 1) and unreachable component {5,6}
      writeEvents(dir,
        Seq((0L, 1L, 1L), (0L, 2L, 2L), (1L, 5L, 3L), (1L, 6L, 4L)))
      val rows = GraphQueries.q111BfsHops.fn(spark, dir)
        .as[(Long, Long)].collect().toList
      rows shouldBe List((0L, 1L), (1L, 1L))
    }
  }

  test("duplicate events collapse: edge weight never exceeds one pair") {
    withTempDir { dir =>
      // user 1 appears 3x in the same bucket — still one edge 1-2
      writeEvents(dir,
        Seq((0L, 1L, 1L), (0L, 1L, 2L), (0L, 1L, 3L), (0L, 2L, 4L)))
      val e = GraphQueries.cooccurrenceEdges(spark, dir)
        .as[(Long, Long)].collect().toList
      e shouldBe List((1L, 2L))
    }
  }

  test("q165 k-core: peeling CASCADES — a degree-3 vertex held up only " +
      "by leaves dies in round two, the K4 survives") {
    withTempDir { dir =>
      // h0: K4 on {1,2,3,4}; h1: edge 4-5; h2: 5-6; h3: 5-7.
      // Degrees: 1,2,3 -> 3; 4 -> 4; 5 -> 3; 6,7 -> 1.
      // Round 1 peels the leaves 6,7 (d<3) — 5 STILL had d=3;
      // round 2 peels 5 (now d=1) — the cascade a static degree
      // threshold misses; round 3 confirms the K4 fixpoint.
      var id = 0L
      def ev(h: Long, u: Long): (Long, Long, Long) = { id += 1; (h, u, id) }
      writeEvents(dir,
        Seq(ev(0, 1), ev(0, 2), ev(0, 3), ev(0, 4),
          ev(1, 4), ev(1, 5), ev(2, 5), ev(2, 6), ev(3, 5), ev(3, 7)))
      val out = GraphQueries.q165KCore.fn(spark, dir)
        .as[(Long, Long)].collect().toList
      out shouldBe List((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L))
    }
  }

  test("q176 time-reach: an edge BEFORE its endpoint was reached does " +
      "not propagate — the constraint plain BFS ignores") {
    withTempDir { dir =>
      // seed 1 meets 2 at hour 5; 2 met 3 at hour 2 (BEFORE 2 was
      // reached -> 3 must stay unreached); 2 meets 4 at hour 7 (after
      // -> reached). q111-style BFS would reach 3; time-respecting
      // reachability must not. Bucket index = hour * 6 (10-min cells).
      writeEvents(dir, Seq(
        (5L, 1L, 1L), (5L, 2L, 2L),
        (2L, 2L, 3L), (2L, 3L, 4L),
        (7L, 2L, 5L), (7L, 4L, 6L)))
      val out = GraphQueries.q176TimeReach.fn(spark, dir)
        .as[(Long, Long)].collect().toList
      out shouldBe List((30L, 1L), (42L, 1L))
    }
  }

  test("q176 time-reach: equal-time hops chain (h >= arrival, not >) — " +
      "two same-hour buckets split by event_type") {
    withTempDir { dir =>
      // type "a": {1,2} at hour 3; type "b": {2,5} at hour 3. Edges
      // 1-2 and 2-5 both carry h=18; arrival(2)=18 and the 2-5 edge
      // (18 >= 18) must still fire -> 5 reached at 18 too.
      Seq((1L, 3L * 3600L * 1000000000L, 1L, "a", 1.0, "{}"),
          (2L, 3L * 3600L * 1000000000L, 2L, "a", 1.0, "{}"),
          (3L, 3L * 3600L * 1000000000L, 2L, "b", 1.0, "{}"),
          (4L, 3L * 3600L * 1000000000L, 5L, "b", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val out = GraphQueries.q176TimeReach.fn(spark, dir)
        .as[(Long, Long)].collect().toList
      // users 2 and 5 both first reached in bucket 18 (hour 3)
      out shouldBe List((18L, 2L))
    }
  }

  test("q165 k-core: a graph with no 3-core peels to empty") {
    withTempDir { dir =>
      // triangle {1,2,3} has all degrees 2 -> fully peeled at k=3
      writeEvents(dir, Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)))
      GraphQueries.q165KCore.fn(spark, dir).count() shouldBe 0L
    }
  }

  test("q184 truss support: every K4 edge closes 2 triangles, a pendant " +
      "edge closes none") {
    withTempDir { dir =>
      // hour 0: users 1..4 -> K4 (6 edges, each in exactly 2 triangles);
      // hour 1: users 4,5 -> pendant edge 4-5 (support 0)
      writeEvents(dir, Seq(
        (0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L), (0L, 4L, 4L),
        (1L, 4L, 5L), (1L, 5L, 6L)))
      val out = GraphQueries.q184TrussSupport.fn(spark, dir)
        .select("support", "n_edges")
        .as[(Long, Long)].collect().toList
      out shouldBe List((0L, 1L), (2L, 6L))
    }
  }

  test("q194 assortativity: exact rational from hand-computed degree " +
      "moments on the standard fixture") {
    withTempDir { dir =>
      fixture(dir)
      // edges (1-2)(1-3)(2-3)(3-4), degrees d1=2 d2=2 d3=3 d4=1:
      // sx=18 sxx=44 sxy=38 -> r = (304-324)/(352-324) = -20/28
      val row = GraphQueries.q194Assortativity.fn(spark, dir)
        .select("m", "sx", "sxx", "sxy", "r")
        .as[(Long, Long, Long, Long, Double)].collect().head
      row shouldBe ((4L, 18L, 44L, 38L, -20.0 / 28.0))
    }
  }

  test("q184 truss support: the standard fixture's one triangle credits " +
      "exactly its three edges") {
    withTempDir { dir =>
      fixture(dir)
      // triangle {1,2,3}: edges 1-2, 1-3, 2-3 support 1; edge 3-4 zero
      val out = GraphQueries.q184TrussSupport.fn(spark, dir)
        .select("support", "n_edges")
        .as[(Long, Long)].collect().toList
      out shouldBe List((0L, 1L), (1L, 3L))
    }
  }
}
