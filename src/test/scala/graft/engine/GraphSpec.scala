package graft.engine

import org.scalacheck.Gen

import graft.SparkSpec
import graft.engine.ext.Graph

/** Large-star/small-star connected components against a driver-side
  * union-find ground truth on random graphs, plus the asymptotic claim
  * that motivates the algorithm: a long chain converges in O(log n)
  * rounds where label propagation needs one round per hop.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min-id labels for vertices that appear in some edge, q43's contract
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // after full path compression the root IS the component min, because
    // union always points the larger root at the smaller
    verts.map(v => v -> find(v.toInt).toLong).toMap
  }

  test("matches a driver-side union-find on random graphs") {
    val genEdges = for {
      n <- Gen.choose(5, 30)
      m <- Gen.choose(1, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1)
        b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (n, es)
    (1 to 15).foreach { i =>
      val (n, es) = genEdges.sample.get
      val expected = unionFind(n, es.filter(e => e._1 != e._2))
      val got = Graph.largeSmallStarComponents(es.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      withClue(s"case $i (n=$n, edges=$es): ") { got shouldBe expected }
    }
  }

  test("a 100-vertex chain converges within the O(log n) round budget") {
    // label propagation needs ~100 rounds here (one per hop); the star
    // rounds square the collapse distance, so well under 10 suffice
    val chain = (0L until 99L).map(i => (i, i + 1))
    val labels = Graph.largeSmallStarComponents(chain.toDF("a", "b"),
      maxRounds = 10).as[(Long, Long)].collect().toMap
    labels.size shouldBe 100
    labels.values.toSet shouldBe Set(0L)
  }

  test("self-loops, duplicates, and reversed edges are tolerated") {
    val edges = Seq((3L, 3L), (1L, 2L), (2L, 1L), (1L, 2L), (5L, 4L))
    val labels = Graph.largeSmallStarComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    // the pure self-loop vertex has no real edge -> absent, like q43
    labels shouldBe Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L)
  }

  test("empty edge set yields an empty labeling") {
    val labels = Graph.largeSmallStarComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    labels.count() shouldBe 0L
  }
}
