package graft.engine.ext

import org.scalacheck.Gen

import graft.SparkSpec

/** The winnowing guarantee (Schleimer et al. 2003, thm 1): with k-token
  * grams and a w-hash window, any two documents sharing a contiguous run
  * of at least k+w-1 tokens share at least one selected fingerprint —
  * regardless of what surrounds the run. Property-checked on generated
  * corpora: random prefixes/suffixes around a random shared run.
  */
class WinnowPropertySpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val W = 4
  private val vocab = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu")
  private def tokensGen(min: Int, max: Int): Gen[List[String]] =
    Gen.chooseNum(min, max).flatMap(n => Gen.listOfN(n, vocab))

  private def fpSets(docs: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    val df = Text.winnowFingerprints(
      docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
    df.select("doc_id", "wmin").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).toSet }
  }

  test("docs sharing a >= k+w-1 token run share a fingerprint (20 random cases)") {
    val cases = Gen.listOfN(20, for {
      shared <- tokensGen(K + W - 1, 2 * (K + W))
      pre1 <- tokensGen(0, 10)
      post1 <- tokensGen(0, 10)
      pre2 <- tokensGen(0, 10)
      post2 <- tokensGen(0, 10)
    } yield (
      (pre1 ++ shared ++ post1).mkString(" "),
      (pre2 ++ shared ++ post2).mkString(" ")))
      .sample.get
    // one Spark job for all cases: doc ids 2i / 2i+1 are a pair
    val docs = cases.zipWithIndex.flatMap { case ((t1, t2), i) =>
      Seq((2L * i) -> t1, (2L * i + 1) -> t2)
    }
    val sets = fpSets(docs)
    cases.indices.foreach { i =>
      val a = sets.getOrElse(2L * i, Set.empty)
      val b = sets.getOrElse(2L * i + 1, Set.empty)
      withClue(s"pair $i: ${cases(i)}") {
        a.intersect(b) should not be empty
      }
    }
  }

  test("fingerprint selection is position-robust: a pure shift changes nothing") {
    val base = Gen.listOfN(30, vocab).sample.get
    val shifted = List("pad1", "pad2", "pad3") ++ base
    val sets = fpSets(Seq(1L -> base.mkString(" "), 2L -> shifted.mkString(" ")))
    // every fingerprint of the base run reappears in the shifted doc
    sets(1L).subsetOf(sets(2L)) shouldBe true
  }
}
