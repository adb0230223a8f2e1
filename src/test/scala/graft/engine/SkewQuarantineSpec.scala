package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted-join equivalence and the quarantine split. */
class SkewQuarantineSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join under skew") {
    // heavy skew: one key owns 90% of the left side
    val left = ((1 to 900).map(i => (1L, s"v$i")) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, s"w$i"))).toDF("k", "payload")
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (9L, "unmatched-side"))
      .toDF("k", "dim")
    val plain = left.join(right, Seq("k")).select("k", "payload", "dim")
    val salted = Skew.saltedJoin(left, right, Seq("k"), saltBuckets = 8)
      .select("k", "payload", "dim")
    salted.count() shouldBe plain.count()
    salted.except(plain).count() shouldBe 0
    plain.except(salted).count() shouldBe 0
  }

  test("quarantine splits clean vs violating rows in one predicate") {
    val df = Seq(
      ("a", "x"), ("", "y"), ("c", null.asInstanceOf[String]), ("d", "z"))
      .toDF("id", "name")
    val (clean, bad) = Quality.quarantine(df, Seq("id", "name"))
    clean.select("id").as[String].collect().toSet shouldBe Set("a", "d")
    bad.count() shouldBe 2
    clean.count() + bad.count() shouldBe df.count()
    // quarantined rows keep full fidelity for triage
    bad.columns.toSeq shouldBe df.columns.toSeq
  }

  test("saltedJoin with one bucket degenerates to the plain join") {
    val left = Seq((1L, "p")).toDF("k", "payload")
    val right = Seq((1L, "d")).toDF("k", "dim")
    Skew.saltedJoin(left, right, Seq("k"), 1).count() shouldBe 1
  }
}
