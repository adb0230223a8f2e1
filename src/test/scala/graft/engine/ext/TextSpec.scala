package graft.engine.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

/** Text/dedup primitives: shingle edges, hash ranges, and exact-dedup
  * semantics on synthetic duplicates (the fixture corpus has none, so the
  * keep-lowest-id contract is pinned here).
  */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: sliding k-windows, truncated tail, short-doc fallback") {
    val df = Seq("a b c d", "a b", "solo").toDF("text")
      .select(Text.shingles(Text.tokens(col("text")), 3).as("sh"))
    df.as[Seq[String]].collect().toSeq shouldBe Seq(
      Seq("a b c", "b c d"), // len-k+1 = 2 shingles
      Seq("a b"),            // shorter than k: whole text
      Seq("solo"))
  }

  test("regexTokens drops empty fragments and lowers") {
    val df = Seq(" Hello, WORLD!! 42 ").toDF("text")
      .select(Text.regexTokens(col("text")).as("t"))
    df.as[Seq[String]].head() shouldBe Seq("hello", "world", "42")
  }

  test("hash60/hash32 stay in range and are deterministic") {
    val df = Seq("x", "y", "x").toDF("s")
      .select(Text.hash32(col("s")).as("h32"), Text.hash60(col("s")).as("h60"))
    val rows = df.as[(Long, Long)].collect()
    all(rows.map(_._1)) should (be >= 0L and be < (1L << 32))
    all(rows.map(_._2)) should (be >= 0L and be < (1L << 60))
    rows(0) shouldBe rows(2) // same input, same hash
  }

  test("exact dedup keeps lowest doc_id per fingerprint") {
    val docs = Seq(
      (10L, "same text here"), (3L, "same text here"),
      (7L, "  SAME text HERE "), // trim+lower normalizes to the same fp
      (5L, "different"))
      .toDF("doc_id", "text")
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)
    val kept = docs.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("rn") === 1)
    kept.select("doc_id", "n_copies").as[(Long, Long)].collect().toSet shouldBe
      Set((3L, 3L), (5L, 1L))
  }

  test("wordSetHits counts occurrences with repetition") {
    val df = Seq("the cat the dog a cow").toDF("text")
      .select(Text.wordSetHits(Text.tokens(col("text")), Seq("the", "a")).as("n"))
    df.as[Int].head() shouldBe 3
  }
}
