package graft.engine

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Operator-level semantics pinned against the reference
  * (plugins/brewery_operators.py:255-265, data_quality_operator.py:57-71),
  * plus ScalaCheck-generated property tests (SURVEY.md §5.3).
  */
class SilverQualityGoldSpec extends SparkSpec {
  import spark.implicits._

  test("concat_ws skips NULLs but keeps empty strings (P4)") {
    val df = Seq(
      (Option("a"), Option("b"), Option("c")),
      (Option("a"), None, Option("c")),
      (None, None, None),
      (Option(""), Option("b"), None))
      .toDF("x", "y", "z")
      .select(Silver.fullAddress(col("x"), col("y"), col("z")).as("addr"))
    df.as[String].collect().toSeq shouldBe Seq("a, b, c", "a, c", "", ", b")
  }

  test("lenient cast: malformed -> NULL, valid -> value, under ANSI Spark 4 (P5)") {
    val df = Seq("1.5", "not-a-number", "", "-2e3", "  3.0  ")
      .toDF("s").select(Silver.castDoubleLenient(col("s")).as("d"))
    df.as[Option[Double]].collect().toSeq shouldBe
      Seq(Some(1.5), None, None, Some(-2000.0), Some(3.0))
  }

  test("gold group-count: count(col) skips null ids, NULL keys form groups (A1)") {
    val df = Seq(
      (Option("i1"), Option("micro"), "CA"),
      (Option("i2"), Option("micro"), "CA"),
      (None, Option("micro"), "CA"),      // null id: not counted
      (Option("i3"), None, "CA"))          // null key: own group
      .toDF("id", "t", "s")
    Gold.groupCount(df, Seq(col("t"), col("s")), col("id"), "n")
      .as[(Option[String], String, Long)].collect().toSet shouldBe
      Set((Some("micro"), "CA", 2L), (None, "CA", 1L))
  }

  test("quality report: one row per column, zero on empty input") {
    val df = Seq(("a", ""), ("", null.asInstanceOf[String]), ("c", "x"))
      .toDF("u", "v")
    Quality.report(df, Seq("u", "v")).as[(String, Long)].collect().toSet shouldBe
      Set(("u", 1L), ("v", 2L))
    Quality.report(df.limit(0), Seq("u", "v"))
      .as[(String, Long)].collect().toSet shouldBe Set(("u", 0L), ("v", 0L))
  }

  test("assertGate bounded probes: pass path runs without full scan semantics") {
    val df = (1 to 10).map(i => (s"id$i", s"n$i")).toDF("id", "name")
    noException should be thrownBy
      Quality.assertGate(df, Seq(Quality.MinCount(10), Quality.NotNullOrEmpty("id")))
    an[IllegalStateException] should be thrownBy
      Quality.assertGate(df, Seq(Quality.MinCount(11)))
  }

  // --- ScalaCheck-generated properties (generator-driven, one DF each) ---

  private val rawStrings: Seq[String] = Gen.listOfN(200,
    Gen.oneOf(
      Gen.alphaStr, Gen.asciiPrintableStr,
      Gen.const(""), Gen.const("  padded  "), Gen.const("MiXeD Case")))
    .sample.getOrElse(Seq.fill(200)("fallback"))

  test("observed gate: metrics collected in the SAME action match report") {
    val df = Seq(("a", "x"), ("", "y"), (null: String, "z"), ("d", ""))
      .toDF("name", "city")
    val (tagged, obs) = Quality.observed(df, Seq("name", "city"))
    tagged.write.format("noop").mode("overwrite").save() // the ONE action
    val m = obs.get
    m("rows") shouldBe 4L
    m("bad_name") shouldBe 2L // "" and null
    m("bad_city") shouldBe 1L // ""
    // and the after-the-fact gate throws exactly like assertGate
    val e = intercept[IllegalStateException] {
      Quality.assertObserved(obs, Seq(Quality.NotNullOrEmpty("name")))
    }
    e.getMessage should include("name")
    Quality.assertObserved(obs, Seq(Quality.MinCount(4))) // passes
  }

  test("observed gate: clean data passes all checks post-action") {
    val df = Seq(("a", "x"), ("b", "y")).toDF("name", "city")
    val (tagged, obs) = Quality.observed(df, Seq("name", "city"))
    tagged.write.format("noop").mode("overwrite").save()
    Quality.assertObserved(obs,
      Seq(Quality.MinCount(2), Quality.NotNullOrEmpty("name"),
        Quality.NotNullOrEmpty("city")))
  }

  test("property: normalization is idempotent (lower.lower = lower, trim.trim = trim)") {
    val df = rawStrings.toDF("s")
    df.filter(lower(lower(col("s"))) =!= lower(col("s"))).count() shouldBe 0
    df.filter(trim(trim(col("s"))) =!= trim(col("s"))).count() shouldBe 0
  }

  test("property: silver projection preserves row count (1:1, no filter)") {
    val df = rawStrings.zipWithIndex.toDF("s", "i")
    val projected = Silver.project(df, Seq(
      "id" -> col("i"), "clean" -> Silver.cleanName(col("s")),
      "key" -> Silver.normKey(col("s")),
      "num" -> Silver.castDoubleLenient(col("s"))))
    projected.count() shouldBe df.count()
  }

  test("property: sum of gold counts equals count of non-null count-column rows") {
    val rows = Gen.listOfN(300, for {
      id <- Gen.option(Gen.identifier)
      k <- Gen.oneOf("a", "b", "c")
    } yield (id, k)).sample.getOrElse(Seq.fill(300)((Option("x"), "a")))
    val df = rows.toDF("id", "k")
    val total = Gold.groupCount(df, Seq(col("k")), col("id"), "n")
      .agg(sum("n")).as[Long].head()
    total shouldBe rows.count(_._1.isDefined)
  }
}
