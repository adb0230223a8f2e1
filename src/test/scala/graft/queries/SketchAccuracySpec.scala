package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q54's sketch ESTIMATES are implementation-specific, so the query now
  * verifies them in-query (exact-vs-sketch `within_bounds` booleans that
  * the DuckDB oracle hash-checks as literal trues). This spec keeps the
  * unit-level story: the booleans really hold on a second fixture
  * (sf0.001), and an independently-computed HLL estimate honors the
  * 3-sigma rsd envelope the query claims.
  */
class SketchAccuracySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q54's in-query bound booleans hold on sf0.001") {
    val rows = TextQueries.q54Sketches.fn(spark, dir)
      .select("lang", "vocab_within_bounds", "median_within_bounds")
      .as[(String, Boolean, Boolean)].collect()
    rows should not be empty
    rows.foreach { case (lang, vocabOk, medianOk) =>
      withClue(s"$lang: ") { (vocabOk, medianOk) shouldBe ((true, true)) }
    }
  }

  test("HLL vocab estimate within 3x the configured rsd of exact") {
    val docs = graft.engine.Tables.load(spark, dir, "documents")
    val toks = docs.select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    val both = toks.groupBy("lang")
      .agg(count_distinct(col("tok")).as("exact"),
        approx_count_distinct(col("tok"), rsd = 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    both should not be empty
    both.foreach { case (lang, ex, ap) =>
      withClue(s"$lang exact=$ex approx=$ap: ") {
        math.abs(ap.toDouble - ex) / ex should be <= 0.06 // rsd=0.02, 3 sigma
      }
    }
  }

  test("approx median lands inside a 45th-55th percentile envelope") {
    val docs = graft.engine.Tables.load(spark, dir, "documents")
    val approx = docs.groupBy("lang")
      .agg(percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("m"))
      .as[(String, Long)].collect().toMap
    approx should not be empty
    approx.foreach { case (lang, ap) =>
      val vals = docs.filter(col("lang") === lang)
        .select(col("n_chars").cast("long")).as[Long].collect().sorted
      val lo = vals((vals.length * 0.45).toInt)
      val hi = vals(math.min((vals.length * 0.55).toInt, vals.length - 1))
      withClue(s"$lang approx=$ap window=[$lo,$hi]: ") {
        ap should (be >= lo and be <= hi)
      }
    }
  }
}
