package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q54's sketches can't be oracle-checked (estimates are implementation-
  * specific), so this spec is their correctness story: error bounds
  * against the exact answers on the real sf0.001 fixture.
  */
class SketchAccuracySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("HLL vocab estimate within 3x the configured rsd of exact") {
    val docs = graft.engine.Tables.load(spark, dir, "documents")
    val toks = docs.select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    val exact = toks.groupBy("lang").agg(count_distinct(col("tok")).as("v"))
      .as[(String, Long)].collect().toMap
    val approx = TextQueries.q54Sketches.fn(spark, dir)
      .select("lang", "approx_vocab").as[(String, Long)].collect().toMap
    exact.foreach { case (lang, ex) =>
      val ap = approx(lang).toDouble
      withClue(s"$lang exact=$ex approx=$ap: ") {
        math.abs(ap - ex) / ex should be <= 0.06 // rsd=0.02, 3 sigma
      }
    }
  }

  test("approx median within the rank tolerance of the exact median") {
    val docs = graft.engine.Tables.load(spark, dir, "documents")
    val approx = TextQueries.q54Sketches.fn(spark, dir)
      .select("lang", "approx_median_chars").as[(String, Long)].collect().toMap
    approx.foreach { case (lang, ap) =>
      // exact rank window: with accuracy 10000 the estimate's rank error
      // is <= n/10000 — assert the value lies between the 45th and 55th
      // percentile values (a loose but meaningful envelope)
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
