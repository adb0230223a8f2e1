package graft

import org.apache.spark.sql.functions._

/** Build-time enforcement of the Catalog determinism rule added after
  * q175 shipped red at the driver: NO multiply/divide on a
  * precision-saturated decimal (p >= 38, fractional scale) anywhere in
  * any declared query's analyzed plan — those operations sit exactly
  * where Spark's precision-loss rules and a DuckDB version's DOUBLE
  * promotion can disagree, and they pass every local sweep because the
  * local DuckDB resolves them exactly. The rule lived only in prose
  * when q175 broke; now it fails `sbt test`.
  */
class DecimalDisciplineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no declared query multiplies or divides a precision-saturated decimal") {
    val bad = Catalog.all.flatMap { q =>
      val v = ComparatorContract.wideDecimalArithmetic(
        q.fn(spark, sfDir).queryExecution.analyzed)
      if (v.isEmpty) Nil else Seq(s"${q.name} -> ${v.mkString("; ")}")
    }
    withClue(bad.mkString("\n")) { bad shouldBe empty }
  }

  test("the check catches the q175-shaped defect it was written for") {
    import spark.implicits._
    val df = Seq((1, BigDecimal("2.50")), (1, BigDecimal("3.50")))
      .toDF("k", "q")
      .groupBy(col("k"))
      // sum(decimal(30,2)) saturates to decimal(38,2)...
      .agg(sum(col("q").cast("decimal(30,2)")).as("w"))
      // ...and this multiply is the banned operation
      .select((col("w") * 2).as("w2"))
    val v = ComparatorContract.wideDecimalArithmetic(
      df.queryExecution.analyzed)
    v should not be empty
    v.mkString should include("multiply")
  }

  test("the sanctioned patterns pass: sum, round-emit, same-type compare") {
    import spark.implicits._
    val base = Seq((1, BigDecimal("2.50")), (2, BigDecimal("3.50")))
      .toDF("k", "q")
      .groupBy(col("k"))
      .agg(sum(col("q").cast("decimal(30,2)")).as("w"))
    val emit = base.select(round(col("w"), 2).cast("double").as("v"))
    val compare = base.as("a").join(base.as("b"),
      col("a.w") <= col("b.w"))
    ComparatorContract.wideDecimalArithmetic(
      emit.queryExecution.analyzed) shouldBe empty
    ComparatorContract.wideDecimalArithmetic(
      compare.queryExecution.analyzed) shouldBe empty
  }
}
