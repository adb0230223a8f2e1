package graft.functions

import org.apache.spark.sql.functions.{size => asize, _}

import graft.SparkSpec
import graft.functions.GraftFunctions.jaccardSim

/** The fused jaccard_sim expression: value parity with the composed
  * array_intersect/array_union form, set semantics, null handling, and
  * interpreted-vs-codegen agreement.
  */
class JaccardSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    (Seq("a", "b", "c"), Seq("b", "c", "d")),        // 2/4
    (Seq("a", "a", "b"), Seq("b", "b", "a")),        // dups: 2/2
    (Seq("a"), Seq("b")),                            // disjoint: 0/2
    (Seq("x", "y", "z"), Seq("x", "y", "z")),        // identical: 1.0
    (Seq.empty[String], Seq("a")))                   // 0/1

  test("matches the composed intersect/union form on every case") {
    val df = pairs.toDF("a", "b")
    val both = df.select(
      jaccardSim(col("a"), col("b")).as("fused"),
      (asize(array_intersect(col("a"), col("b"))).cast("double") /
        asize(array_union(col("a"), col("b")))).as("composed"))
      .as[(Double, Double)].collect()
    both.foreach { case (f, c) => f shouldBe c }
  }

  test("empty-vs-empty yields NaN where the composed form would THROW") {
    // Spark 4 ANSI raises DIVIDE_BY_ZERO for the composed form's int
    // divisor; the fused expression keeps IEEE double semantics (0/0=NaN)
    // — a dedup job doesn't die on two empty documents.
    val df = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    val out = df.select(jaccardSim(col("a"), col("b"))).as[Double].head()
    assert(out.isNaN)
  }

  test("NULL array yields NULL; null elements count as a value") {
    val df = Seq(
      (Some(Seq("a")), None: Option[Seq[String]]),
      (Some(Seq("a", null)), Some(Seq[String]("a", null)))
    ).toDF("a", "b")
    val out = df.select(jaccardSim(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    out(1).getDouble(0) shouldBe 1.0 // {a, null} vs {a, null}
  }

  test("registered as SQL function jaccard_sim via GraftExtensions") {
    pairs.take(1).toDF("a", "b").createOrReplaceTempView("jp")
    spark.sql("SELECT jaccard_sim(a, b) AS j FROM jp")
      .as[Double].head() shouldBe 0.5
  }

  test("interpreted eval path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def lit(xs: Seq[String]) = Literal(
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))
    val e = JaccardSimilarity(lit(Seq("a", "b", "c")), lit(Seq("b", "c", "d")))
    e.eval(null) shouldBe 0.5 // interpreted path directly
  }
}
