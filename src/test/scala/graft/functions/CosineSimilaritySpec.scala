package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions.cosineSim

/** The custom Catalyst expression: eval + codegen paths, both element
  * types, SQL registration via GraftExtensions, and edge semantics.
  */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def expected(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(y => y * y).sum))
  }

  test("float arrays through the Column facade (codegen path)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b").select(cosineSim(col("a"), col("b")).as("c"))
    df.as[Double].head() shouldBe
      expected(Seq(1, 2, 3), Seq(4, 5, 6)) +- 1e-12
  }

  test("double arrays, identical vectors -> 1.0") {
    val df = Seq((Array(0.5, -2.0), Array(0.5, -2.0)))
      .toDF("a", "b").select(cosineSim(col("a"), col("b")).as("c"))
    df.as[Double].head() shouldBe 1.0 +- 1e-12
  }

  test("mixed float/double inputs are supported") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0, 1.0)))
      .toDF("a", "b").select(cosineSim(col("a"), col("b")).as("c"))
    df.as[Double].head() shouldBe 0.0 +- 1e-12
  }

  test("NULL input -> NULL; length mismatch -> common prefix") {
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b").select(cosineSim(col("a"), col("b")).as("c"))
    df.as[Option[Double]].head() shouldBe None

    val pfx = Seq((Array(1.0, 0.0, 9.0), Array(1.0, 0.0)))
      .toDF("a", "b").select(cosineSim(col("a"), col("b")).as("c"))
    // whole comparison (dot AND both norms) is over the common prefix:
    // cosine([1,0], [1,0]) = 1.0
    pfx.as[Double].head() shouldBe 1.0 +- 1e-12
  }

  test("registered as SQL function cosine_sim via GraftExtensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c")
    r.as[Double].head() shouldBe 1.0 +- 1e-12
  }

  test("interpreted eval path agrees with codegen") {
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4.0, 5.0, 6.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    e.eval(null).asInstanceOf[Double] shouldBe
      expected(Seq(1, 2, 3), Seq(4, 5, 6)) +- 1e-12
  }
}
