package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.GraftFunctions.arrayModeCount

/** The fused array_mode_count expression: value parity with the
  * explode→count→max composition on random arrays, edge semantics, SQL
  * registration, and interpreted-vs-codegen agreement.
  */
class ArrayModeCountSpec extends SparkSpec {
  import spark.implicits._

  test("matches explode -> groupBy count -> max on random arrays") {
    val gen = Gen.listOfN(40,
      Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")))
    val arrays = gen.sample.get.filter(_.nonEmpty)
    val df = arrays.zipWithIndex.map { case (xs, i) => (i.toLong, xs) }
      .toDF("id", "xs")
    val fused = df.select(col("id"), arrayModeCount(col("xs")).as("m"))
      .as[(Long, Int)].collect().toMap
    val composed = df
      .select(col("id"), explode(col("xs")).as("x"))
      .groupBy("id", "x").count()
      .groupBy("id").agg(max("count").as("m"))
      .as[(Long, Long)].collect().toMap
    fused.keySet shouldBe composed.keySet
    fused.foreach { case (id, m) => m.toLong shouldBe composed(id) }
  }

  test("empty array -> 0; NULL array -> NULL; null elements count") {
    val df = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, None: Option[Seq[String]]),
      (3L, Some(Seq[String]("a", null, null)))
    ).toDF("id", "xs")
    val out = df.select(col("id"), arrayModeCount(col("xs")))
      .collect().map(r => r.getLong(0) -> r).toMap
    out(1L).getInt(1) shouldBe 0
    assert(out(2L).isNullAt(1))
    out(3L).getInt(1) shouldBe 2 // the two nulls are the mode
  }

  test("registered as SQL function array_mode_count via GraftExtensions") {
    Seq(Tuple1(Seq("x", "y", "x"))).toDF("xs").createOrReplaceTempView("amc")
    spark.sql("SELECT array_mode_count(xs) AS m FROM amc")
      .as[Int].head() shouldBe 2
  }

  test("interpreted eval path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def lit(xs: Seq[String]) = Literal(
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray),
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))
    val e = ArrayModeCount(lit(Seq("a", "b", "a", "a", "b")))
    e.eval(null) shouldBe 3 // interpreted path directly
  }
}
