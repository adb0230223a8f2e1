package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions.mortonCode

/** The native morton_code bit spread: value parity with the per-bit
  * arithmetic form q267's oracle uses, interleave structure, null/type
  * handling, SQL registration, and interpreted-vs-codegen agreement.
  */
class MortonCodeSpec extends SparkSpec {
  import spark.implicits._

  private def arithmeticForm(bits: Int): String =
    (0 until bits).map { i =>
      val p = 1L << i; val zx = 1L << (2 * i); val zy = 1L << (2 * i + 1)
      s"((x div $p) % 2) * $zx + ((y div $p) % 2) * $zy"
    }.mkString(" + ")

  test("matches the per-bit arithmetic form over the full 2^5 x 2^5 grid") {
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val df = grid.toDF("x", "y")
    val out = df.select(
      mortonCode(col("x"), col("y")).as("native"),
      expr(arithmeticForm(5)).as("arith"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, a) => n shouldBe a }
    // and the interleave is a bijection on the grid
    df.select(mortonCode(col("x"), col("y"))).distinct().count() shouldBe
      32L * 32L
  }

  test("wide inputs: full 32-bit keys interleave without collision " +
      "on the sampled diagonal") {
    val vals = Seq(0L, 1L, 2L, 255L, 256L, 65535L, 65536L,
      0x7FFFFFFFL, 0xFFFFFFFFL)
    val df = vals.map(v => (v, v)).toDF("x", "y")
    val out = df.select(mortonCode(col("x"), col("y"))).as[Long].collect()
    out.toSet.size shouldBe vals.size
    // x=y interleaves each set bit into a pair: code = 3 * spread(x)
    vals.zip(out).foreach { case (v, code) =>
      code shouldBe 3L * MortonCode.spread(v)
    }
  }

  test("structure: x occupies even bits, y odd bits") {
    val df = Seq((0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL)).toDF("x", "y")
    val out = df.select(mortonCode(col("x"), col("y"))).as[Long].collect()
    out(0) shouldBe 0x5555555555555555L
    out(1) shouldBe java.lang.Long.parseUnsignedLong("aaaaaaaaaaaaaaaa", 16)
  }

  test("NULL in -> NULL out; non-bigint inputs are a type error") {
    val df = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
    assert(df.select(mortonCode(col("x"), col("y"))).collect()(0).isNullAt(0))
    val bad = intercept[Exception] {
      Seq(("a", 1L)).toDF("x", "y")
        .select(mortonCode(col("x"), col("y"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("bigint") ||
      bad.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("interpreted eval path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // the DataFrame tests above exercise whole-stage codegen; this
    // drives the interpreted nullSafeEval directly on the same cases
    for ((x, y) <- Seq((3L, 1L), (31L, 17L), (0xFFFFFFFFL, 0L),
        (123456789L, 987654321L))) {
      val e = MortonCode(Literal(x), Literal(y))
      e.eval(null).asInstanceOf[Long] shouldBe
        (MortonCode.spread(x) | (MortonCode.spread(y) << 1))
      // and against the per-bit definition, bit by bit
      val code = e.eval(null).asInstanceOf[Long]
      for (i <- 0 until 32) {
        ((code >> (2 * i)) & 1L) shouldBe ((x >> i) & 1L)
        ((code >> (2 * i + 1)) & 1L) shouldBe ((y >> i) & 1L)
      }
    }
  }

  test("SQL surface: morton_code resolves through the extension registry") {
    val out = spark.sql(
      "SELECT morton_code(CAST(3 AS BIGINT), CAST(1 AS BIGINT))")
      .as[Long].head()
    // x=3 -> bits 0,2 set (0b0101); y=1 -> bit 1 set (0b010) => 0b0111
    out shouldBe 7L
  }
}
