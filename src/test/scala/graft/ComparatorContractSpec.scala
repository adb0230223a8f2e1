package graft

import org.apache.spark.sql.types._

/** Build-time enforcement of [[ComparatorContract]]: no declared query
  * may emit a column type the driver's pandas/DuckDB comparator cannot
  * sort/hash (binary, nested, timestamp/date). Round 4 shipped exactly
  * this break (q65's raw binary frame column) because the rule lived
  * only in the Catalog's prose contract; now it fails `sbt test`.
  */
class ComparatorContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every declared query's output schema satisfies the comparator contract") {
    // Batch queries are lazy (schema costs a plan, not a run); the three
    // streaming queries execute their bounded fixture eagerly — cheap at
    // sf0.001 and worth it: their memory-sink schema is the real output.
    val bad = Catalog.all.flatMap { q =>
      val v = ComparatorContract.violations(q.fn(spark, sfDir).schema)
      if (v.isEmpty) Nil else Seq(s"${q.name} -> ${v.mkString("; ")}")
    }
    withClue(bad.mkString("\n")) { bad shouldBe empty }
  }

  test("a deliberately-binary output schema is rejected") {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame", BinaryType)))
    ComparatorContract.violations(schema).mkString should include("frame")
    an[IllegalStateException] should be thrownBy
      ComparatorContract.require("q_bad", schema)
  }

  test("nested and temporal output types are rejected, scalars pass") {
    ComparatorContract.violations(StructType(Seq(
      StructField("xs", ArrayType(IntegerType))))) should have size 1
    ComparatorContract.violations(StructType(Seq(
      StructField("m", MapType(StringType, LongType))))) should have size 1
    ComparatorContract.violations(StructType(Seq(
      StructField("s", StructType(Seq(StructField("a", IntegerType))))))) should have size 1
    ComparatorContract.violations(StructType(Seq(
      StructField("ts", TimestampType)))) should have size 1
    ComparatorContract.violations(StructType(Seq(
      StructField("d", DateType)))) should have size 1
    ComparatorContract.violations(StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("flag", BooleanType),
      StructField("dec", DecimalType(30, 10))))) shouldBe empty
  }

  test("types outside the allowlist are rejected, not silently passed") {
    // the pandas comparator can't sort/hash these either; the guard is an
    // allowlist so a FUTURE unhandled type fails here, not driver-side
    ComparatorContract.violations(StructType(Seq(
      StructField("iv", DayTimeIntervalType())))) should have size 1
    ComparatorContract.violations(StructType(Seq(
      StructField("iv", YearMonthIntervalType())))) should have size 1
    ComparatorContract.violations(StructType(Seq(
      StructField("iv", CalendarIntervalType)))) should have size 1
    // a bare lit(null) column is NullType
    ComparatorContract.violations(StructType(Seq(
      StructField("n", NullType)))) should have size 1
  }
}
