package graft.engine

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Fixture-schema contract: every column of every fixture table must
  * load with the Spark-side type the 161 verified queries were built
  * against, so the NEXT driver-side fixture regeneration that drifts a
  * physical encoding fails HERE, loudly and by name — not as three
  * obscure streaming-spec analysis errors (the round-8 failure mode:
  * `events.ts` silently moved from TIMESTAMP(NANOS)-as-long to µs
  * TIMESTAMP_NTZ and broke `ts div 1000` arithmetic in every spec that
  * read the file raw).
  *
  * Contract granularity:
  *  - exact types for the integer/double/string columns (a drifted key
  *    width or a stringly-typed number is always a bug);
  *  - a small acceptance SET for the date-ish columns (`o_orderdate`,
  *    `l_shipdate`): TIMESTAMP vs TIMESTAMP_NTZ is a known generator
  *    degree of freedom and every consumer goes through date functions
  *    that accept either — but a flip to DATE/BIGINT/STRING fails;
  *  - `events.ts` is asserted POST-`Tables.load`, i.e. the seam
  *    [[Tables.normalizeEventTs]] must have mapped whatever physical
  *    encoding the fixture has onto the engine-wide BIGINT-ns contract.
  *    The negative test pins that an unsupported encoding throws
  *    instead of flowing downstream as a type surprise.
  */
class FixtureContractSpec extends SparkSpec {

  private val ts: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private def exact(t: DataType): Set[DataType] = Set(t)

  /** name -> (column -> acceptable Spark types), post-Tables.load. */
  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> exact(IntegerType), "r_name" -> exact(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> exact(IntegerType), "n_name" -> exact(StringType),
      "n_regionkey" -> exact(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> exact(LongType), "c_name" -> exact(StringType),
      "c_nationkey" -> exact(IntegerType), "c_acctbal" -> exact(DoubleType),
      "c_mktsegment" -> exact(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> exact(LongType), "s_name" -> exact(StringType),
      "s_nationkey" -> exact(IntegerType), "s_acctbal" -> exact(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> exact(LongType), "p_name" -> exact(StringType),
      "p_brand" -> exact(StringType), "p_type" -> exact(StringType),
      "p_size" -> exact(IntegerType), "p_retailprice" -> exact(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> exact(LongType), "o_custkey" -> exact(LongType),
      "o_orderstatus" -> exact(StringType),
      "o_totalprice" -> exact(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> exact(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> exact(LongType), "l_partkey" -> exact(LongType),
      "l_suppkey" -> exact(LongType), "l_linenumber" -> exact(IntegerType),
      "l_quantity" -> exact(DoubleType),
      "l_extendedprice" -> exact(DoubleType),
      "l_discount" -> exact(DoubleType), "l_tax" -> exact(DoubleType),
      "l_returnflag" -> exact(StringType),
      "l_linestatus" -> exact(StringType), "l_shipdate" -> ts),
    "events" -> Seq(
      "event_id" -> exact(LongType),
      // the engine-wide contract: epoch NANOSECONDS as BIGINT, whatever
      // the physical encoding was (normalizeEventTs is part of load)
      "ts" -> exact(LongType),
      "user_id" -> exact(LongType), "event_type" -> exact(StringType),
      "value" -> exact(DoubleType), "props" -> exact(StringType)),
    "documents" -> Seq(
      "doc_id" -> exact(LongType), "text" -> exact(StringType),
      "lang" -> exact(StringType), "source" -> exact(StringType),
      "n_chars" -> exact(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> exact(LongType),
      "embedding" -> Set[DataType](ArrayType(FloatType),
        ArrayType(FloatType, containsNull = false)),
      "label" -> exact(IntegerType)),
  )

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf: every fixture table loads with the contracted schema") {
      val dir = s"/root/testdata/$sf"
      Tables.all.foreach { name =>
        val got = Tables.load(spark, dir, name).schema
        val want = contract(name)
        withClue(s"$name: ") {
          got.fields.map(_.name).toSeq shouldBe want.map(_._1)
        }
        want.foreach { case (colName, ok) =>
          val actual = got(colName).dataType
          withClue(s"$name.$colName (physical drift? re-verify every " +
            s"consumer before relaxing this): ") {
            ok should contain(actual)
          }
        }
      }
    }
  }

  test("a deliberately wrong events.ts encoding trips the load seam " +
    "instead of flowing downstream") {
    withTempDir { dir =>
      spark.range(0, 10)
        .selectExpr("id AS event_id", "CAST(id AS STRING) AS ts",
          "id AS user_id")
        .write.parquet(s"$dir/bad_events.parquet")
      val bad = spark.read.parquet(s"$dir/bad_events.parquet")
      val e = intercept[IllegalStateException] {
        Tables.normalizeEventTs(bad)
      }
      e.getMessage should include("unsupported physical type")
    }
  }
}
