package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions.minhashAgg

/** The native minhash buffer ([[MinHashAgg]]) against the relational
  * min-over-explode it replaces — slot-for-slot equality, including
  * under forced multi-partition partial/merge, plus SQL registration.
  */
class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  private val P = MinHashAgg.P
  private val K = 8

  private def relationalSig(df: org.apache.spark.sql.DataFrame) = {
    val ex = df
      .select(col("doc_id"), md5(col("sch")).as("m"))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("h2"))
    val sigCols = (0 until K).map(i =>
      min(pmod(col("h1") + lit(i.toLong) * col("h2"), lit(P))).as(s"m$i"))
    ex.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
  }

  private val docs = (1L to 20L).flatMap(d =>
    (0 until 15).map(j => (d, s"shingle $d-${j % 7} ${j * 31}")))

  test("native buffer equals min-over-explode slot for slot") {
    val df = docs.toDF("doc_id", "sch")
    val native = df.groupBy(col("doc_id"))
      .agg(minhashAgg(col("sch"), K).as("sig"))
      .select(col("doc_id") +: (0 until K)
        .map(i => element_at(col("sig"), i + 1).as(s"m$i")): _*)
    val rel = relationalSig(df)
    native.except(rel).count() shouldBe 0
    rel.except(native).count() shouldBe 0
  }

  test("partial buffers merge correctly across forced partitions") {
    val df = docs.toDF("doc_id", "sch").repartition(13) // scatter groups
    val native = df.groupBy(col("doc_id"))
      .agg(minhashAgg(col("sch"), K).as("sig"))
      .select(col("doc_id") +: (0 until K)
        .map(i => element_at(col("sig"), i + 1).as(s"m$i")): _*)
    relationalSig(df).except(native).count() shouldBe 0
  }

  test("NULL shingles are skipped, not folded as a value") {
    val df = Seq((1L, Some("a b c")), (1L, None), (1L, Some("d e f")))
      .toDF("doc_id", "sch")
    val withNull = df.groupBy(col("doc_id"))
      .agg(minhashAgg(col("sch"), K).as("sig"))
    val withoutNull = df.filter(col("sch").isNotNull).groupBy(col("doc_id"))
      .agg(minhashAgg(col("sch"), K).as("sig"))
    withNull.except(withoutNull).count() shouldBe 0
  }

  test("registered as SQL aggregate minhash_agg via GraftExtensions") {
    docs.toDF("doc_id", "sch").createOrReplaceTempView("mh_in")
    try {
      val viaSql = spark.sql(
        s"SELECT doc_id, minhash_agg(sch, $K) AS sig FROM mh_in GROUP BY 1")
        .select(col("doc_id") +: (0 until K)
          .map(i => element_at(col("sig"), i + 1).as(s"m$i")): _*)
      relationalSig(docs.toDF("doc_id", "sch"))
        .except(viaSql).count() shouldBe 0
    } finally spark.catalog.dropTempView("mh_in")
  }
}
