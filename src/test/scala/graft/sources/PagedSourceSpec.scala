package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.engine.Silver

/** The DSv2 paged-ingest source: partition-per-page parallelism, the
  * short-last-page stop condition, column pruning pushdown, determinism,
  * and composition with the silver projection (S1 -> P1 path).
  */
class PagedSourceSpec extends SparkSpec {

  private def read(pages: Int, perPage: Int) =
    spark.read.format("paged-api")
      .option("pages", pages).option("per_page", perPage).load()

  test("transient fetch failures are absorbed by executor-side retry") {
    // every page's first 2 attempts throw; retries=3 -> scan succeeds
    // with content identical to the healthy source
    val flaky = spark.read.format("paged-api")
      .option("pages", 3).option("per_page", 10)
      .option("flaky_fail_first", 2).option("retries", 3)
      .load().orderBy("id").collect()
    flaky.toSeq shouldBe read(3, 10).orderBy("id").collect().toSeq
  }

  test("retry delay clamps BEFORE shifting: huge base cannot overflow") {
    // the round-5 latent defect: cap applied after the shift overflows to
    // a negative for base >= ~2^43, and Thread.sleep(negative) throws
    PagedSource.delayMs(Long.MaxValue / 2, 0) shouldBe PagedSource.MaxBackoffMs
    PagedSource.delayMs(Long.MaxValue / 2, 20) shouldBe PagedSource.MaxBackoffMs
    PagedSource.delayMs(Long.MaxValue, 63) shouldBe PagedSource.MaxBackoffMs
    for (base <- Seq(1L, 100L, 60000L, Long.MaxValue / 2);
         attempt <- 0 to 64) {
      val d = PagedSource.delayMs(base, attempt)
      d should be >= 0L
      d should be <= PagedSource.MaxBackoffMs
    }
    // doubling still doubles below the cap
    PagedSource.delayMs(100, 0) shouldBe 100
    PagedSource.delayMs(100, 3) shouldBe 800
  }

  test("persistent fetch failure propagates after retries are exhausted") {
    val ex = intercept[Exception] {
      spark.read.format("paged-api")
        .option("pages", 2).option("per_page", 5)
        .option("flaky_fail_first", 5).option("retries", 3)
        .load().count()
    }
    // the underlying transient error surfaces through Spark's task failure
    ex.toString + Option(ex.getCause).mkString should include("transient fetch failure")
  }

  test("one InputPartition per page; last page is short (stop condition)") {
    val df = read(pages = 4, perPage = 50)
    df.rdd.getNumPartitions shouldBe 4
    df.count() shouldBe (3 * 50 + 25)
  }

  test("deterministic content, stable across reads") {
    val a = read(3, 10).orderBy("id").collect()
    val b = read(3, 10).orderBy("id").collect()
    a.toSeq shouldBe b.toSeq
    a.head.getAs[String]("id") shouldBe "b0"
  }

  test("column pruning reaches the reader (ReadSchema is pruned)") {
    val pruned = read(2, 10).select("id", "state_province")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    scan.schema.fieldNames.toSeq shouldBe Seq("id", "state_province")
    pruned.count() shouldBe 15
  }

  test("feeds the silver projection (S1 -> P1-P6)") {
    val silver = Silver.project(read(2, 20), Seq(
      "id" -> col("id"),
      "brewery_name" -> Silver.cleanName(col("name")),
      "brewery_type" -> Silver.normKey(col("brewery_type")),
      "state" -> col("state_province"),
      "longitude" -> Silver.castDoubleLenient(col("longitude"))))
    silver.count() shouldBe 30
    // k % 13 == 0 rows carry the malformed longitude -> NULL under try_cast
    silver.filter(col("longitude").isNull).count() shouldBe
      (0 until 30).count(_ % 13 == 0)
  }

  test("microbatch stream: one page per trigger, every row exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    spark.catalog.dropTempView("paged_stream_mem")
    val q = spark.readStream.format("paged-api")
      .option("pages", 4).option("per_page", 10)
      .option("max_pages_per_trigger", 1)
      .load()
      .writeStream.format("memory").queryName("paged_stream_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // 4 admission-controlled batches of one page each
    q.recentProgress.count(_.numInputRows > 0) shouldBe 4
    val got = spark.table("paged_stream_mem")
    // identical content to the batch scan, each row exactly once
    val batch = read(4, 10)
    got.count() shouldBe batch.count()
    got.select("id").distinct().count() shouldBe batch.count()
    got.exceptAll(batch).count() shouldBe 0
    batch.exceptAll(got).count() shouldBe 0
  }

  test("microbatch stream without admission cap drains in one batch") {
    import org.apache.spark.sql.streaming.Trigger
    spark.catalog.dropTempView("paged_stream_all_mem")
    val q = spark.readStream.format("paged-api")
      .option("pages", 3).option("per_page", 8)
      .load()
      .writeStream.format("memory").queryName("paged_stream_all_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.count(_.numInputRows > 0) shouldBe 1
    spark.table("paged_stream_all_mem").count() shouldBe read(3, 8).count()
  }
}
