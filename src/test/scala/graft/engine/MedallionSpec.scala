package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end pipeline test over brewery-shaped data: the reference DAG
  * `extract >> bronze >> silver >> quality >> gold`
  * (reference: dags/dag-brewery_pipeline.py:119), with the gate exercised
  * both passing and tripping (VERDICT r1: assertGate was dead code).
  */
class MedallionSpec extends SparkSpec {
  import spark.implicits._

  // raw rows as the API would deliver them: whitespace, mixed case, null
  // address parts, malformed coordinates
  private def raw = Seq(
    ("b1", "  Foo Brew  ", "Micro", "1 Main St", null, "Unit 9", "SF", "CA", "us", "-122.4", "37.7"),
    ("b2", "Bar Brew", "BREWPUB", "2 Oak Ave", "Bldg 2", null, "LA", "CA", "us", "oops", "34.0"),
    ("b3", "Baz Brew", "micro", null, null, null, "NYC", "NY", "us", "-73.9", "40.7"))
    .toDF("id", "name", "brewery_type", "address_1", "address_2", "address_3",
      "city", "state_province", "country", "longitude", "latitude")

  private def projection = Seq(
    "id" -> col("id"),
    "brewery_name" -> Silver.cleanName(col("name")),
    "brewery_type" -> Silver.normKey(col("brewery_type")),
    "full_address" -> Silver.fullAddress(col("address_1"), col("address_2"), col("address_3")),
    "city" -> Silver.cleanName(col("city")),
    "state" -> col("state_province"),
    "country" -> col("country"),
    "longitude" -> Silver.castDoubleLenient(col("longitude")),
    "latitude" -> Silver.castDoubleLenient(col("latitude")))

  test("bronze -> silver -> gate -> gold, with reference semantics") {
    withTempDir { root =>
      val layout = Medallion.Layout(s"$root/bronze", s"$root/silver", s"$root/gold")
      Medallion.toBronze(raw, layout, "20240101_120000")
      val silver = Medallion.toSilver(spark, layout, projection, Seq("state"))

      silver.count() shouldBe 3 // projection is 1:1
      val byId = silver.collect().map(r => r.getAs[String]("id") -> r).toMap
      byId("b1").getAs[String]("brewery_name") shouldBe "Foo Brew" // trimmed
      byId("b2").getAs[String]("brewery_type") shouldBe "brewpub"  // lowered
      byId("b1").getAs[String]("full_address") shouldBe "1 Main St, Unit 9" // null skipped
      byId("b2").isNullAt(byId("b2").fieldIndex("longitude")) shouldBe true // malformed -> NULL
      byId("b3").getAs[Double]("longitude") shouldBe -73.9
      new java.io.File(s"$root/silver/state=CA").isDirectory shouldBe true

      val gated = Medallion.gate(silver, Seq(
        Quality.MinCount(3), Quality.NotNullOrEmpty("id"),
        Quality.NotNullOrEmpty("brewery_name"), Quality.NotNullOrEmpty("brewery_type")))

      val gold = Medallion.toGold(gated, layout,
        Seq(col("brewery_type"), col("state")), col("id"), "brewery_count")
      gold.as[(String, String, Long)].collect().toSet shouldBe
        Set(("micro", "CA", 1L), ("brewpub", "CA", 1L), ("micro", "NY", 1L))
      Sources.readParquet(spark, layout.goldPath).count() shouldBe 3
    }
  }

  test("gate trips block gold: min-count and null-or-empty (control flow)") {
    withTempDir { root =>
      val layout = Medallion.Layout(s"$root/bronze", s"$root/silver", s"$root/gold")
      Medallion.toBronze(raw, layout, "t0")
      val silver = Medallion.toSilver(spark, layout, projection, Seq("state"))

      the[IllegalStateException] thrownBy
        Medallion.gate(silver, Seq(Quality.MinCount(100))) should have message
        "record count below 100"

      val withEmpty = silver.withColumn("brewery_name",
        when(col("id") === "b2", "").otherwise(col("brewery_name")))
      an[IllegalStateException] should be thrownBy
        Medallion.gate(withEmpty, Seq(Quality.NotNullOrEmpty("brewery_name")))

      an[IllegalStateException] should be thrownBy
        Medallion.gate(silver.limit(0), Seq(Quality.MinCount(1))) // isEmpty guard

      new java.io.File(s"$root/gold").exists shouldBe false // gold never ran
    }
  }
}
