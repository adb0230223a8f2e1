package graft.engine.ext

import graft.SparkSpec
import graft.engine.ext.Multimodal.Media

/** The multimodal plumbing around the stubbed decoder: schema, metadata
  * struct, size-bucketed partitioning, and the mapPartitions batch shape.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mediaFromText: binary payload + typed metadata struct") {
    val docs = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromText(docs, "doc_id", "text")
    media.schema("media").dataType.typeName shouldBe "binary"
    val r = media.orderBy("id").collect()
    r(0).getAs[Row]("meta") // forces struct access path
    val meta0 = r(0).getStruct(r(0).fieldIndex("meta"))
    meta0.getAs[String]("mime") shouldBe "text/plain"
    meta0.getAs[Long]("n_bytes") shouldBe 5L
    meta0.getAs[String]("content_hash") should have length 32
  }
  type Row = org.apache.spark.sql.Row

  test("decodeFeatures: deterministic stub features with fixed dim") {
    val media = Seq(
      Media(1L, "abcdef".getBytes("UTF-8"), "text/plain"),
      Media(2L, Array.emptyByteArray, "text/plain"),
      Media(3L, null, "text/plain")).toDS()
    val out = Multimodal.decodeFeatures(media).collect().sortBy(_.id)
    out.map(_.features.length).toSeq shouldBe Seq(8, 8, 8)
    out(0).n_bytes shouldBe 6L
    out(1).n_bytes shouldBe 0L
    out(2).n_bytes shouldBe 0L // null media treated as empty
    all(out(0).features) should (be >= 0.0f and be <= 1.0f)
    // deterministic: same input, same features
    val again = Multimodal.decodeFeatures(media).collect().sortBy(_.id)
    again(0).features.toSeq shouldBe out(0).features.toSeq
  }

  test("repartitionBySize groups comparable blob sizes") {
    val media = Multimodal.mediaFromText(
      Seq((1L, "x"), (2L, "y" * 1000), (3L, "z")).toDF("doc_id", "text"),
      "doc_id", "text")
    val parts = Multimodal.repartitionBySize(media, 4)
    parts.rdd.getNumPartitions shouldBe 4
    parts.count() shouldBe 3
  }
}
