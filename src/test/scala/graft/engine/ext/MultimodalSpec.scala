package graft.engine.ext

import graft.SparkSpec
import graft.engine.ext.Multimodal.Media

/** The multimodal plumbing around the stubbed decoder: schema, metadata
  * struct, decode-pass partitioning, and the mapPartitions batch shape.
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

  test("sampleFrames: fixed windows, every-Nth stride, partial tail") {
    val media = Seq(Media(1L, (0 until 25).map(_.toByte).toArray, "video/fake"))
      .toDS()
    // 25 bytes / 10-byte frames -> frames 0,1,2 (last is 5 bytes); every 2nd -> 0,2
    val frames = Multimodal.sampleFrames(media, frameBytes = 10, everyN = 2)
      .collect().sortBy(_.frame_idx)
    frames.map(_.frame_idx).toSeq shouldBe Seq(0, 2)
    frames(0).frame.length shouldBe 10
    frames(1).frame.length shouldBe 5 // tail frame keeps the remainder
    frames(1).frame.head shouldBe 20.toByte
    // empty media yields no frames
    Multimodal.sampleFrames(Seq(Media(2L, Array.emptyByteArray, "v")).toDS(),
      10, 1).count() shouldBe 0
  }

  test("resizeFeatures: average pooling preserves id and byte count") {
    val fs = Seq(Multimodal.MediaFeatures(7L, 42L,
      Array(0.0f, 1.0f, 0.0f, 1.0f, 0.5f, 0.5f, 0.25f, 0.75f))).toDS()
    val out = Multimodal.resizeFeatures(fs, 4).collect().head
    out.id shouldBe 7L
    out.n_bytes shouldBe 42L
    out.features.toSeq shouldBe Seq(0.5f, 0.5f, 0.5f, 0.5f)
    // upsizing still yields the requested dim
    Multimodal.resizeFeatures(fs, 16).collect().head.features.length shouldBe 16
  }

  test("repartitionForDecode spreads blobs uniformly by id") {
    val media = Multimodal.mediaFromText(
      (1L to 64L).map(i => (i, "x" * (i.toInt % 7 + 1))).toDF("doc_id", "text"),
      "doc_id", "text")
    val parts = Multimodal.repartitionForDecode(media, 4)
    parts.rdd.getNumPartitions shouldBe 4
    parts.count() shouldBe 64
    // uniform hash spread: no partition hoards the rows
    val sizes = parts.rdd.mapPartitions(it => Iterator(it.size)).collect()
    all(sizes) should be < 40
  }
}
