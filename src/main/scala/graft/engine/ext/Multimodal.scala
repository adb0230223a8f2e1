package graft.engine.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star surface): media as opaque
  * `binary` columns with typed metadata, decode / feature-extraction as
  * partition-wise batch operators.
  *
  * The container has no image/audio codecs, so `decodeFeatures` is a
  * clearly-marked STUB — a deterministic fake that stands where libjpeg /
  * ffmpeg bindings would be called per batch. Everything AROUND the stub
  * is the real engineering and is tested: the schema (binary + metadata
  * struct), the `mapPartitions` batch shape (one codec init per
  * partition, streamed per-row work — the JVM analog of `mapInPandas`
  * batches), and the partitioning story.
  *
  * ## 100 TB notes
  *  - Media bytes dominate row width: keep them in their own column so
  *    metadata-only queries prune the scan to kilobytes per row group
  *    (columnar pruning does this for free — never pack bytes in structs
  *    with hot columns).
  *  - `repartitionBySize` bounds per-task memory: tasks get either many
  *    small blobs or few large ones, not a skewed mix.
  *  - Decode is embarrassingly parallel; the expensive init (codec
  *    context) happens once per PARTITION inside mapPartitions, not per
  *    row.
  */
object Multimodal {

  final case class Media(id: Long, media: Array[Byte], mime: String)
  final case class MediaFeatures(id: Long, n_bytes: Long, features: Array[Float])

  /** Feature width of the stub "decoder". */
  val FeatureDim = 8

  /** Opaque-binary media table derived from a text corpus (fixture
    * stand-in for real image/audio bytes) with a typed metadata struct.
    */
  def mediaFromText(docs: DataFrame, idCol: String, textCol: String,
                    passthrough: Seq[String] = Nil): DataFrame =
    docs.select(Seq(
      col(idCol).as("id"),
      col(textCol).cast("binary").as("media"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col(textCol).cast("binary")).as("n_bytes"),
        md5(col(textCol).cast("binary")).as("content_hash")).as("meta"))
      ++ passthrough.map(col): _*)

  /** Bound per-task bytes by clustering rows into size buckets before a
    * decode pass (log2 of the blob size).
    */
  def repartitionBySize(media: DataFrame, partitions: Int): DataFrame =
    media.repartition(partitions,
      ceil(log(2.0, greatest(octet_length(col("media")).cast("double"), lit(1.0)))))

  /** Partition-wise decode + feature extraction.
    *
    * STUB: the per-row body fakes a decode by averaging fixed byte
    * strides — a real build would replace ONLY the marked lines with a
    * codec call (e.g. TwelveMonkeys/JavaCV), keeping the batch shape.
    */
  def decodeFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real version: initialize the codec context ONCE per partition here
      rows.map { m =>
        val bytes = Option(m.media).getOrElse(Array.emptyByteArray)
        // ---- STUB decode: deterministic fake features from byte strides
        val feats = Array.tabulate(FeatureDim) { i =>
          if (bytes.isEmpty) 0.0f
          else {
            var s = 0L; var j = i
            while (j < bytes.length) { s += (bytes(j) & 0xff); j += FeatureDim }
            (s % 256).toFloat / 255.0f
          }
        }
        // ---- end STUB
        MediaFeatures(m.id, bytes.length.toLong, feats)
      }
    }
  }
}
