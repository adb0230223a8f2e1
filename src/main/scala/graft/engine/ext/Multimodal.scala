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
  *  - `repartitionForDecode` spreads blobs uniformly by id: per-task
  *    memory is bounded by the largest single blob (rows stream one at
  *    a time), and uniform size mixing balances per-task duration.
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

  /** Balance a decode pass across tasks. Two facts drive the shape:
    * per-task MEMORY is bounded by the largest single blob (mapPartitions
    * streams one row at a time), and per-task DURATION is proportional to
    * total bytes — so the right layout mixes sizes uniformly. Hashing on
    * a size bucket (an earlier design) did the opposite: every same-
    * size-class blob landed in ONE partition. Hash on the unique id,
    * uniform by construction.
    */
  def repartitionForDecode(media: DataFrame, partitions: Int,
                           idCol: String = "id"): DataFrame =
    media.repartition(partitions, col(idCol))

  final case class Frame(id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: one media blob -> every-Nth fixed-size frame.
    *
    * STUB framing: a real build demuxes with a video codec; here a
    * "frame" is a fixed-width byte window. The real part is the shape:
    * flatMap with a LAZY iterator keeps one frame in flight per row (a
    * 10 GB video never materializes all frames in memory), the 1->many
    * explosion happens executor-side with no shuffle, and downstream
    * per-frame work sees ordinary rows.
    */
  def sampleFrames(media: Dataset[Media], frameBytes: Int,
                   everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(frameBytes > 0 && everyN > 0)
    media.flatMap { m =>
      val bytes = Option(m.media).getOrElse(Array.emptyByteArray)
      val nFrames = (bytes.length + frameBytes - 1) / frameBytes
      Iterator.range(0, nFrames).filter(_ % everyN == 0).map { i =>
        Frame(m.id, i, java.util.Arrays.copyOfRange(
          bytes, i * frameBytes, math.min((i + 1) * frameBytes, bytes.length)))
      }
    }
  }

  /** "Resize" a feature vector by average-pooling to targetDim (the
    * tail pool absorbs the remainder). Stands where a real image resize
    * kernel would run; pure per-row projection — no shuffle, no state.
    */
  def resizeFeatures(feats: Dataset[MediaFeatures],
                     targetDim: Int): Dataset[MediaFeatures] = {
    import feats.sparkSession.implicits._
    require(targetDim > 0)
    feats.map { f =>
      val src = f.features
      val out =
        if (src.isEmpty) Array.fill(targetDim)(0.0f)
        else Array.tabulate(targetDim) { i =>
          val lo = (i.toLong * src.length / targetDim).toInt
          val hi = math.max((((i + 1).toLong * src.length) / targetDim).toInt, lo + 1)
          var s = 0.0; var j = lo
          while (j < hi && j < src.length) { s += src(j); j += 1 }
          (s / math.max(math.min(hi, src.length) - lo, 1)).toFloat
        }
      MediaFeatures(f.id, f.n_bytes, out)
    }
  }

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
