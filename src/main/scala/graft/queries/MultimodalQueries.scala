package graft.queries

import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.engine.Tables
import graft.engine.ext.Multimodal

/** Multimodal metadata over opaque binary columns (north-star surface).
  * The binary payload is derived from `documents.text` (no real media in
  * the fixtures); the decode stub is unit-tested (MultimodalSpec), while
  * this query oracle-checks the metadata path — the part a 100 TB
  * metadata-only scan would actually touch (column pruning keeps the
  * media bytes unread).
  */
object MultimodalQueries {

  /** Binary metadata projection: sizes, content hash, per-source stats. */
  val q36MultimodalMeta: Q = Q(
    "q36_multimodal_meta",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val media = Multimodal.mediaFromText(docs, "doc_id", "text",
        passthrough = Seq("source"))
      media
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("meta.n_bytes").cast("long")).as("total_bytes"),
          max(col("meta.n_bytes").cast("long")).as("max_bytes"),
          count_distinct(col("meta.content_hash")).as("distinct_contents"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_media,
            CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
            CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
            count(DISTINCT md5(text)) AS distinct_contents
            FROM documents GROUP BY source ORDER BY source"""))

  /** Oracle for the feature-pooling COMPUTE path: the pooled sums are
    * spelled out as explicit left-associated `+` chains so DuckDB
    * performs the exact same IEEE op sequence as [[Multimodal.resizeFeatures]]
    * (sequential double accumulation over float inputs, /8 — an exact
    * power-of-two scale — then round-to-nearest float). Bit-identical by
    * construction, no rounding tolerance needed.
    */
  private val poolOracle: String = {
    val pools = (0 until 8).map { i =>
      val terms = (1 to 8).map(k => s"embedding[${8 * i + k}]::DOUBLE")
        .mkString(" + ")
      s"(($terms) / 8)::REAL AS p$i"
    }.mkString(", ")
    // scalar columns, not a LIST: nested arrow types carry element-name/
    // nullability noise that can hash-differ even when every value matches
    s"SELECT vec_id, $pools FROM embeddings ORDER BY vec_id"
  }

  /** Average-pool 64-dim embeddings to 8 via the REAL engine path
    * ([[Multimodal.resizeFeatures]], the stand-in for an image resize
    * kernel) — oracle-checking the multimodal compute math itself, not a
    * Column re-implementation of it. Pure per-row projection: no
    * shuffle, scale-free.
    */
  val q58FeaturePool: Q = Q(
    "q58_feature_pool",
    (s, dir) => {
      import s.implicits._
      val feats = Tables.load(s, dir, "embeddings")
        .select(col("vec_id").as("id"), lit(0L).as("n_bytes"),
          col("embedding").as("features"))
        .as[Multimodal.MediaFeatures]
      Multimodal.resizeFeatures(feats, targetDim = 8)
        .select(col("id").as("vec_id") +:
          (0 until 8).map(i => col("features")(i).as(s"p$i")): _*)
        .orderBy("vec_id")
    },
    Some(poolOracle))

  /** Frame sampling through the REAL engine path ([[Multimodal.sampleFrames]]:
    * lazy per-row iterator, every-Nth fixed-width byte window, short tail
    * frame) — oracle-checked byte-for-byte against DuckDB string slicing.
    * With q36 (metadata) and q58 (feature pooling) this leaves only the
    * codec-bound decode stub outside oracle coverage, by container
    * necessity. Pure executor-side 1->many explosion: no shuffle before
    * the output sort.
    *
    * The frame bytes are emitted as `md5(frame)` hex, NOT the raw binary:
    * the digest is over the exact sampled bytes (still a byte-exact
    * check), but a raw `binary` output column crashes the driver's
    * pandas comparator ("unhashable type: bytearray"). The comparator
    * contract is enforced build-time by ComparatorContractSpec.
    */
  val q65FrameSample: Q = Q(
    "q65_frame_sample",
    (s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromText(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .select(col("id"), col("media"), col("meta.mime").as("mime"))
        .as[Multimodal.Media]
      Multimodal.sampleFrames(media, frameBytes = 64, everyN = 2)
        .select(col("id").as("doc_id"), col("frame_idx"),
          octet_length(col("frame")).as("n_bytes"),
          md5(col("frame")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx")
    },
    // DuckDB md5(VARCHAR) digests the string's bytes, which equal the
    // Spark-side sliced bytes iff the text is pure ASCII — which the
    // oracle ENFORCES per-row (lazy error() in the CASE), so a
    // regenerated fixture with multibyte text fails loudly at the
    // precondition, not as an opaque VALUES diff. The Spark side slices
    // real bytes and needs no guard. Both engines emit lowercase hex.
    Some("""WITH m AS (SELECT doc_id,
              CASE WHEN octet_length(encode(text)) <> length(text)
                   THEN error('q65 oracle needs ASCII text; doc_id='
                              || doc_id)
                   ELSE text END AS t
              FROM documents WHERE text IS NOT NULL),
            f AS (SELECT doc_id, t,
                unnest(list_filter(range(0, (length(t) + 63) // 64),
                  i -> i % 2 = 0)) AS i
              FROM m)
            SELECT doc_id, i::INT AS frame_idx,
              length(substring(t, (i * 64 + 1)::INT, 64))::INT AS n_bytes,
              md5(substring(t, (i * 64 + 1)::INT, 64)) AS frame_md5
            FROM f ORDER BY doc_id, frame_idx"""))

  /** The decode STUB's byte math under the oracle — with q36 (metadata),
    * q58 (pooling), and q65 (framing) green, the stride arithmetic
    * inside [[Multimodal.decodeFeatures]] was the last fake math outside
    * verification; this closes it, leaving only the codec call itself
    * (absent from the container by necessity) untested.
    *
    * The features run through the REAL `mapPartitions` decode path, and
    * each float feature is mapped back to its exact integer stride sum:
    * the stub emits `(s % 256).toFloat / 255f`, whose float error is far
    * below 0.5 ulp-of-integer, so `round(f * 255)` recovers `s % 256`
    * exactly. DuckDB recomputes the sums from the ASCII text with
    * `ascii(substring(...))` arithmetic over an unnested position range
    * (the same per-row ASCII guard as q65's oracle: a regenerated
    * multibyte fixture fails loudly at the precondition). NULL-text docs
    * flow through both sides as zero-byte media: n_bytes 0, all-zero
    * features.
    */
  val q77DecodeStub: Q = Q(
    "q77_decode_stub",
    (s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromText(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .select(col("id"), col("media"), col("meta.mime").as("mime"))
        .as[Multimodal.Media]
      val feats = Multimodal.decodeFeatures(media)
      feats.select(col("id").as("doc_id") +: col("n_bytes") +:
          (0 until Multimodal.FeatureDim).map(i =>
            round(col("features")(i) * 255).cast("long").as(s"f$i")): _*)
        .orderBy("doc_id")
    },
    Some {
      val dim = Multimodal.FeatureDim
      val fs = (0 until dim).map(i =>
        s"CAST(coalesce(a.f$i, 0) AS BIGINT) AS f$i").mkString(", ")
      val pivots = (0 until dim).map(i =>
        s"sum(CASE WHEN i = $i THEN v END) % 256 AS f$i").mkString(", ")
      s"""WITH m AS (SELECT doc_id,
              CASE WHEN text IS NULL THEN ''
                   WHEN octet_length(encode(text)) <> length(text)
                   THEN error('q77 oracle needs ASCII text; doc_id='
                              || doc_id)
                   ELSE text END AS t
            FROM documents),
          pos AS (SELECT doc_id, t, unnest(range(0, length(t))) AS j
                  FROM m),
          b AS (SELECT doc_id, (j % $dim) AS i,
                  ascii(substring(t, (j + 1)::INT, 1)) AS v
                FROM pos),
          agg AS (SELECT doc_id, $pivots FROM b GROUP BY doc_id)
          SELECT m.doc_id, CAST(length(m.t) AS BIGINT) AS n_bytes, $fs
          FROM m LEFT JOIN agg a ON a.doc_id = m.doc_id
          ORDER BY m.doc_id"""
    })

  /** Cross-asset frame dedup — the multimodal x dedup crossover: q65's
    * sampled frames hashed and grouped ACROSS assets, reporting how
    * much frame-level content is shared between different media objects
    * (re-posted clips, shared intros, watermark padding — the video
    * analogue of boilerplate q63). One summary row: total sampled
    * frames, distinct frame hashes, hashes seen in >1 asset, frames
    * covered by those shared hashes, and the asset pairs sharing at
    * least one frame (bounded: a hash shared by k assets contributes
    * k*(k-1)/2 exact pair-credits, summed as integers).
    *
    * ## 100 TB notes
    * Frames never shuffle raw: the md5 projection happens in the same
    * mapPartitions pass that slices them, and everything downstream
    * aggregates 16-byte hashes with map-side partials. The per-hash
    * asset count is bounded by the corpus's true duplication, the same
    * quantity every dedup family member is linear in.
    */
  val q203FrameDedup: Q = Q(
    "q203_frame_dedup",
    (s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaFromText(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .select(col("id"), col("media"), col("meta.mime").as("mime"))
        .as[Multimodal.Media]
      val frames = Multimodal.sampleFrames(media, frameBytes = 64,
          everyN = 2)
        .select(col("id"), md5(col("frame")).as("fp"))
      val perHash = frames.groupBy(col("fp"))
        .agg(count(lit(1)).as("n_frames"),
          count_distinct(col("id")).as("n_assets"))
      perHash.agg(sum(col("n_frames")).as("n_frames_total"),
          count(lit(1)).as("n_distinct_hashes"),
          count(when(col("n_assets") > 1, 1)).as("n_shared_hashes"),
          coalesce(sum(when(col("n_assets") > 1, col("n_frames"))), lit(0L))
            .as("n_frames_shared"),
          sum(expr("n_assets * (n_assets - 1) div 2")).as("n_asset_pairs"))
    },
    Some("""WITH m AS (SELECT doc_id,
              CASE WHEN octet_length(encode(text)) <> length(text)
                   THEN error('q203 oracle needs ASCII text; doc_id='
                              || doc_id)
                   ELSE text END AS t
              FROM documents WHERE text IS NOT NULL),
            f AS (SELECT doc_id,
                md5(substring(t, (i * 64 + 1)::INT, 64)) AS fp
              FROM (SELECT doc_id, t,
                      unnest(list_filter(range(0, (length(t) + 63) // 64),
                        i -> i % 2 = 0)) AS i
                    FROM m)),
            ph AS (SELECT fp, count(*) AS n_frames,
                count(DISTINCT doc_id) AS n_assets
              FROM f GROUP BY fp)
            SELECT CAST(sum(n_frames) AS BIGINT) AS n_frames_total,
              count(*) AS n_distinct_hashes,
              count(CASE WHEN n_assets > 1 THEN 1 END) AS n_shared_hashes,
              coalesce(CAST(sum(CASE WHEN n_assets > 1 THEN n_frames END)
                AS BIGINT), 0) AS n_frames_shared,
              CAST(sum(n_assets * (n_assets - 1) // 2) AS BIGINT)
                AS n_asset_pairs
            FROM ph"""))

  /** WebDataset-style shard packing plan — the layout step between a
    * curated media corpus and the training loader: assets are packed in
    * corpus order (sequential tar writes, reproducible resume points)
    * into ~32 KiB shards, each asset assigned to the shard its START
    * byte offset falls in (`(cum - n_bytes) div S` — so an asset
    * straddling a boundary belongs to the shard it begins in, the tar
    * semantics). Emits the physical manifest per shard: asset count,
    * byte fill, id range, and fill ppm vs the target — the
    * over/under-fill spread is the decision input for the shard size
    * (too many tail-underfilled shards starve loader parallelism).
    *
    * ## 100 TB notes
    * The byte-offset line is [[graft.engine.Cumulative.rankedCumSum]]
    * (range-partitioned two-phase prefix sum — no single-partition
    * window even though the offset is a global cumulative), then one
    * map-side-combined rollup on shard id. The real writer materializes
    * with `repartitionByRange(shard)` + `sortWithinPartitions` and
    * streams tars per partition; this query IS its manifest.
    */
  val q260ShardPacking: Q = Q(
    "q260_shard_packing",
    (s, dir) => {
      val S = 32768L
      val media = Tables.load(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"))
      val cum = graft.engine.Cumulative.rankedCumSum(media,
        Seq(col("doc_id").asc), col("n_bytes"), rkName = "__rk")
      cum
        .select(col("doc_id"), col("n_bytes"),
          expr(s"(cum - n_bytes) div $S").as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("n_bytes")).as("bytes"),
          min(col("doc_id")).as("first_id"),
          max(col("doc_id")).as("last_id"))
        .select(col("shard"), col("n_assets"), col("bytes"),
          col("first_id"), col("last_id"),
          expr(s"bytes * 1000000 div $S").as("fill_ppm"))
        .orderBy(col("shard"))
    },
    Some("""WITH m AS (SELECT doc_id,
                octet_length(encode(text))::BIGINT AS n_bytes
              FROM documents WHERE text IS NOT NULL),
            c AS (SELECT doc_id, n_bytes,
                (sum(n_bytes) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_bytes) // 32768 AS shard
              FROM m)
            SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_assets,
              CAST(sum(n_bytes) AS BIGINT) AS bytes,
              min(doc_id) AS first_id, max(doc_id) AS last_id,
              CAST(sum(n_bytes) AS BIGINT) * 1000000 // 32768 AS fill_ppm
            FROM c GROUP BY shard ORDER BY shard"""))

  val all: Seq[Q] =
    Seq(q36MultimodalMeta, q58FeaturePool, q65FrameSample, q77DecodeStub,
      q203FrameDedup, q260ShardPacking)
}
