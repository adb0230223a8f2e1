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

  val all: Seq[Q] = Seq(q36MultimodalMeta)
}
