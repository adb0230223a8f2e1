package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Catalog.Q
import graft.engine.Tables
import graft.functions.GraftFunctions.nfcNormalize

/** Data-governance / lifecycle operators: PII detection-and-redaction
  * accounting, SCD Type-2 history construction from snapshots, Unicode
  * canonicalization, and interval coverage (merge-overlaps). (The
  * reference — a brewery medallion pipeline, `dags/dag-brewery_pipeline
  * .py` — has no governance surface; this module extends SURVEY.md §2's
  * LLM-pipeline families with the compliance/versioning operators a
  * production corpus pipeline runs before anything else touches the
  * data.)
  *
  * Scale design notes (100 TB):
  *  - PII redaction (q98) is a pure per-row projection — three regex
  *    passes fused in one codegen'd stage, no exchange before the final
  *    per-source rollup (map-side combined);
  *  - SCD2 (q99) shuffles once on the entity key and resolves the whole
  *    history with two window passes over that one partitioning — the
  *    standard change-capture shape; at 100 TB the snapshot union is
  *    partition-pruned to the snapshots being folded in;
  *  - NFC normalization (q100) is a map-only pass with an
  *    `isNormalized` fast path, so the (dominant) already-canonical rows
  *    never allocate;
  *  - interval merge (q101) is the gaps-and-islands pattern: one shuffle
  *    on user_id, two windows and the rollup all reuse that partitioning
  *    (exactly like q74's inter-arrival analysis).
  *
  * Determinism: counts are `count(...)`; summed bigints are CAST to
  * BIGINT on the DuckDB side (HUGEINT widening); no double arithmetic
  * beyond values copied verbatim from the source table.
  */
object GovernanceQueries {

  // PII patterns, pinned to a dialect subset valid in BOTH java.util.regex
  // (Spark) and RE2 (DuckDB): character classes, bounded repetition and \b
  // only — no backreferences, no lookaround (RE2 has neither).
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** PII detection + redaction accounting per source. The synthetic
    * corpus is PII-free, so the query plants deterministic PII first
    * (email for doc_id % 3 = 0, an IPv4 for % 5 = 0, a phone for % 7 = 0
    * — both engines construct the identical string), then runs the real
    * operator: match-count per category, sequential redaction
    * (email → ip → phone, order pinned because a category's replacement
    * must not create or destroy later categories' matches), and
    * per-source totals of documents touched and characters removed.
    */
  val q98PiiRedact: Q = Q(
    "q98_pii_redact",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val planted = concat(
        substring(col("text"), 1, 40),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" u"), col("doc_id").cast("string"), lit("@ex.com")))
          .otherwise(""),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" 10.0."), pmod(col("doc_id"), lit(256)).cast("string"),
            lit(".7"))).otherwise(""),
        when(pmod(col("doc_id"), lit(7)) === 0, lit(" 555-123-4567"))
          .otherwise(""))
      val redacted = regexp_replace(
        regexp_replace(
          regexp_replace(planted, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>")
      docs
        .select(col("source"),
          regexp_count(planted, lit(EmailRe)).as("n_email"),
          regexp_count(planted, lit(Ipv4Re)).as("n_ip"),
          regexp_count(planted, lit(PhoneRe)).as("n_phone"),
          (length(planted) - length(redacted)).cast("long").as("removed"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("n_email") + col("n_ip") + col("n_phone") > 0, 1))
            .as("docs_with_pii"),
          sum(col("n_email")).cast("long").as("emails"),
          sum(col("n_ip")).cast("long").as("ips"),
          sum(col("n_phone")).cast("long").as("phones"),
          sum(col("removed")).as("chars_removed"))
        .orderBy("source")
    },
    Some(s"""WITH p AS (
              SELECT source,
                substring(text, 1, 40)
                || CASE WHEN doc_id % 3 = 0
                        THEN ' u' || doc_id::VARCHAR || '@ex.com' ELSE '' END
                || CASE WHEN doc_id % 5 = 0
                        THEN ' 10.0.' || (doc_id % 256)::VARCHAR || '.7'
                        ELSE '' END
                || CASE WHEN doc_id % 7 = 0
                        THEN ' 555-123-4567' ELSE '' END AS t
              FROM documents),
            m AS (
              SELECT source,
                len(regexp_extract_all(t, '$EmailRe')) AS n_email,
                len(regexp_extract_all(t, '$Ipv4Re')) AS n_ip,
                len(regexp_extract_all(t, '$PhoneRe')) AS n_phone,
                length(t) - length(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
                      '$Ipv4Re', '<IP>', 'g'),
                    '$PhoneRe', '<PHONE>', 'g')) AS removed
              FROM p)
            SELECT source, count(*) AS n_docs,
              count(CASE WHEN n_email + n_ip + n_phone > 0 THEN 1 END)
                AS docs_with_pii,
              CAST(sum(n_email) AS BIGINT) AS emails,
              CAST(sum(n_ip) AS BIGINT) AS ips,
              CAST(sum(n_phone) AS BIGINT) AS phones,
              CAST(sum(removed) AS BIGINT) AS chars_removed
            FROM m GROUP BY source ORDER BY source"""))

  /** SCD Type-2 history from versioned snapshots: three deterministic
    * snapshot views of `customer` (q87's CDC fixture family — presence
    * filters + balance mutations per version) are stacked, and the
    * operator folds them into validity intervals per entity: a new
    * interval opens when the key (re)appears after a gap or its tracked
    * attribute changed; contiguous identical versions collapse.
    * This is the MERGE-free way to build a dimension history at scale —
    * one shuffle on the entity key, windows and the rollup all reusing
    * that partitioning.
    */
  /** The q99 snapshot stack folded into SCD2 validity intervals
    * `(c_custkey, valid_from, valid_to, bal)` — shared by q99 (which
    * emits the history itself) and q121 (which point-in-time-joins facts
    * against it).
    */
  private def scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    def snap(ver: Int, keep: Column, bal: Column) =
      cust.filter(keep).select(lit(ver).as("ver"), col("c_custkey"), bal.as("bal"))
    val snaps =
      snap(1, pmod(col("c_custkey"), lit(10)) =!= 0, col("c_acctbal"))
        .unionByName(snap(2, pmod(col("c_custkey"), lit(7)) =!= 0,
          when(pmod(col("c_custkey"), lit(3)) === 0, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal"))))
        .unionByName(snap(3, pmod(col("c_custkey"), lit(8)) =!= 0,
          when(pmod(col("c_custkey"), lit(4)) === 0, col("c_acctbal") + 250.0)
            .otherwise(col("c_acctbal"))))
    val w = Window.partitionBy("c_custkey").orderBy("ver")
    val opens = snaps.withColumn("new_interval",
      when(lag(col("ver"), 1).over(w).isNull
        .or(lag(col("ver"), 1).over(w) =!= col("ver") - 1)
        .or(lag(col("bal"), 1).over(w) =!= col("bal")), 1).otherwise(0))
    val intervals = opens.withColumn("interval_id",
      sum(col("new_interval")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    intervals
      .groupBy("c_custkey", "interval_id")
      .agg(min(col("ver")).cast("long").as("valid_from"),
        max(col("ver")).cast("long").as("valid_to"),
        min(col("bal")).as("bal"))
      .select(col("c_custkey"), col("valid_from"), col("valid_to"),
        col("bal"))
  }

  /** The q99/q121 snapshot-stack + interval-fold as DuckDB CTEs, ending
    * in `iv(c_custkey, valid_from, valid_to, bal)`. */
  private val Scd2IntervalCtes: String =
    """c AS (SELECT c_custkey, c_acctbal FROM customer),
       snaps AS (
         SELECT 1 AS ver, c_custkey, c_acctbal AS bal
         FROM c WHERE c_custkey % 10 != 0
         UNION ALL
         SELECT 2, c_custkey,
           CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0
                ELSE c_acctbal END
         FROM c WHERE c_custkey % 7 != 0
         UNION ALL
         SELECT 3, c_custkey,
           CASE WHEN c_custkey % 4 = 0 THEN c_acctbal + 250.0
                ELSE c_acctbal END
         FROM c WHERE c_custkey % 8 != 0),
       o AS (SELECT *,
           CASE WHEN lag(ver) OVER w IS NULL
                  OR lag(ver) OVER w != ver - 1
                  OR lag(bal) OVER w != bal THEN 1 ELSE 0 END
             AS new_interval
         FROM snaps
         WINDOW w AS (PARTITION BY c_custkey ORDER BY ver)),
       i AS (SELECT *,
           sum(new_interval) OVER (PARTITION BY c_custkey ORDER BY ver
             ROWS UNBOUNDED PRECEDING) AS interval_id
         FROM o),
       iv AS (SELECT c_custkey,
           CAST(min(ver) AS BIGINT) AS valid_from,
           CAST(max(ver) AS BIGINT) AS valid_to,
           min(bal) AS bal
         FROM i GROUP BY c_custkey, interval_id)"""

  val q99Scd2Snapshots: Q = Q(
    "q99_scd2_snapshots",
    (s, dir) =>
      scd2Intervals(s, dir)
        .select(col("c_custkey"), col("valid_from"), col("valid_to"),
          col("bal"), (col("valid_to") === 3).as("is_current"))
        .orderBy("c_custkey", "valid_from"),
    Some(s"""WITH $Scd2IntervalCtes
             SELECT c_custkey, valid_from, valid_to, bal,
               valid_to = 3 AS is_current
             FROM iv ORDER BY c_custkey, valid_from"""))

  /** Point-in-time (PIT) enrichment against the SCD2 dimension: each
    * order is stamped with a deterministic as-of version and picks up
    * the balance VALID AT THAT VERSION — the temporal-correctness join
    * that prevents feature leakage in training pipelines (joining
    * today's dimension onto yesterday's facts). LEFT join keeps orders
    * whose key has no covering interval (customer absent from that
    * snapshot); the rollup audits coverage per version plus the
    * decimal-exact sum of matched balances.
    *
    * ## 100 TB notes
    * The interval table is dimension-sized (at most one row per entity
    * per change), so the PIT join is a BROADCAST hash join with a
    * residual range predicate — the order fact stream never shuffles.
    * The fallback when the dimension outgrows broadcast is a shuffle
    * hash join on the entity key with the range residual — never a
    * cross/BNLJ, because the equi-key carries the join.
    */
  val q121PitEnrich: Q = Q(
    "q121_pit_enrich",
    (s, dir) => {
      val orders = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          (pmod(col("o_orderkey"), lit(3)) + 1).as("as_of_ver"))
      val iv = scd2Intervals(s, dir)
      orders
        .join(broadcast(iv),
          col("o_custkey") === col("c_custkey") &&
            col("as_of_ver") >= col("valid_from") &&
            col("as_of_ver") <= col("valid_to"),
          "left")
        .groupBy(col("as_of_ver"))
        .agg(count(lit(1)).as("n_orders"),
          count(col("bal")).as("n_covered"),
          round(sum(col("bal").cast("decimal(30,10)")), 2).cast("double")
            .as("sum_bal"))
        .orderBy("as_of_ver")
    },
    Some(s"""WITH $Scd2IntervalCtes,
             ord AS (SELECT o_orderkey, o_custkey,
                       o_orderkey % 3 + 1 AS as_of_ver
                     FROM orders)
             SELECT as_of_ver, count(*) AS n_orders,
               count(bal) AS n_covered,
               CAST(round(sum(CAST(bal AS DECIMAL(30,10))), 2) AS DOUBLE)
                 AS sum_bal
             FROM ord LEFT JOIN iv
               ON o_custkey = c_custkey
               AND as_of_ver BETWEEN valid_from AND valid_to
             GROUP BY as_of_ver ORDER BY as_of_ver"""))

  /** Unicode NFC canonicalization via the codegen'd [[graft.functions
    * .NfcNormalize]] expression, hash-verified against DuckDB's
    * `nfc_normalize` (utf8proc) — two independent implementations of the
    * Unicode canonical-composition algorithm agreeing byte-for-byte.
    * The ASCII corpus is NFC-trivially, so the query plants decomposed
    * sequences (e+U+0301, A+U+030A) alongside a precomposed é: the
    * normalized output must compose the former and pass the latter
    * through, shrinking the codepoint count by exactly the number of
    * combining marks composed.
    */
  val q100NfcNormalize: Q = Q(
    "q100_nfc_normalize",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      // decomposed e+COMBINING ACUTE (U+0301) and A+COMBINING RING
      // (U+030A), then a precomposed \u00e9 (must pass through
      // unchanged) -- explicit escapes so source encoding can never
      // silently precompose the fixture
      val planted = concat(substring(col("text"), 1, 32),
        lit(" e\u0301-A\u030a-\u00e9"))
      val norm = nfcNormalize(planted)
      docs
        .filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("doc_id"),
          length(planted).cast("long").as("pre_codepoints"),
          length(norm).cast("long").as("post_codepoints"),
          (length(planted) =!= length(norm)).as("composed"),
          md5(norm).as("norm_md5"))
        .orderBy("doc_id")
    },
    Some("""WITH p AS (
              SELECT doc_id,
                substring(text, 1, 32) || ' e' || chr(769) || '-A'
                  || chr(778) || '-' || chr(233) AS t
              FROM documents WHERE doc_id % 4 = 0),
            n AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM p)
            SELECT doc_id,
              CAST(length(t) AS BIGINT) AS pre_codepoints,
              CAST(length(nt) AS BIGINT) AS post_codepoints,
              length(t) != length(nt) AS composed,
              md5(nt) AS norm_md5
            FROM n ORDER BY doc_id"""))

  /** Interval merge / coverage (gaps-and-islands): each event opens a
    * 5-minute activity interval; overlapping intervals per user merge,
    * and the operator reports per-user merged-interval count and total
    * covered time. All arithmetic in exact epoch microseconds. The
    * running `max(end)` over preceding rows handles the containment case
    * (a long interval swallowing later short ones) that naive
    * `lag(end)` comparison gets wrong.
    */
  val q101IntervalMerge: Q = Q(
    "q101_interval_merge",
    (s, dir) => {
      val SpanUs = 300000000L // 5 min
      // events.ts is BIGINT nanoseconds under nanosAsLong (see
      // EventQueries' header note); floor-divide to epoch-µs
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("s"))
        .withColumn("e", col("s") + SpanUs)
      val w = Window.partitionBy("user_id").orderBy("s", "event_id")
      val flagged = ev
        .withColumn("prev_max_e",
          max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_island",
          when(col("prev_max_e").isNull.or(col("s") > col("prev_max_e")), 1)
            .otherwise(0))
        .withColumn("island_id", sum(col("new_island")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      flagged
        .groupBy("user_id", "island_id")
        .agg(min(col("s")).as("i_start"), max(col("e")).as("i_end"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("i_end") - col("i_start")).cast("long").as("covered_us"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
              SELECT user_id, event_id,
                epoch_us(CAST(ts AS TIMESTAMP)) AS s,
                epoch_us(CAST(ts AS TIMESTAMP)) + 300000000 AS e
              FROM events),
            f AS (SELECT user_id, event_id, s, e,
                max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS prev_max_e
              FROM ev),
            g AS (SELECT *,
                CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                     THEN 1 ELSE 0 END AS new_island
              FROM f),
            h AS (SELECT *,
                sum(new_island) OVER (PARTITION BY user_id
                  ORDER BY s, event_id ROWS UNBOUNDED PRECEDING)
                  AS island_id
              FROM g),
            i AS (SELECT user_id, island_id,
                min(s) AS i_start, max(e) AS i_end
              FROM h GROUP BY user_id, island_id)
            SELECT user_id, count(*) AS n_intervals,
              CAST(sum(i_end - i_start) AS BIGINT) AS covered_us
            FROM i GROUP BY user_id ORDER BY user_id"""))

  /** k-anonymity audit with one generalization step: equivalence classes
    * over the quasi-identifier pair (nation, market segment) are checked
    * against k=20; a failing class falls back to the coarser
    * segment-only class (one step up the generalization hierarchy) and
    * is released at that level if the coarser class clears k, else
    * suppressed. This is the release decision a privacy-preserving
    * publication pipeline makes per class — and it is one shuffle on the
    * fine key plus a segment-level window over the same rows (the
    * coarser total is a window sum over the fine classes, not a second
    * scan).
    */
  val q104KAnonymity: Q = Q(
    "q104_k_anonymity",
    (s, dir) => {
      val k = 20L
      val classes = Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nation"),
          col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("class_size"))
      val withCoarse = classes.withColumn("segment_size",
        sum(col("class_size")).over(
          Window.partitionBy(col("segment"))))
      withCoarse
        .select(col("nation"), col("segment"), col("class_size"),
          col("segment_size"),
          when(col("class_size") >= k, "released")
            .when(col("segment_size") >= k, "generalized")
            .otherwise("suppressed").as("release"))
        .orderBy("nation", "segment")
    },
    Some("""WITH cls AS (
              SELECT c_nationkey AS nation, c_mktsegment AS segment,
                count(*) AS class_size
              FROM customer GROUP BY 1, 2),
            g AS (SELECT *,
                CAST(sum(class_size) OVER (PARTITION BY segment) AS BIGINT)
                  AS segment_size
              FROM cls)
            SELECT nation, segment, class_size, segment_size,
              CASE WHEN class_size >= 20 THEN 'released'
                   WHEN segment_size >= 20 THEN 'generalized'
                   ELSE 'suppressed' END AS release
            FROM g ORDER BY nation, segment"""))

  /** CDC ops-log APPLY — the inverse of q87's snapshot diff and the
    * other half of the change-data-capture surface: given an
    * insert/update/delete operation log with a total sequence order,
    * materialize the final table state (latest op per key wins, a
    * winning delete removes the key, a later re-insert resurrects it).
    * One shuffle on the entity key; the whole fold is a single
    * `row_number` window over that partitioning — the MERGE-free way to
    * apply a Delta-style change feed at scale (same posture note as
    * README's upsert mapping).
    */
  val q126CdcApply: Q = Q(
    "q126_cdc_apply",
    (s, dir) => {
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
      // deterministic ops log: seq 1 inserts every key, seq 2 updates
      // keys %3 (+100), seq 3 deletes keys %5, seq 4 re-inserts keys %15
      // at bal 0 — so delete-wins, update-wins and resurrection paths
      // all occur
      val ops =
        cust.select(lit(1L).as("seq"), lit("I").as("op"),
            col("c_custkey"), col("c_acctbal").as("bal"))
          .unionByName(cust.filter(pmod(col("c_custkey"), lit(3)) === 0)
            .select(lit(2L).as("seq"), lit("U").as("op"),
              col("c_custkey"), (col("c_acctbal") + 100.0).as("bal")))
          .unionByName(cust.filter(pmod(col("c_custkey"), lit(5)) === 0)
            .select(lit(3L).as("seq"), lit("D").as("op"),
              col("c_custkey"), lit(null).cast("double").as("bal")))
          .unionByName(cust.filter(pmod(col("c_custkey"), lit(15)) === 0)
            .select(lit(4L).as("seq"), lit("I").as("op"),
              col("c_custkey"), lit(0.0).as("bal")))
      val latest = Window.partitionBy("c_custkey").orderBy(col("seq").desc)
      ops
        .withColumn("rn", row_number().over(latest))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("c_custkey"), col("bal"), col("seq").as("applied_seq"))
        .orderBy("c_custkey")
    },
    Some("""WITH c AS (SELECT c_custkey, c_acctbal FROM customer),
            ops AS (
              SELECT 1 AS seq, 'I' AS op, c_custkey, c_acctbal AS bal FROM c
              UNION ALL
              SELECT 2, 'U', c_custkey, c_acctbal + 100.0
              FROM c WHERE c_custkey % 3 = 0
              UNION ALL
              SELECT 3, 'D', c_custkey, CAST(NULL AS DOUBLE)
              FROM c WHERE c_custkey % 5 = 0
              UNION ALL
              SELECT 4, 'I', c_custkey, 0.0
              FROM c WHERE c_custkey % 15 = 0),
            r AS (SELECT *, row_number() OVER (PARTITION BY c_custkey
                    ORDER BY seq DESC) AS rn
                  FROM ops)
            SELECT c_custkey, bal, CAST(seq AS BIGINT) AS applied_seq
            FROM r WHERE rn = 1 AND op != 'D'
            ORDER BY c_custkey"""))

  /** l-diversity audit — k-anonymity's (q104) necessary companion: a
    * class can be k-large yet leak everything when its SENSITIVE value
    * is uniform (the homogeneity attack). Sensitive attribute here is a
    * 3-band account-balance tier; a quasi-identifier class (nation,
    * segment) is distinct-l-diverse when it contains >= l distinct
    * bands. Classes are tagged `homogeneous` (1 band — the attack
    * case), `at_risk` (< l), or `diverse`.
    *
    * Scale shape: one shuffle on the quasi-identifier pair;
    * `count_distinct` over a 3-value band is a map-side-combinable agg
    * with bounded state per group. No window, no second pass.
    */
  val q164LDiversity: Q = Q(
    "q164_l_diversity",
    (s, dir) => {
      val l = 3L
      val band = when(col("c_acctbal") < 0, "neg")
        .when(col("c_acctbal") < 5000, "low")
        .otherwise("high")
      Tables.load(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nation"),
          col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("class_size"),
          count_distinct(band).as("n_bands"))
        .select(col("nation"), col("segment"), col("class_size"),
          col("n_bands"),
          when(col("n_bands") === 1, "homogeneous")
            .when(col("n_bands") < l, "at_risk")
            .otherwise("diverse").as("status"))
        .orderBy("nation", "segment")
    },
    Some("""WITH b AS (SELECT c_nationkey AS nation,
                c_mktsegment AS segment,
                CASE WHEN c_acctbal < 0 THEN 'neg'
                     WHEN c_acctbal < 5000 THEN 'low'
                     ELSE 'high' END AS band
              FROM customer)
            SELECT nation, segment, count(*) AS class_size,
              count(DISTINCT band) AS n_bands,
              CASE WHEN count(DISTINCT band) = 1 THEN 'homogeneous'
                   WHEN count(DISTINCT band) < 3 THEN 'at_risk'
                   ELSE 'diverse' END AS status
            FROM b GROUP BY nation, segment
            ORDER BY nation, segment"""))

  /** t-closeness audit — the third leg of the privacy trio: a class
    * can be k-large (q104) and l-diverse (q164) yet still leak when its
    * sensitive DISTRIBUTION deviates from the corpus-wide one (skew
    * attack: "90% of this class is in debt" is a disclosure even with
    * all three bands present). Per quasi-class, the total-variation
    * distance between the class's 3-band balance distribution and the
    * global one; classes with TV > 0.3 are flagged.
    *
    * Determinism: the TV sum is a FIXED three-term expression over
    * pivoted per-band counts — never a float aggregation over band
    * rows, whose accumulation order would be partitioning-dependent.
    * Each |p_c - p_g| is one identical IEEE op tree on both engines.
    *
    * Scale shape: one shuffle to (class, banded counts) via three
    * conditional sums (map-side combined), global distribution is a
    * 1-row broadcast. No window, no second pass.
    */
  val q178TCloseness: Q = Q(
    "q178_t_closeness",
    (s, dir) => {
      val band = when(col("c_acctbal") < 0, "neg")
        .when(col("c_acctbal") < 5000, "low")
        .otherwise("high")
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_nationkey").as("nation"),
          col("c_mktsegment").as("segment"), band.as("band"))
      def cnt(b: String) =
        sum(when(col("band") === b, 1L).otherwise(0L))
      val cls = cust.groupBy(col("nation"), col("segment"))
        .agg(count(lit(1)).as("class_size"),
          cnt("neg").as("cn"), cnt("low").as("cl"), cnt("high").as("ch"))
      val glob = cust.agg(count(lit(1)).as("n"),
        cnt("neg").as("gn"), cnt("low").as("gl"), cnt("high").as("gh"))
      def term(c: Column, g: Column) =
        abs(c.cast("double") / col("class_size").cast("double")
          - g.cast("double") / col("n").cast("double"))
      cls.crossJoin(broadcast(glob))
        .select(col("nation"), col("segment"), col("class_size"),
          (lit(0.5) * (term(col("cn"), col("gn"))
            + term(col("cl"), col("gl"))
            + term(col("ch"), col("gh")))).as("tv"))
        .withColumn("status",
          when(col("tv") > 0.3, "violates").otherwise("within"))
        .orderBy("nation", "segment")
    },
    Some("""WITH b AS (SELECT c_nationkey AS nation,
                c_mktsegment AS segment,
                CASE WHEN c_acctbal < 0 THEN 'neg'
                     WHEN c_acctbal < 5000 THEN 'low'
                     ELSE 'high' END AS band
              FROM customer),
            cls AS (SELECT nation, segment, count(*) AS class_size,
                CAST(sum(CASE WHEN band = 'neg' THEN 1 ELSE 0 END) AS BIGINT) AS cn,
                CAST(sum(CASE WHEN band = 'low' THEN 1 ELSE 0 END) AS BIGINT) AS cl,
                CAST(sum(CASE WHEN band = 'high' THEN 1 ELSE 0 END) AS BIGINT) AS ch
              FROM b GROUP BY 1, 2),
            gdist AS (SELECT count(*) AS n,
                CAST(sum(CASE WHEN band = 'neg' THEN 1 ELSE 0 END) AS BIGINT) AS gn,
                CAST(sum(CASE WHEN band = 'low' THEN 1 ELSE 0 END) AS BIGINT) AS gl,
                CAST(sum(CASE WHEN band = 'high' THEN 1 ELSE 0 END) AS BIGINT) AS gh
              FROM b)
            SELECT nation, segment, class_size,
              0.5 * (abs(CAST(cn AS DOUBLE) / CAST(class_size AS DOUBLE)
                       - CAST(gn AS DOUBLE) / CAST(n AS DOUBLE))
                   + abs(CAST(cl AS DOUBLE) / CAST(class_size AS DOUBLE)
                       - CAST(gl AS DOUBLE) / CAST(n AS DOUBLE))
                   + abs(CAST(ch AS DOUBLE) / CAST(class_size AS DOUBLE)
                       - CAST(gh AS DOUBLE) / CAST(n AS DOUBLE))) AS tv,
              CASE WHEN 0.5 * (abs(CAST(cn AS DOUBLE) / CAST(class_size AS DOUBLE)
                       - CAST(gn AS DOUBLE) / CAST(n AS DOUBLE))
                   + abs(CAST(cl AS DOUBLE) / CAST(class_size AS DOUBLE)
                       - CAST(gl AS DOUBLE) / CAST(n AS DOUBLE))
                   + abs(CAST(ch AS DOUBLE) / CAST(class_size AS DOUBLE)
                       - CAST(gh AS DOUBLE) / CAST(n AS DOUBLE))) > 0.3
                   THEN 'violates' ELSE 'within' END AS status
            FROM cls, gdist ORDER BY nation, segment"""))

  /** SCD2 temporal-invariant audit — the machine-checkable contract
    * q99's history table and q121's PIT join silently rely on: per
    * entity, version intervals must never OVERLAP (an as-of lookup
    * would become ambiguous and the PIT join would fan out), while
    * GAPS are legal (the entity was absent from those snapshots) but
    * must be counted because every gap is a version at which the PIT
    * join goes uncovered. One row: keys, intervals, overlaps (the hard
    * invariant — 0 by construction, and the oracle re-derives it
    * independently so the proof is cross-engine), gaps, current rows,
    * and the deepest per-key history. The audit a dimension pipeline
    * runs after every snapshot merge.
    *
    * ## 100 TB notes
    * One window pass over the interval table partitioned by entity
    * (dimension-sized, not fact-sized) feeding a 1-row aggregate —
    * strictly cheaper than the SCD2 build it audits.
    */
  val q195Scd2Invariants: Q = Q(
    "q195_scd2_invariants",
    (s, dir) => {
      val w = Window.partitionBy(col("c_custkey")).orderBy(col("valid_from"))
      val iv = scd2Intervals(s, dir)
        .withColumn("prev_to", lag(col("valid_to"), 1).over(w))
        .withColumn("per_key", count(lit(1)).over(
          Window.partitionBy(col("c_custkey"))))
      iv.agg(count_distinct(col("c_custkey")).as("n_keys"),
          count(lit(1)).as("n_intervals"),
          count(when(col("valid_from") <= col("prev_to"), 1))
            .as("n_overlaps"),
          count(when(col("valid_from") > col("prev_to") + 1, 1))
            .as("n_gaps"),
          count(when(col("valid_to") === 3, 1)).as("n_current"),
          max(col("per_key")).as("max_per_key"))
    },
    Some(s"""WITH $Scd2IntervalCtes,
            lagged AS (SELECT c_custkey, valid_from, valid_to,
                lag(valid_to) OVER (PARTITION BY c_custkey
                  ORDER BY valid_from) AS prev_to,
                count(*) OVER (PARTITION BY c_custkey) AS per_key
              FROM iv)
            SELECT count(DISTINCT c_custkey) AS n_keys,
              count(*) AS n_intervals,
              count(CASE WHEN valid_from <= prev_to THEN 1 END)
                AS n_overlaps,
              count(CASE WHEN valid_from > prev_to + 1 THEN 1 END)
                AS n_gaps,
              count(CASE WHEN valid_to = 3 THEN 1 END) AS n_current,
              CAST(max(per_key) AS BIGINT) AS max_per_key
            FROM lagged"""))

  /** Domain-constraint audit (CHECK-constraint tests) — every declared
    * categorical domain of the star + corpus schemas checked in one
    * relation: rows, violations, exact-ppm violation rate per
    * constraint. The third leg of the constraint-audit family (q183
    * foreign keys, q198 primary-key uniqueness); a zero-violation
    * report is the RESULT — it proves the generators and the loaders
    * agree on the vocabulary, and any future drift lands in exactly
    * one row.
    *
    * Scale shape: one map-side-combined 1-row aggregate per table
    * scanned (violation predicate is a codegen'd IN-list), unioned —
    * no joins, no shuffles beyond the 1-row partials.
    */
  val q197DomainAudit: Q = Q(
    "q197_domain_audit",
    (s, dir) => {
      def check(name: String, df: DataFrame, c: String,
          dom: Seq[String]): DataFrame =
        df.agg(count(lit(1)).as("n_rows"),
            count(when(!col(c).isin(dom: _*), 1)).as("n_bad"))
          .select(lit(name).as("constraint"), col("n_rows"), col("n_bad"),
            expr("n_bad * 1000000 div n_rows").as("bad_ppm"))
      Seq(
        check("customer.c_mktsegment", Tables.load(s, dir, "customer"),
          "c_mktsegment", Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
            "HOUSEHOLD", "MACHINERY")),
        check("documents.lang", Tables.load(s, dir, "documents"),
          "lang", Seq("en", "es", "de", "zh", "fr")),
        check("events.event_type", Tables.load(s, dir, "events"),
          "event_type", Seq("view", "click", "purchase", "signup",
            "error")),
        check("lineitem.l_linestatus", Tables.load(s, dir, "lineitem"),
          "l_linestatus", Seq("O", "F")),
        check("lineitem.l_returnflag", Tables.load(s, dir, "lineitem"),
          "l_returnflag", Seq("R", "A", "N")),
        check("orders.o_orderstatus", Tables.load(s, dir, "orders"),
          "o_orderstatus", Seq("O", "F", "P")))
        .reduce(_.unionByName(_))
        .orderBy(col("constraint"))
    },
    Some("""WITH e AS (
              SELECT 'customer.c_mktsegment' AS con,
                (SELECT count(*) FROM customer) AS n_rows,
                (SELECT count(*) FROM customer WHERE c_mktsegment NOT IN
                  ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD',
                   'MACHINERY')) AS n_bad
              UNION ALL
              SELECT 'documents.lang', (SELECT count(*) FROM documents),
                (SELECT count(*) FROM documents
                 WHERE lang NOT IN ('en','es','de','zh','fr'))
              UNION ALL
              SELECT 'events.event_type', (SELECT count(*) FROM events),
                (SELECT count(*) FROM events WHERE event_type NOT IN
                  ('view','click','purchase','signup','error'))
              UNION ALL
              SELECT 'lineitem.l_linestatus',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem
                 WHERE l_linestatus NOT IN ('O','F'))
              UNION ALL
              SELECT 'lineitem.l_returnflag',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem
                 WHERE l_returnflag NOT IN ('R','A','N'))
              UNION ALL
              SELECT 'orders.o_orderstatus',
                (SELECT count(*) FROM orders),
                (SELECT count(*) FROM orders
                 WHERE o_orderstatus NOT IN ('O','F','P')))
            SELECT con AS "constraint", n_rows, n_bad,
              n_bad * 1000000 // n_rows AS bad_ppm
            FROM e ORDER BY con"""))

  /** Primary-key uniqueness audit — the remaining constraint class
    * (q183 FK, q197 CHECK): for every declared key, total rows vs
    * distinct key values and the duplicate surplus. lineitem's
    * composite key (orderkey, linenumber) is audited via a
    * collision-free integer pack (linenumber < 2^8, orderkey shifted),
    * so the distinct count is over one BIGINT — at 100 TB that is one
    * map-side partial distinct per key, never a struct shuffle.
    */
  val q198UniquenessAudit: Q = Q(
    "q198_uniqueness_audit",
    (s, dir) => {
      def check(name: String, df: DataFrame, key: Column): DataFrame =
        df.agg(count(lit(1)).as("n_rows"),
            count_distinct(key).as("n_distinct"))
          .select(lit(name).as("key"), col("n_rows"), col("n_distinct"),
            (col("n_rows") - col("n_distinct")).as("n_dupes"))
      Seq(
        check("customer.c_custkey", Tables.load(s, dir, "customer"),
          col("c_custkey")),
        check("documents.doc_id", Tables.load(s, dir, "documents"),
          col("doc_id")),
        check("events.event_id", Tables.load(s, dir, "events"),
          col("event_id")),
        check("lineitem.(l_orderkey,l_linenumber)",
          Tables.load(s, dir, "lineitem"),
          col("l_orderkey") * 256 + col("l_linenumber")),
        check("nation.n_nationkey", Tables.load(s, dir, "nation"),
          col("n_nationkey")),
        check("orders.o_orderkey", Tables.load(s, dir, "orders"),
          col("o_orderkey")),
        check("part.p_partkey", Tables.load(s, dir, "part"),
          col("p_partkey")),
        check("region.r_regionkey", Tables.load(s, dir, "region"),
          col("r_regionkey")),
        check("supplier.s_suppkey", Tables.load(s, dir, "supplier"),
          col("s_suppkey")))
        .reduce(_.unionByName(_))
        .orderBy(col("key"))
    },
    Some("""WITH e AS (
              SELECT 'customer.c_custkey' AS key,
                (SELECT count(*) FROM customer) AS n_rows,
                (SELECT count(DISTINCT c_custkey) FROM customer)
                  AS n_distinct
              UNION ALL
              SELECT 'documents.doc_id',
                (SELECT count(*) FROM documents),
                (SELECT count(DISTINCT doc_id) FROM documents)
              UNION ALL
              SELECT 'events.event_id', (SELECT count(*) FROM events),
                (SELECT count(DISTINCT event_id) FROM events)
              UNION ALL
              SELECT 'lineitem.(l_orderkey,l_linenumber)',
                (SELECT count(*) FROM lineitem),
                (SELECT count(DISTINCT l_orderkey * 256 + l_linenumber)
                 FROM lineitem)
              UNION ALL
              SELECT 'nation.n_nationkey', (SELECT count(*) FROM nation),
                (SELECT count(DISTINCT n_nationkey) FROM nation)
              UNION ALL
              SELECT 'orders.o_orderkey', (SELECT count(*) FROM orders),
                (SELECT count(DISTINCT o_orderkey) FROM orders)
              UNION ALL
              SELECT 'part.p_partkey', (SELECT count(*) FROM part),
                (SELECT count(DISTINCT p_partkey) FROM part)
              UNION ALL
              SELECT 'region.r_regionkey', (SELECT count(*) FROM region),
                (SELECT count(DISTINCT r_regionkey) FROM region)
              UNION ALL
              SELECT 'supplier.s_suppkey', (SELECT count(*) FROM supplier),
                (SELECT count(DISTINCT s_suppkey) FROM supplier))
            SELECT key, n_rows, n_distinct, n_rows - n_distinct AS n_dupes
            FROM e ORDER BY key"""))

  /** Right-to-be-forgotten (GDPR Art. 17) purge audit — before a
    * deletion job runs, compliance wants the blast radius: for a
    * deterministic 5 % erasure cohort of customers (content-hash
    * threshold, q48/q51's no-RNG discipline — same cohort on every
    * engine and rerun), how many rows in each linked table will be
    * erased? customer is hit directly; orders through o_custkey; and
    * lineitem only TRANSITIVELY through its order — the join-depth-2
    * case naive per-table key scans miss entirely (lineitem has no
    * customer column). One row per table with exact counts and ppm
    * (integer cross-multiplied), plus the cohort size, so the audit
    * doubles as the completeness proof: after the purge, re-running it
    * must report zeros.
    *
    * ## 100 TB notes
    * The cohort predicate is a map-side hash test (no cohort table is
    * materialized for customer/orders); lineitem's transitive hit
    * ships only the purged ORDER KEYS through a left-semi join (AQE
    * broadcasts the 5 % key set while it fits). Counts are map-side
    * combined; output is 3 rows.
    */
  val q213RtbfAudit: Q = Q(
    "q213_rtbf_audit",
    (s, dir) => {
      def inCohort(k: Column): Column =
        pmod(conv(substring(md5(k.cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(100)) < 5
      val cust = Tables.load(s, dir, "customer")
      val orders = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val custRow = cust.agg(count(lit(1)).as("n_rows"),
          sum(when(inCohort(col("c_custkey")), 1L).otherwise(0L))
            .as("n_purged"))
        .select(lit("customer").as("table_name"), col("n_rows"),
          col("n_purged"))
      val ordRow = orders.agg(count(lit(1)).as("n_rows"),
          sum(when(inCohort(col("o_custkey")), 1L).otherwise(0L))
            .as("n_purged"))
        .select(lit("orders").as("table_name"), col("n_rows"),
          col("n_purged"))
      val purgedOrders = orders.filter(inCohort(col("o_custkey")))
        .select(col("o_orderkey"))
      val liTotal = li.agg(count(lit(1)).as("n_rows"))
      val liPurged = li.join(purgedOrders,
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .agg(count(lit(1)).as("n_purged"))
      val liRow = liTotal.crossJoin(broadcast(liPurged))
        .select(lit("lineitem").as("table_name"), col("n_rows"),
          col("n_purged"))
      custRow.unionByName(ordRow).unionByName(liRow)
        .select(col("table_name"), col("n_rows"), col("n_purged"),
          expr("n_purged * 1000000 div n_rows").as("purge_ppm"))
        .orderBy(col("table_name"))
    },
    Some("""WITH c AS (SELECT 'customer' AS table_name,
                count(*) AS n_rows,
                CAST(count(*) FILTER (
                  ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                    ::BIGINT % 100 < 5) AS BIGINT) AS n_purged
              FROM customer),
            o AS (SELECT 'orders' AS table_name, count(*) AS n_rows,
                CAST(count(*) FILTER (
                  ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
                    ::BIGINT % 100 < 5) AS BIGINT) AS n_purged
              FROM orders),
            pk AS (SELECT o_orderkey FROM orders
                   WHERE ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)),
                     1, 8))::BIGINT % 100 < 5),
            l AS (SELECT 'lineitem' AS table_name,
                (SELECT count(*) FROM lineitem) AS n_rows,
                (SELECT count(*) FROM lineitem
                 WHERE l_orderkey IN (SELECT o_orderkey FROM pk))
                  AS n_purged)
            SELECT table_name, n_rows, n_purged,
              n_purged * 1000000 // n_rows AS purge_ppm
            FROM (SELECT * FROM c UNION ALL SELECT * FROM o
                  UNION ALL SELECT * FROM l)
            ORDER BY table_name"""))

  /** Cross-table invoice reconciliation — recompute every order's
    * invoice total from its lines (extendedprice x (1-discount) x
    * (1+tax), the TPC-H pricing identity) and band each order by how
    * far the header's o_totalprice deviates: exact-to-the-cent, within
    * 1 %, within 5 %, worse, or header with NO lines at all. This is
    * the reconciliation control finance runs between any two systems
    * that are supposed to agree — and on THIS synthetic fixture it
    * correctly reports that header totals do NOT derive from lines
    * (the bands quantify the discrepancy rather than assuming it
    * away). Line totals accumulate per-row double products into
    * decimal(30,10) (the Catalog double-sum contract); band edges
    * compare identical double op trees, so classification cannot flip
    * between engines.
    *
    * ## 100 TB notes
    * One shuffle on orderkey aggregates lines (map-side combined);
    * the header attach is the same-key join (bucketable, exchange
    * reused under AQE); banding is a map; the band rollup is 5 rows.
    */
  val q227InvoiceRecon: Q = Q(
    "q227_invoice_recon",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).as("net"))
      val lineTotals = li.groupBy(col("l_orderkey"))
        .agg(round(sum(col("net").cast("decimal(30,10)")), 2)
          .cast("double").as("line_total"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val bands = o.join(lineTotals,
          col("o_orderkey") === col("l_orderkey"), "left")
        .select(when(col("line_total").isNull, "e_no_lines")
          .when(abs(col("o_totalprice") - col("line_total")) < 0.01,
            "a_exact")
          .when(abs(col("o_totalprice") - col("line_total")) <
            col("o_totalprice") * 0.01, "b_within_1pct")
          .when(abs(col("o_totalprice") - col("line_total")) <
            col("o_totalprice") * 0.05, "c_within_5pct")
          .otherwise("d_worse").as("band"))
      val wAll = Window.partitionBy(lit(1))
      bands.groupBy(col("band")).agg(count(lit(1)).as("n_orders"))
        .withColumn("total", sum(col("n_orders")).over(wAll))
        .select(col("band"), col("n_orders"),
          expr("n_orders * 1000000 div total").as("ppm"))
        .orderBy(col("band"))
    },
    Some("""WITH lt AS (SELECT l_orderkey,
                CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
                    * (1.0 + l_tax) AS DECIMAL(30,10))), 2) AS DOUBLE)
                  AS line_total
              FROM lineitem GROUP BY l_orderkey),
            b AS (SELECT CASE
                WHEN line_total IS NULL THEN 'e_no_lines'
                WHEN abs(o_totalprice - line_total) < 0.01 THEN 'a_exact'
                WHEN abs(o_totalprice - line_total) < o_totalprice * 0.01
                  THEN 'b_within_1pct'
                WHEN abs(o_totalprice - line_total) < o_totalprice * 0.05
                  THEN 'c_within_5pct'
                ELSE 'd_worse' END AS band
              FROM orders LEFT JOIN lt ON o_orderkey = l_orderkey)
            SELECT band, count(*) AS n_orders,
              count(*) * 1000000 // CAST(sum(count(*)) OVER () AS BIGINT)
                AS ppm
            FROM b GROUP BY band ORDER BY band"""))

  /** Order-insensitive table content signatures — the anti-entropy
    * primitive behind replica verification (Dynamo/Cassandra repair,
    * cross-region copy checks): two copies of a table agree iff their
    * signatures agree, computable WITHOUT sorting or co-locating the
    * copies because the signature is a commutative SUM of per-row
    * hashes (md5-derived 60-bit ints, accumulated exactly in
    * decimal/HUGEINT, reduced mod 2^61) — order-, partition-, and
    * engine-independent by construction, which this oracle proves
    * cross-engine. One row per audited table with its row count and
    * signature; the row hash covers a canonical pipe-joined rendering
    * of every business column.
    *
    * ## 100 TB notes
    * Map-only per table: hash each row, one map-side-combined global
    * sum — no shuffle wider than one row. This is what makes the
    * primitive usable for repair at scale: each replica computes its
    * signature locally and ships 16 bytes.
    */
  val q237ContentSignature: Q = Q(
    "q237_content_signature",
    (s, dir) => {
      val Mod = 2305843009213693952L // 2^61
      def sig(df: DataFrame, name: String, cols: Seq[String]): DataFrame = {
        val rendered = concat_ws("|", cols.map(c => col(c).cast("string")): _*)
        val rowHash = conv(substring(md5(rendered), 1, 15), 16, 10)
          .cast("long")
        df.agg(count(lit(1)).as("n_rows"),
            pmod(sum(rowHash.cast("decimal(38,0)")),
              lit(Mod).cast("decimal(38,0)")).cast("long").as("signature"))
          .select(lit(name).as("table_name"), col("n_rows"),
            col("signature"))
      }
      val nation = sig(Tables.load(s, dir, "nation"), "nation",
        Seq("n_nationkey", "n_name"))
      val cust = sig(Tables.load(s, dir, "customer"), "customer",
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
      val orders = sig(Tables.load(s, dir, "orders"), "orders",
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
      nation.unionByName(cust).unionByName(orders)
        .orderBy(col("table_name"))
    },
    Some("""WITH n AS (SELECT 'nation' AS table_name, count(*) AS n_rows,
                CAST(sum(('0x' || substring(md5(
                    CAST(n_nationkey AS VARCHAR) || '|' || n_name),
                  1, 15))::BIGINT::HUGEINT) % (1::HUGEINT << 61) AS BIGINT)
                  AS signature
              FROM nation),
            c AS (SELECT 'customer', count(*),
                CAST(sum(('0x' || substring(md5(
                    CAST(c_custkey AS VARCHAR) || '|' || c_name || '|'
                    || CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment),
                  1, 15))::BIGINT::HUGEINT) % (1::HUGEINT << 61) AS BIGINT)
              FROM customer),
            o AS (SELECT 'orders', count(*),
                CAST(sum(('0x' || substring(md5(
                    CAST(o_orderkey AS VARCHAR) || '|'
                    || CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus
                    || '|' || o_orderpriority),
                  1, 15))::BIGINT::HUGEINT) % (1::HUGEINT << 61) AS BIGINT)
              FROM orders)
            SELECT * FROM n UNION ALL SELECT * FROM c
            UNION ALL SELECT * FROM o
            ORDER BY table_name"""))

    /** Functional-dependency discovery — TANE-style profiling over a
    * declared candidate set: for each A -> B hypothesis, how many
    * A-groups carry MORE than one distinct B (the groups where the
    * dependency breaks), and how many rows sit in those broken groups
    * (exact ppm)? An FD that holds exactly is a key/normalization fact
    * the schema never wrote down (and a dedup/merge precondition); one
    * that holds at 99.9 % is usually a data bug wearing a business
    * rule's clothes. Candidates cover real modeling questions: does a
    * customer pin its nation and segment, a nation its region, a part
    * its brand, an order its customer via lineitem?
    *
    * ## 100 TB notes
    * Each hypothesis is one map-side-combined two-level aggregate on
    * its determinant (group by A with count + count distinct B);
    * hypotheses scan only the columns they profile. No joins at all.
    */
  lazy val q243FdDiscovery: Q = Q(
    "q243_fd_discovery",
    (s, dir) => {
      def fd(df: DataFrame, a: String, b: String, name: String): DataFrame =
        df.groupBy(col(a))
          .agg(count(lit(1)).as("rows_g"),
            countDistinct(col(b)).as("nb"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("nb") > 1, 1L).otherwise(0L))
              .as("n_broken_groups"),
            sum(col("rows_g")).as("n_rows"),
            sum(when(col("nb") > 1, col("rows_g")).otherwise(0L))
              .as("n_broken_rows"))
          .select(lit(name).as("fd"), col("n_groups"),
            col("n_broken_groups"), col("n_rows"), col("n_broken_rows"),
            expr("n_broken_rows * 1000000 div n_rows").as("broken_ppm"))
      val cust = Tables.load(s, dir, "customer")
      val nationRegion = Tables.load(s, dir, "nation")
      val part = Tables.load(s, dir, "part")
      val li = Tables.load(s, dir, "lineitem")
      fd(cust, "c_custkey", "c_nationkey", "custkey_to_nation")
        .unionByName(fd(cust, "c_nationkey", "c_mktsegment",
          "nation_to_segment"))
        .unionByName(fd(nationRegion, "n_nationkey", "n_regionkey",
          "nationkey_to_region"))
        .unionByName(fd(part, "p_partkey", "p_brand", "partkey_to_brand"))
        .unionByName(fd(li, "l_orderkey", "l_suppkey", "order_to_supplier"))
        .orderBy(col("fd"))
    },
    Some("""WITH t1 AS (SELECT 'custkey_to_nation' AS fd, g.*
              FROM (SELECT count(*) AS n_groups,
                  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_broken_groups,
                  CAST(sum(rows_g) AS BIGINT) AS n_rows,
                  CAST(sum(CASE WHEN nb > 1 THEN rows_g ELSE 0 END)
                    AS BIGINT) AS n_broken_rows
                FROM (SELECT c_custkey, count(*) AS rows_g,
                        count(DISTINCT c_nationkey) AS nb
                      FROM customer GROUP BY c_custkey)) g),
            t2 AS (SELECT 'nation_to_segment', g.*
              FROM (SELECT count(*),
                  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(sum(rows_g) AS BIGINT),
                  CAST(sum(CASE WHEN nb > 1 THEN rows_g ELSE 0 END)
                    AS BIGINT)
                FROM (SELECT c_nationkey, count(*) AS rows_g,
                        count(DISTINCT c_mktsegment) AS nb
                      FROM customer GROUP BY c_nationkey)) g),
            t3 AS (SELECT 'nationkey_to_region', g.*
              FROM (SELECT count(*),
                  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(sum(rows_g) AS BIGINT),
                  CAST(sum(CASE WHEN nb > 1 THEN rows_g ELSE 0 END)
                    AS BIGINT)
                FROM (SELECT n_nationkey, count(*) AS rows_g,
                        count(DISTINCT n_regionkey) AS nb
                      FROM nation GROUP BY n_nationkey)) g),
            t4 AS (SELECT 'partkey_to_brand', g.*
              FROM (SELECT count(*),
                  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(sum(rows_g) AS BIGINT),
                  CAST(sum(CASE WHEN nb > 1 THEN rows_g ELSE 0 END)
                    AS BIGINT)
                FROM (SELECT p_partkey, count(*) AS rows_g,
                        count(DISTINCT p_brand) AS nb
                      FROM part GROUP BY p_partkey)) g),
            t5 AS (SELECT 'order_to_supplier', g.*
              FROM (SELECT count(*),
                  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(sum(rows_g) AS BIGINT),
                  CAST(sum(CASE WHEN nb > 1 THEN rows_g ELSE 0 END)
                    AS BIGINT)
                FROM (SELECT l_orderkey, count(*) AS rows_g,
                        count(DISTINCT l_suppkey) AS nb
                      FROM lineitem GROUP BY l_orderkey)) g)
            SELECT fd, n_groups, n_broken_groups, n_rows, n_broken_rows,
              n_broken_rows * 1000000 // n_rows AS broken_ppm
            FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2
                  UNION ALL SELECT * FROM t3 UNION ALL SELECT * FROM t4
                  UNION ALL SELECT * FROM t5)
            ORDER BY fd"""))

  /** Freshness-skew audit — a warehouse is "current" only if every
    * table reached the SAME watermark: per timestamped table, the
    * latest event time, its lag behind the freshest table (exact µs),
    * and the row count arriving in the final 30 days before that
    * table's own watermark (a near-zero tail says the feed died long
    * before its max timestamp suggests). The cross-table LAG is the
    * audit: a report joining a fresh fact to a stale dimension is
    * wrong in a way neither table shows alone.
    *
    * ## 100 TB notes
    * Per table: one map-side-combined min/max/conditional-count
    * aggregate over the pruned timestamp column; the skew join is
    * 3 rows x 1 row. At scale the per-table aggregate reads footer
    * statistics-sized data when the table is date-partitioned.
    */
  val q247FreshnessSkew: Q = Q(
    "q247_freshness_skew",
    (s, dir) => {
      val dayUs = 86400000000L
      def audit(df: DataFrame, name: String, tsUsCol: Column): DataFrame =
        df.select(tsUsCol.as("t"))
          .agg(count(lit(1)).as("n_rows"), max(col("t")).as("max_ts_us"))
          .select(lit(name).as("table_name"), col("n_rows"),
            col("max_ts_us"))
      def tail30(df: DataFrame, name: String, tsUsCol: Column): DataFrame =
        df.select(tsUsCol.as("t"))
          .withColumn("mx", max(col("t")).over(Window.partitionBy(lit(1))))
          .filter(col("t") > col("mx") - lit(30L * dayUs))
          .agg(count(lit(1)).as("n_last_30d"))
          .select(lit(name).as("table_name"), col("n_last_30d"))
      def us(c: Column): Column =
        unix_micros(c.cast("timestamp_ltz"))
      val orders = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      val ev = Tables.load(s, dir, "events")
      val heads = audit(orders, "orders", us(col("o_orderdate")))
        .unionByName(audit(li, "lineitem", us(col("l_shipdate"))))
        .unionByName(audit(ev, "events", expr("ts div 1000")))
      val tails = tail30(orders, "orders", us(col("o_orderdate")))
        .unionByName(tail30(li, "lineitem", us(col("l_shipdate"))))
        .unionByName(tail30(ev, "events", expr("ts div 1000")))
      heads.join(tails, Seq("table_name"))
        .withColumn("global_max",
          max(col("max_ts_us")).over(Window.partitionBy(lit(1))))
        .select(col("table_name"), col("n_rows"), col("max_ts_us"),
          (col("global_max") - col("max_ts_us")).as("lag_us"),
          col("n_last_30d"))
        .orderBy(col("table_name"))
    },
    Some("""WITH o AS (SELECT 'orders' AS table_name, count(*) AS n_rows,
                max(epoch_us(o_orderdate)) AS max_ts_us,
                count(*) FILTER (epoch_us(o_orderdate) >
                  (SELECT max(epoch_us(o_orderdate)) FROM orders)
                    - 2592000000000) AS n_last_30d
              FROM orders),
            l AS (SELECT 'lineitem', count(*),
                max(epoch_us(l_shipdate)),
                count(*) FILTER (epoch_us(l_shipdate) >
                  (SELECT max(epoch_us(l_shipdate)) FROM lineitem)
                    - 2592000000000)
              FROM lineitem),
            e AS (SELECT 'events', count(*),
                max(epoch_us(CAST(ts AS TIMESTAMP))),
                count(*) FILTER (epoch_us(CAST(ts AS TIMESTAMP)) >
                  (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) FROM events)
                    - 2592000000000)
              FROM events),
            u AS (SELECT * FROM o UNION ALL SELECT * FROM l
                  UNION ALL SELECT * FROM e)
            SELECT table_name, n_rows, max_ts_us,
              (SELECT max(max_ts_us) FROM u) - max_ts_us AS lag_us,
              n_last_30d
            FROM u ORDER BY table_name"""))

  val all: Seq[Q] =
    Seq(q98PiiRedact, q99Scd2Snapshots, q100NfcNormalize, q101IntervalMerge,
      q104KAnonymity, q121PitEnrich, q126CdcApply, q164LDiversity,
      q178TCloseness, q195Scd2Invariants, q197DomainAudit,
      q198UniquenessAudit, q213RtbfAudit, q227InvoiceRecon,
      q237ContentSignature, q243FdDiscovery, q247FreshnessSkew)
}
