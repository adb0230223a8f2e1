package graft.engine.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline extension surface
  * (SURVEY.md §7.4): tokenization, shingling, hashing for dedup, stopword
  * scoring. The reference has no text operators (its only string work is
  * trim/lower/concat_ws, plugins/brewery_operators.py:255-265) — this
  * module is the beyond-reference capability the north-star demands.
  *
  * Design rules:
  *  - every primitive is a pure `Column` expression (whole-stage codegen,
  *    no UDF, no driver round-trip) so a 100 TB corpus runs it inside the
  *    scan projection;
  *  - all hashing is md5-over-string: deterministic, available identically
  *    in the DuckDB oracle, and portable across JVM versions (unlike
  *    `hash()`/`xxhash64` whose seeds are engine-private);
  *  - near-dup candidate generation is always bucketed (LSH bands / rare
  *    shingles) — never an all-pairs cross join.
  */
object Text {

  /** Whitespace tokenization (fixture `documents.text` is space-joined). */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex tokenizer (BPE-ish pre-tokenization: alnum runs of the lowered
    * text); drops the empty fragments a leading/trailing separator leaves.
    */
  def regexTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** k-token shingles: one string per window of k consecutive tokens
    * (truncated at the tail; a doc shorter than k yields one shingle).
    *
    * Deliberately a single-level array HOF (interpreted lambda, no
    * codegen) and NOT the flat posexplode + lead()-window form. Measured
    * at sf0.1 the flat form is ~3x faster locally (0.5 s vs 1.5 s per
    * pass) — but it earns that by shuffling the ENTIRE exploded token
    * table on doc_id for the window sort, while this form is pure
    * per-row compute with no exchange, and every consumer (minhash,
    * df-blocking, decontamination, boilerplate) follows it with a
    * map-side partial aggregation that shuffles ~one row per doc. At
    * 1000-executor / 100 TB scale the token-table shuffle is the
    * dominant cost and the interpreted-lambda overhead is noise; local
    * small-data timing inverts that. Scale wins.
    */
  def shingles(toks: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k))))

  /** Count of tokens belonging to a fixed word set (stopword scoring). */
  def wordSetHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Content fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(trim(lower(text)))

  /** 32-bit hash of a string as a BIGINT (first 8 md5 hex chars). Used for
    * simhash bit extraction; DuckDB mirror: ('0x' || substr(md5(s),1,8))::BIGINT.
    */
  def hash32(s: Column): Column = conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** 60-bit hash (15 md5 hex chars) — the widest md5 prefix that stays
    * comfortably inside a signed 64-bit integer on both engines.
    */
  def hash60(s: Column): Column = conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Prefix-blocked Levenshtein near-dup candidate pairs: documents
    * sharing their first `blockTokens` tokens are candidates; candidates
    * within edit distance `maxDist` are emitted as (d1, d2, dist),
    * d1 < d2. Shared by q42 (pair output) and q43 (edge input) so the
    * two can never silently diverge.
    *
    * The repartition carries an EXPLICIT count: AQE's coalescing is
    * bytes-based, and a bare repartition(col) over a small-looking doc
    * table gets coalesced back to one partition — serializing the
    * O(len^2) DP (measured 14.5 s -> 1.3 s at sf0.1). At 100 TB the same
    * rule: pin parallelism for compute-bound verification stages.
    */
  def levNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                      blockTokens: Int, maxDist: Int): DataFrame = {
    val keyed = docs.select(col(idCol), col(textCol).as("__text"),
      concat_ws(" ", slice(tokens(col(textCol)), 1, blockTokens)).as("blk"))
      .repartition(
        docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("blk"))
    keyed.as("x")
      .join(keyed.as("y"),
        col("x.blk") === col("y.blk") && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("d1"), col(s"y.$idCol").as("d2"),
        // thresholded form: banded O(len*maxDist) DP instead of the full
        // O(len^2) table, returning -1 above the bound — identical output
        // after the filter, and the bound is exactly the filter we apply
        levenshtein(col("x.__text"), col("y.__text"), maxDist)
          .cast("long").as("dist"))
      .filter(col("dist").between(0, maxDist))
  }

  /** Winnowing fingerprint stream (Schleimer et al. 2003): hash every
    * k-token gram of `textCol` in order, slide a w-hash window, keep each
    * window's minimum. Returns one row per FULL window:
    * (idCol, pos, wmin). Guarantee: two docs sharing a run of at least
    * k+w-1 tokens share at least one wmin value (property-tested).
    * One shuffle on the id; window state bounded by w rows.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame = {
    val ex = docs
      .select(col(idCol),
        posexplode(shingles(tokens(col(textCol)), k)).as(Seq("pos", "g")))
      .select(col(idCol), col("pos"), hash32(col("g")).as("h"))
    val byDoc = Window.partitionBy(col(idCol))
    val frame = byDoc.orderBy(col("pos")).rowsBetween(Window.currentRow, w - 1)
    ex.withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("wmin", min(col("h")).over(frame))
      .filter(col("pos") <= col("n") - w) // full windows only (pos 0-based)
      .select(col(idCol), col("pos"), col("wmin"))
  }
}
