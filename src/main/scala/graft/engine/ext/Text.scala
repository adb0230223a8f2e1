package graft.engine.ext

import org.apache.spark.sql.Column
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
}
