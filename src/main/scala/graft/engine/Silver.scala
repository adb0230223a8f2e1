package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Silver-layer cleaning library.
  *
  * Re-expresses the reference's silver projection
  * (reference: plugins/brewery_operators.py:255-265) as a reusable set of
  * column transformations: rename, trim, lower, null-skipping address
  * concat (concat_ws), and lenient string->double casts.
  *
  * Spark 4 runs with ANSI mode ON by default, which turns the reference's
  * "malformed cast -> NULL" (PySpark 3.3, ANSI off) into a runtime error.
  * `castDoubleLenient` therefore uses try_cast, which restores the
  * reference semantics without globally disabling ANSI.
  *
  * Everything here is a narrow projection: at 100 TB it stays a single
  * whole-stage-codegen'd map over the scan, no shuffle.
  */
object Silver {

  /** whitespace-strip (reference :257 `trim(name)`); naming is applied
    * once, by [[project]] — helpers return bare columns.
    */
  def cleanName(c: Column): Column = trim(c)

  /** lower-case normalization of a categorical key (reference :258). */
  def normKey(c: Column): Column = lower(c)

  /** Null-skipping ", "-join of address parts (reference :259). */
  def fullAddress(parts: Column*): Column = concat_ws(", ", parts: _*)

  /** string->double, malformed -> NULL (reference :263-264 under ANSI-off). */
  def castDoubleLenient(c: Column): Column = c.try_cast("double")

  /** The reference's whole silver projection, generalized: apply a list of
    * (outputName -> column) in order. Stays untyped so Catalyst can prune
    * and push down through it.
    */
  def project(df: DataFrame, cols: Seq[(String, Column)]): DataFrame =
    df.select(cols.map { case (n, c) => c.as(n) }: _*)
}
