package graft.queries

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.Catalog.Q
import graft.engine.Tables

/** Shared seams of the event-time suite (split from the original
  * single-file EventQueries along its family seams): the `ts`-as-BIGINT-ns
  * engine contract helpers and the gaps-and-islands session CTE both the
  * Spark queries and their DuckDB oracles build on. Mixed into
  * [[EventQueries]] via the family traits; `private[queries]` because
  * these are internal seams, not API.
  */
private[queries] trait EventQueriesBase {
  /** epoch-µs from the ns BIGINT (floor division; all fixture ts > 0). */
  private[queries] val tsUs: Column = expr("ts div 1000")

  /** µs TIMESTAMP (LTZ; session is UTC) for window()/session_window(). */
  private[queries] val tsStamp: Column = timestamp_micros(tsUs)

  /** epoch-µs of a window-struct bound (already LTZ). */
  private[queries] def us(c: Column): Column = unix_micros(c.cast("timestamp_ltz"))

  private[queries] val duckUs = (e: String) => s"epoch_us(CAST($e AS TIMESTAMP))"

  /** The session gap, single-sourced from the streaming implementation so
    * the batch relations (q33/q34), the streaming path, and every oracle
    * agree by construction.
    */
  private[queries] val GapUs: Long = graft.streaming.EventStreams.SessionGapUs

  /** Gaps-and-islands session core shared by the q33/q34/q75 oracles:
    * CTEs `e(user_id, event_id, value, ts_us)` →
    * `sess(..., is_new, session_seq)`.
    */
  private[queries] def duckSessionCtes: String =
    s"""e AS (SELECT user_id, event_id, event_type, value,
                          ${duckUs("ts")} AS ts_us FROM events),
             flags AS (SELECT *, CASE WHEN prev_us IS NULL
                           OR ts_us - prev_us > $GapUs THEN 1 ELSE 0 END AS is_new
                       FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS prev_us FROM e)),
             sess AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
                        ORDER BY ts_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS session_seq
                      FROM flags)"""
}
