package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gold-layer aggregates.
  *
  * The reference's entire gold layer is one 2-key group-count
  * (reference: plugins/brewery_operators.py:373-379):
  * `groupBy(brewery_type, state).agg(count(id))`. `count(col)` counts
  * non-null values only, and NULL keys form their own group — both
  * preserved here by using the same Catalyst aggregate.
  *
  * Scale: Catalyst plans this as partial HashAggregate -> shuffle on the
  * group keys -> final HashAggregate, so the shuffle carries one row per
  * (group, map-task) instead of the raw table. That plan is exactly what
  * you want at 100 TB; nothing custom needed.
  */
object Gold {

  /** N-key non-null-count, the reference's flagship aggregate. */
  def groupCount(df: DataFrame, keys: Seq[Column], countCol: Column,
                 as: String = "cnt"): DataFrame =
    df.groupBy(keys: _*).agg(count(countCol).as(as))
}
