package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The reference's whole pipeline as function composition
  * (SURVEY.md §2.9, §7.1): the Airflow DAG
  * `extract >> bronze >> silver >> quality >> gold`
  * (reference: dags/dag-brewery_pipeline.py:119) becomes one call chain
  * with the DQ gate as a throwing step — quality failures are control
  * flow, not data (the reference's contract, ditto :92-100).
  *
  * Each stage both writes its layer and returns the DataFrame it wrote, so
  * callers can compose without re-reading — unlike the reference, which
  * re-reads silver from storage in both the gate and gold stages and
  * recomputes the gold plan for its second (JDBC) write.
  */
object Medallion {

  final case class Layout(bronzeRoot: String, silverPath: String, goldPath: String)

  /** Ingested batch -> bronze JSON snapshot (returns the snapshot dir). */
  def toBronze(raw: DataFrame, layout: Layout, runTs: String): String =
    Sinks.writeBronzeJson(raw, layout.bronzeRoot, runTs)

  /** Latest bronze snapshot -> cleaned silver, hive-partitioned. */
  def toSilver(spark: SparkSession, layout: Layout,
               projection: Seq[(String, Column)],
               partitionCols: Seq[String]): DataFrame = {
    val bronze = Sources.readLatestJsonSnapshot(spark, layout.bronzeRoot)
      .getOrElse(throw new IllegalStateException(
        s"no bronze snapshot under ${layout.bronzeRoot}"))
    val silver = Silver.project(bronze, projection)
    Sinks.writePartitionedParquet(silver, layout.silverPath, partitionCols)
    Sources.readParquet(spark, layout.silverPath)
  }

  /** Throwing DQ gate between silver and gold (P7-P9/A2). */
  def gate(silver: DataFrame, checks: Seq[Quality.Check]): DataFrame = {
    Quality.assertGate(silver, checks)
    silver
  }

  /** Gated silver -> gold aggregate, parquet + optional JDBC mirror. */
  def toGold(silver: DataFrame, layout: Layout,
             keys: Seq[Column], countCol: Column, countName: String,
             jdbc: Option[(String, String)] = None): DataFrame = {
    val gold = Gold.groupCount(silver, keys, countCol, countName)
    // single materialization serves both sinks (the reference recomputes
    // the aggregate for its JDBC write; see SURVEY.md §3.2)
    gold.cache()
    try {
      Sinks.writeParquet(gold, layout.goldPath)
      jdbc.foreach { case (url, table) => Sinks.writeJdbc(gold, url, table) }
    } finally gold.unpersist()
    gold
  }
}
