package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders (one parquet per table, see /root/repo/TESTDATA.md).
  *
  * At 100 TB each of these would be a partitioned/bucketed dataset instead of
  * a single file; the loader is the one place that would change (directory
  * scan + partition pruning are handled by the parquet source either way).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
