package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

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

  /** Persist AND materialize now. A lazily-persisted table consumed by
    * several branches of one action (self-joins, derived aggregates) is
    * otherwise computed concurrently by every branch — they race on the
    * block-manager cache-fill locks and the upstream pipeline runs up to
    * once per branch (measured 8.4 s -> 1.4 s on the LSH band table at
    * sf0.1). Same rule at 100 TB: materialize/checkpoint before fan-out.
    */
  def eager(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }
}
