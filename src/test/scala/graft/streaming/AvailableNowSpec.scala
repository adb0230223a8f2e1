package graft.streaming

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** `Trigger.AvailableNow` + checkpoint resume — the production backfill
  * contract: a run drains everything currently staged (respecting
  * admission limits like maxFilesPerTrigger, unlike the deprecated
  * `Trigger.Once`) and then STOPS; a later run against the same
  * checkpoint picks up only files staged since. Together these are
  * exactly-once incremental batch over a streaming source — how a
  * 100 TB pipeline does nightly catch-up without a long-lived cluster.
  */
class AvailableNowSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow drains the staged files, then resumes exactly-once") {
    withTempDir { root =>
      val src = s"$root/src"
      val out = s"$root/out"
      val ckpt = s"$root/ckpt"
      def stage(id: Long): Unit =
        Seq((id, s"v$id")).toDF("id", "v")
          .write.mode("append").parquet(src)
      stage(1); stage(2); stage(3)
      val schema = spark.read.parquet(src).schema
      def runOnce(): Unit = {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1) // admission limit still honored
          .parquet(src)
          .writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination() // AvailableNow terminates when caught up
      }
      runOnce()
      spark.read.parquet(out).select(col("id")).as[Long]
        .collect().sorted shouldBe Seq(1L, 2L, 3L)
      // second run, same checkpoint: only the newly staged file lands —
      // nothing is re-ingested
      stage(4)
      runOnce()
      spark.read.parquet(out).select(col("id")).as[Long]
        .collect().sorted shouldBe Seq(1L, 2L, 3L, 4L)
    }
  }
}
