package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen

import graft.SparkSpec

/** The one-pass top-k Aggregator: window-form equivalence on random data
  * (including duplicate values forcing the id tie-break), partial-merge
  * correctness across many partitions, and k beyond group size.
  */
class TopByValueSpec extends SparkSpec {
  import spark.implicits._

  test("matches the window top-k on random data with ties") {
    val rows = Gen.listOfN(500, for {
      g <- Gen.chooseNum(0, 5)
      v <- Gen.chooseNum(0, 9).map(_.toDouble) // few values -> many ties
      id <- Gen.chooseNum(0L, 100000L)
    } yield (g, v, id)).sample.get.distinctBy(r => (r._1, r._3))
    val ds = rows.toDF("g", "v", "id").repartition(13) // force partial merges
      .as[(Int, Double, Long)]
    val agg = new TopByValue.OfTriple(4)
    val got = ds.groupByKey(_._1).agg(agg.toColumn.name("topk"))
      .flatMap { case (g, l) =>
        l.zipWithIndex.map { case ((v, id), i) => (g, i + 1, id, v) }
      }.collect().toSet
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v").desc, col("id").asc)
    val exp = rows.toDF("g", "v", "id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 4)
      .select(col("g"), col("rank"), col("id"), col("v"))
      .as[(Int, Int, Long, Double)].collect().toSet
    got shouldBe exp
  }

  test("k larger than the group returns the whole group, sorted") {
    val ds = Seq((1, 2.0, 10L), (1, 9.0, 11L), (1, 9.0, 5L))
      .toDS()
    val agg = new TopByValue.OfTriple(10)
    val out = ds.groupByKey(_._1).agg(agg.toColumn).collect().head._2
    out shouldBe Seq((9.0, 5L), (9.0, 11L), (2.0, 10L)) // value desc, id asc
  }
}
