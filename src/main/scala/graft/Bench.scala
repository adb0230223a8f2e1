package graft

/** Benchmark main (driver contract): one JSON line with per-query seconds.
  *
  * Measurement policy:
  *  - each query is executed via a `noop`-format write, so the measured
  *    physical plan is exactly the verified plan — including the final
  *    total-order sort that a bare `.count()` would let Catalyst delete;
  *  - one un-timed warm-up execution (the flagship q01) absorbs JVM /
  *    session / codegen start-up cost so per-query numbers are comparable
  *    across rounds (round-1 note: first query absorbed ~4.8 s of warm-up);
  *  - a query that THROWS is reported in an `"errors"` object rather than
  *    silently recording a near-zero (i.e. flatteringly fast) time —
  *    correctness is gated elsewhere, but the bench artifact must not let
  *    a broken query masquerade as a fast one;
  *  - the warm figure is the MIN of two cache-cleared executions: single
  *    warm samples proved noisy under machine contention (round-3 driver
  *    pass showed 3-5x outliers vs a rerun minutes later), and min-of-N
  *    is the standard de-noising for "steady-state cost" on a shared box.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.local("graft-bench")
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // warm-up: not timed, not reported
    try run(SparkEntry.queries("q01_gold_count")) catch { case _: Throwable => () }
    // Each query is timed three times: COLD (first execution in this JVM —
    // includes the one-time Catalyst/Janino/JIT cost of its generated
    // classes) and twice WARM (codegen cached — the steady-state data-path
    // cost, which is what amortizes at 100 TB; min of the two reported).
    // `value` stays the cold total for round-over-round comparability.
    // The cache is cleared between every pass: queries that persist
    // intermediates (dedup band tables, CC labels) would otherwise serve
    // later passes from cache and measure cache hits, not the recomputed
    // data path — and leaked blocks add GC noise to later queries.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def timed(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err =
          try { run(fn); None }
          catch { case e: Throwable =>
            Some(e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("").take(200))
          }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val (cold, coldErr) = timed()
      spark.sharedState.cacheManager.clearCache()
      val warmSamples = Seq.fill(2) {
        val s = timed(); spark.sharedState.cacheManager.clearCache(); s
      }
      // a pass that threw measured the time-to-failure, not the data path
      // — never let it undercut a successful sample's warm figure
      val okWarm = warmSamples.collect { case (t, None) => t }
      val warm = if (okWarm.nonEmpty) okWarm.min else warmSamples.map(_._1).min
      (name, cold, warm, coldErr.orElse(warmSamples.collectFirst {
        case (_, Some(e)) => e
      }))
    }
    def obj(f: ((String, Double, Double, Option[String])) => Double): String =
      results.map(r => Jsons.quote(r._1) + ":" + f(r)).mkString("{", ",", "}")
    val errors = results
      .collect { case (n, _, _, Some(e)) => Jsons.quote(n) + ":" + Jsons.quote(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalWarm = results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(_._2)},"total_warm":$totalWarm,"queries_warm":${obj(_._3)},"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
