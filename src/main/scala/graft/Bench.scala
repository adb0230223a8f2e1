package graft

/** Benchmark main (driver contract): streams one JSON line per query as
  * it completes, then the driver-facing summary line LAST.
  *
  * Delivery policy (round-6 lesson: `BENCH_r06.json` was rc 124 /
  * `parsed: null` because the whole suite's numbers were held until the
  * end and the driver's wall budget expired first):
  *  - every per-query result is printed — and flushed — the moment the
  *    query finishes, as a `{"progress":"query",...}` JSONL line, so a
  *    timeout still yields per-query data (the key is `progress`, not
  *    `metric`, so summary-line consumers cannot mis-parse a partial
  *    line as the total);
  *  - the single `{"metric":"total",...}` summary line is printed last,
  *    unchanged in shape from previous rounds.
  *
  * Measurement policy:
  *  - each query is executed via a `noop`-format write, so the measured
  *    physical plan is exactly the verified plan — including the final
  *    total-order sort that a bare `.count()` would let Catalyst delete;
  *  - one un-timed warm-up execution (the flagship q01) absorbs JVM /
  *    session / codegen start-up cost, and streaming staging dirs are
  *    pre-built, so per-query numbers are comparable across rounds;
  *  - a query that THROWS is reported in an `"errors"` object rather than
  *    silently recording a near-zero (i.e. flatteringly fast) time;
  *  - BATCH queries: one cold pass (includes per-query Catalyst/Janino/
  *    JIT cost) + ONE warm pass (codegen cached — the steady-state cost
  *    that amortizes at 100 TB). Round 5 used min-of-2 warm samples as a
  *    noise fix; that cost ~127 s of wall and is the second thing the
  *    round-6 timeout traded away. Cold remains `value` for
  *    round-over-round comparability.
  *  - STREAMING queries (`Q.streaming`): cold pass only. Each execution
  *    re-pays state-store provisioning (~3.5 s load in the r06 driver
  *    tail) regardless of warmth — a warm pass measures provisioning
  *    again, not a cached data path — and steady-state micro-batch cost
  *    is not meaningful at bench SF anyway. They are excluded from
  *    `queries_warm`/`total_warm` so the warm totals stay a pure batch
  *    steady-state figure.
  *  - the cache is cleared between passes: queries that persist
  *    intermediates (dedup band tables, CC labels) would otherwise serve
  *    later passes from cache and measure cache hits, not the recomputed
  *    data path.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional trailing args: query-name filters for local iteration
    // (the driver passes none and gets the full suite)
    val only = args.toSet
    val unknown = only -- Catalog.all.map(_.name).toSet
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val spark = graft.engine.Sessions.local("graft-bench")
    def run(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // un-timed: session warm-up + streaming staging (both would otherwise
    // land in the first affected query's cold figure)
    try run(SparkEntry.queries("q01_gold_count")) catch { case _: Throwable => () }
    try graft.queries.EventQueries.prestage(spark, sfDir)
    catch { case _: Throwable => () }

    final case class R(name: String, cold: Double, warm: Option[Double],
        err: Option[String])
    val results = Catalog.all.filter(q => only.isEmpty || only(q.name))
      .sortBy(_.name).map { q =>
      def timed(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err =
          try { run(q.fn); None }
          catch { case e: Throwable =>
            Some(e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("").take(200))
          }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val (cold, coldErr) = timed()
      spark.sharedState.cacheManager.clearCache()
      val (warm, warmErr) =
        if (q.streaming) (None, None)
        else {
          val (t, e) = timed()
          spark.sharedState.cacheManager.clearCache()
          // a pass that threw measured time-to-failure, not the data path
          (if (e.isEmpty) Some(t) else None, e)
        }
      val r = R(q.name, cold, warm, coldErr.orElse(warmErr))
      // flushed JSONL progress line: a driver timeout still yields data
      println(s"""{"progress":"query","name":${Jsons.quote(r.name)},"cold":${r.cold}${
        r.warm.fold("")(w => s""","warm":$w""")},"streaming":${q.streaming}${
        r.err.fold("")(e => s""","err":${Jsons.quote(e)}""")}}""")
      System.out.flush()
      r
    }
    val queries =
      results.map(r => Jsons.quote(r.name) + ":" + r.cold).mkString("{", ",", "}")
    val warmRs = results.collect { case R(n, _, Some(w), _) => (n, w) }
    val queriesWarm =
      warmRs.map { case (n, w) => Jsons.quote(n) + ":" + w }.mkString("{", ",", "}")
    val errors = results
      .collect { case R(n, _, _, Some(e)) => Jsons.quote(n) + ":" + Jsons.quote(e) }
      .mkString("{", ",", "}")
    val total = results.map(_.cold).sum
    val totalWarm = warmRs.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$queries,"total_warm":$totalWarm,"queries_warm":$queriesWarm,"errors":$errors,"sf":"$sfDir"}""")
    System.out.flush()
    spark.stop()
  }
}
