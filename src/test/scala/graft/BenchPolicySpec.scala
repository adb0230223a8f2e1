package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the bench delivery policy (round-6 lesson: the driver bench
  * timed out with zero parsed numbers because suite growth silently
  * outgrew the wall budget).
  *
  *  - the streaming tag drives cold-only timing in [[Bench]]; a new
  *    `readStream` query registered without the tag would be timed with
  *    a warm pass that re-pays state-store provisioning, re-inflating
  *    the bench wall — so the tagged set is pinned here and any drift
  *    (either direction) fails the build with a pointer to the policy;
  *  - `scripts/benchguard.py` (budget estimator) must stay green via its
  *    own `--selftest`; this spec checks it exists so the round-close
  *    checklist can't silently lose it.
  */
class BenchPolicySpec extends AnyFunSuite with Matchers {

  private val expectedStreaming = Set(
    "q64_stream_hourly", "q66_stream_dedup", "q75_stream_sessions",
    "q76_stream_late_drop", "q78_stream_interval_join",
    "q83_stream_static_enrich", "q84_foreachbatch_upsert",
    "q107_stream_outer_join", "q119_stream_running_totals",
    "q265_stream_tws_totals", "q266_stream_tws_sessions",
    "q275_stream_tws_topk", "q276_stream_tws_typecounts",
    "q284_stream_incremental_gold", "q293_manifest_changefeed",
    "q294_manifest_feed_resume")

  test("streaming-tagged queries are exactly the Structured Streaming runs") {
    val tagged = Catalog.all.filter(_.streaming).map(_.name).toSet
    assert(tagged == expectedStreaming,
      s"streaming tag drifted: extra=${tagged -- expectedStreaming}, " +
        s"missing=${expectedStreaming -- tagged} — if a new readStream " +
        "query was added, tag it in EventQueries.streamingNames AND here")
  }

  test("every catalog name is unique (bench/verify key into maps by name)") {
    val names = Catalog.all.map(_.name)
    names.distinct.size shouldBe names.size
  }

  test("bench-budget guard script is present") {
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get("scripts/benchguard.py")),
      "scripts/benchguard.py missing — the bench-budget regression guard " +
        "(VERDICT r06 ask #3) must survive round closes")
  }
}
