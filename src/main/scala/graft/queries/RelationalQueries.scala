package graft.queries

import graft.Catalog.Q

/** Join / aggregation / window / set-op suite (SURVEY.md §2.3-§2.5
  * extensions — the reference has no joins, windows, or set ops, but a
  * credible engine needs them; see SURVEY.md §7.4).
  *
  * Scale design notes (100 TB):
  *  - FIXED-size dimension joins (nation, region) are explicitly
  *    `broadcast()` — no shuffle of the fact side. Tables that scale
  *    with the data (customer in q07) are NOT hinted: AQE picks
  *    broadcast while they fit and shuffle-join beyond;
  *  - fact-fact joins (lineitem x orders) shuffle on the join key and are
  *    AQE-coalesced; at cluster scale these tables would be bucketed by
  *    orderkey, making the exchange disappear;
  *  - windows partition by a key (never a global window), so state is
  *    bounded per key group;
  *  - the only global sorts are over already-aggregated (small) results,
  *    or top-n (TakeOrderedAndProject — no full sort materialization).
  */
object RelationalQueries extends RelationalJoinQueries
    with RelationalWindowQueries with RelationalStatsQueries {
  val all: Seq[Q] = Seq(q06JoinDims, q07StarRevenue, q08SemiJoin, q09AntiJoin,
    q10AggStats, q11Rollup, q12DistinctExact, q13WindowTopK, q14RunningSum,
    q15Pivot, q16SetOps, q17GlobalTopN, q40QuantilesDisc, q41Moments,
    q46Cube, q47LeadNtile, q53TopkAgg, q55StringAgg, q56RegexExtract,
    q87SnapshotDiff, q89PagerankStep, q112TierJoin, q113Histogram,
    q114CorrMatrix, q116FullOuter, q117Unpivot, q118GroupingSets,
    q124MadOutliers, q129WowGrowth, q130BloomMembership, q133RankFamily,
    q135SnowflakeChain, q136EquidepthHistogram, q157Winsorize,
    q160WilsonInterval, q167ZorderLayout, q168Skyline, q175WeightedMedian,
    q182Benford, q183OrphanAudit, q187ZonemapSkip, q189QuantileSketch,
    q196BloomJoinAudit, q202JoinCardAudit, q209CohortLtv, q211SeasonalDow,
    q212PurchaseGaps, q214AbcClasses, q216AnovaDow, q217SupplierHhi,
    q222PopBaseline, q223QuantileInterp, q224GiniMeanDiff, q225ReturnRate,
    q226ShipSla, q229SeasonalDecomp, q230TargetEncoding, q235DrillAcross,
    q236FanoutProfile, q245ForecastBacktest, q246FillRate, q249OtifScore,
    q250RevenueBridge, q252BasketEconomics, q253DeviationDrawdown,
    q255NewVsReturning, q256HhiTrend, q271EncodingAudit, q285JackknifeRatio,
    q295BucketedJoin)
}
