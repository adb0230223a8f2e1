package graft

/** Plan-audit utility: prints the formatted physical plan for the named
  * queries (all queries if none named) over a given sf dir. Used for the
  * per-round plan audit (pushdown/pruning/broadcast/codegen checks) —
  * `runMain graft.Explain /root/testdata/sf0.01 q07_star_revenue ...`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = engine.Sessions.local("graft-explain")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
