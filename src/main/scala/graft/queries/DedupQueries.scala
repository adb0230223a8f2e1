package graft.queries

import graft.Catalog.Q

object DedupQueries {
  val all: Seq[Q] = Seq()
}
