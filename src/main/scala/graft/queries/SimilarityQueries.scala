package graft.queries

import graft.Catalog.Q

object SimilarityQueries {
  val all: Seq[Q] = Seq()
}
