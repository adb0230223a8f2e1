package graft.queries

import graft.Catalog.Q

object EventQueries {
  val all: Seq[Q] = Seq()
}
