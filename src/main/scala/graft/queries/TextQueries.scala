package graft.queries

import graft.Catalog.Q

object TextQueries {
  val all: Seq[Q] = Seq()
}
