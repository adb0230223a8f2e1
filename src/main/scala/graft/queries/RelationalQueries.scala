package graft.queries

import graft.Catalog.Q

object RelationalQueries {
  val all: Seq[Q] = Seq()
}
