package graft.queries

import graft.QueryDef

object Dedup {
  def all: Seq[QueryDef] = Seq()
}
