package graft.queries

import graft.QueryDef

object Ml {
  def all: Seq[QueryDef] = Seq()
}
