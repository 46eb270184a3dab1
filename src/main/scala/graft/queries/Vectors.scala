package graft.queries

import graft.QueryDef

object Vectors {
  def all: Seq[QueryDef] = Seq()
}
