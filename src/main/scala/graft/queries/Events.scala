package graft.queries

import graft.QueryDef

object Events {
  def all: Seq[QueryDef] = Seq()
}
