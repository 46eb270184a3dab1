package graft.queries

import graft.QueryDef

object Text {
  def all: Seq[QueryDef] = Seq()
}
