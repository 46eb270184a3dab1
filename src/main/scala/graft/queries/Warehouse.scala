package graft.queries

import graft.QueryDef

object Warehouse {
  def all: Seq[QueryDef] = Seq()
}
