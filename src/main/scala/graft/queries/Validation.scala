package graft.queries

import graft.QueryDef

object Validation {
  def all: Seq[QueryDef] = Seq()
}
