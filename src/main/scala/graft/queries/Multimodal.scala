package graft.queries

import graft.QueryDef

object Multimodal {
  def all: Seq[QueryDef] = Seq()
}
