package graft.queries

import graft.CatalogEntry

object EtlQueries {
  def entries: Seq[CatalogEntry] = Seq()
}
