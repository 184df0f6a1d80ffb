package graft.queries

import graft.CatalogEntry

object JoinQueries {
  def entries: Seq[CatalogEntry] = Seq()
}
