package graft.queries

import graft.CatalogEntry

object SetSortQueries {
  def entries: Seq[CatalogEntry] = Seq()
}
