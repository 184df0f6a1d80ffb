package graft.queries

import graft.CatalogEntry

object TextQueries {
  def entries: Seq[CatalogEntry] = Seq()
}
