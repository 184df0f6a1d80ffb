package graft.queries

import graft.CatalogEntry

object StreamQueries {
  def entries: Seq[CatalogEntry] = Seq()
}
