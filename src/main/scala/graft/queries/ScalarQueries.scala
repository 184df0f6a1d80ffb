package graft.queries

import graft.CatalogEntry

object ScalarQueries {
  def entries: Seq[CatalogEntry] = Seq()
}
