package graft.queries

import graft.CatalogEntry

object SubqueryQueries {
  def entries: Seq[CatalogEntry] = Seq()
}
