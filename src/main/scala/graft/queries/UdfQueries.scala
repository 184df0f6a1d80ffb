package graft.queries

import graft.CatalogEntry

object UdfQueries {
  def entries: Seq[CatalogEntry] = Seq()
}
