package graft.queries

import graft.CatalogEntry

object ScanQueries {
  def entries: Seq[CatalogEntry] = Seq()
}
