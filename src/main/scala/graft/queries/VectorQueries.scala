package graft.queries

import graft.CatalogEntry

object VectorQueries {
  def entries: Seq[CatalogEntry] = Seq()
}
