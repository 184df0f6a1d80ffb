package graft.queries

import graft.CatalogEntry

object WindowQueries {
  def entries: Seq[CatalogEntry] = Seq()
}
