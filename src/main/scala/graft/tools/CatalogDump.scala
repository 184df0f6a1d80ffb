package graft.tools

import graft.Catalog

/** Machine-readable catalog dump (VERDICT r17 #4): one JSON line per
  * entry with its oracle status, scale-path twin, and banded-pairing
  * marker, so harness exemption lists (CoverageSweep's documented-twin
  * set, the canary's banded inventory) are DERIVED from the catalog
  * instead of hand-maintained. No SparkSession needed — pure metadata.
  *
  * Usage: runMain graft.tools.CatalogDump [outPath]
  */
object CatalogDump {
  def render(): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val rows = graft.Catalog.stamped.sortBy(_.key).map { e =>
      val sp = e.scalePath.map(t => s""""${esc(t)}"""").getOrElse("null")
      s"""  "${esc(e.key)}": {"oracle": ${e.duckdbSql.isDefined}, """ +
        s""""scalePath": $sp, "banded": ${e.banded}}"""
    }
    rows.mkString("{\n", ",\n", "\n}\n")
  }

  def main(args: Array[String]): Unit = {
    val out = render()
    args.headOption match {
      case Some(path) =>
        java.nio.file.Files.write(java.nio.file.Paths.get(path),
          out.getBytes("UTF-8"))
        println(s"[catalog] ${Catalog.stamped.size} entries -> $path " +
          s"(${Catalog.scalePaths.size} scale-path routes, " +
          s"${Catalog.bandedKeys.size} banded)")
      case None => print(out)
    }
  }
}
