package graft
import java.nio.file.{Files, Paths}
object GenScale {
  def main(args: Array[String]): Unit = {
    val sb = new StringBuilder
    sb.append("# SCALE — 100 TB design notes per operator\n\n")
    sb.append("Generated from `QueryDef.scaleNote` (source of truth lives next to each\n")
    sb.append("operator). Regenerate with `sbt \"runMain graft.GenScale\"`.\n\n")
    sb.append("| operator | oracle | 100 TB design |\n|---|---|---|\n")
    graft.engine.Registry.all.sortBy(_.name).foreach { d =>
      val o = if (d.oracle.isDefined) "duckdb" else "tests"
      sb.append(s"| `${d.name}` | $o | ${d.scaleNote} |\n")
    }
    sb.append("""
## Catalog statistics and cost-based planning

`Catalog.analyzed` (ANALYZE ... FOR ALL COLUMNS at ingest) feeds the
CBO row-count + NDV/min/max stats. Measured effect (CatalogSpec):
with `spark.sql.cbo.enabled` + `joinReorder.enabled` and analyzed
tables, the Q9 star join authored worst-first (`lineitem ⋈ supplier ⋈
nation ⋈ part`) is re-planned to join the filtered `part` side first
(`lineitem ⋈ part ⋈ supplier ⋈ nation`) — the stats-driven reorder
that matters at 100 TB, where a wrong first join shuffles the fact
table against an unfiltered dimension. Stats also flip post-filter
small sides to broadcast without hints. Temp views cannot carry
stats, so at scale ANALYZE belongs in the ingest path, exactly where
`Catalog.analyzed` runs it.
""")
    Files.writeString(Paths.get("SCALE.md"), sb.toString)
    println(s"wrote SCALE.md (${graft.engine.Registry.all.size} operators)")
  }
}
