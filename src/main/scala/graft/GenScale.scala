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
    Files.writeString(Paths.get("SCALE.md"), sb.toString)
    println(s"wrote SCALE.md (${graft.engine.Registry.all.size} operators)")
  }
}
