package graft.queries
import graft.engine.{QueryDef, QueryGroup}
object TextVector extends QueryGroup {
  def defs: Seq[QueryDef] = Seq()
}
