package graft.queries
import graft.engine.{QueryDef, QueryGroup}
object Windows extends QueryGroup {
  def defs: Seq[QueryDef] = Seq()
}
