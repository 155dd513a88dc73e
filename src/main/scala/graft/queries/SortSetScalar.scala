package graft.queries
import graft.engine.{QueryDef, QueryGroup}
object SortSetScalar extends QueryGroup {
  def defs: Seq[QueryDef] = Seq()
}
