package graft.queries
import graft.engine.{QueryDef, QueryGroup}
object TimeSeriesDedup extends QueryGroup {
  def defs: Seq[QueryDef] = Seq()
}
