package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Assembles every declared operator (SURVEY.md §2) into the driver
  * contract maps consumed by [[graft.SparkEntry]]. */
object Registry {

  private def groups: Seq[QueryGroup] = Seq(
    ScanFilterProject,
    Joins,
    Aggregates,
    Windows,
    SortSetScalar,
    TimeSeriesDedup,
    TextVector,
    NearDup,
    SimHash,
    Multimodal,
    AnnIvf,
    AnnKmeans,
    AnnPq,
    CorpusOps,
    SpanOps,
    PipelineOps,
    Analytics,
    GraphOps,
    SourceOps,
    TransitOps,
    UrlOps,
    PathOps,
    VecStats,
    QualityOps,
    SqlSurface)

  lazy val all: Seq[QueryDef] = {
    val ds = groups.flatMap(_.defs)
    val dup = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    ds
  }

  lazy val byName: Map[String, QueryDef] = all.map(d => d.name -> d).toMap

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.build).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
