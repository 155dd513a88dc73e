package graft.sources.dsv2

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for Transilien-style passage XML documents —
  * the reference's ingest feed [P extract_api.py] as a first-class
  * Spark source:
  *
  * {{{
  * spark.read.format("graft.sources.dsv2.PassagesSource")
  *   .load("/path/to/xml-dir")   // one <passages> document per file
  * }}}
  *
  * Connector anatomy (the full DSv2 read path): TableProvider →
  * Table(BATCH_READ) → ScanBuilder → Scan → Batch → one InputPartition
  * PER FILE (split planning happens driver-side, parsing runs in
  * executors) → PartitionReader emitting InternalRows. XML is parsed
  * with the JDK DOM — no driver-side materialization, no Spark-function
  * round trip.
  *
  * 100 TB note: planInputPartitions is where a real feed connector
  * exposes parallelism (one partition per station shard / time slice);
  * predicate pushdown would implement SupportsPushDownFilters on the
  * ScanBuilder — documented, not needed for the demo surface.
  */
class PassagesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PassagesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PassagesTable(properties.get("path"))
}

object PassagesSource {
  val schema: StructType = StructType(Seq(
    StructField("station_id", StringType),
    StructField("num", StringType),
    StructField("miss", StringType),
    StructField("term", StringType),
    StructField("expected_ts", TimestampType),
    StructField("mode", StringType),
    StructField("etat", StringType)))

  private val FrFormat = DateTimeFormatter.ofPattern("dd/MM/yyyy HH:mm")

  /** Parse one <passages> document into rows (executor-side). */
  def parseDocument(content: String): Iterator[InternalRow] = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(content.getBytes("UTF-8")))
    val gare = doc.getDocumentElement.getAttribute("gare")
    val trains = doc.getElementsByTagName("train")
    (0 until trains.getLength).iterator.map { i =>
      val t = trains.item(i).asInstanceOf[org.w3c.dom.Element]
      def child(tag: String): Option[org.w3c.dom.Element] = {
        val ns = t.getElementsByTagName(tag)
        if (ns.getLength > 0) Some(ns.item(0).asInstanceOf[org.w3c.dom.Element]) else None
      }
      def text(tag: String): Any =
        child(tag).map(e => UTF8String.fromString(e.getTextContent)).orNull
      val dateEl = child("date")
      val mode = dateEl.map(e => UTF8String.fromString(e.getAttribute("mode"))).orNull
      val ts = dateEl.map { e =>
        val ldt = LocalDateTime.parse(e.getTextContent.trim, FrFormat)
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      }.map(Long.box).orNull
      InternalRow(
        UTF8String.fromString(gare), text("num"), text("miss"), text("term"),
        ts, mode, text("etat"))
    }
  }
}

class PassagesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"passages($path)"
  override def schema(): StructType = PassagesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PassagesScanBuilder(path)
}

class PassagesScanBuilder(path: String) extends ScanBuilder {
  override def build(): Scan = new PassagesScan(path)
}

class PassagesScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = PassagesSource.schema
  override def toBatch: Batch = this

  // driver-side split planning: one partition per document file
  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files =
      if (dir.isDirectory)
        dir.listFiles().filter(f => f.isFile && f.getName.endsWith(".xml"))
      else Array(dir)
    files.sortBy(_.getName).map(f => PassagesPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PassagesReaderFactory
}

case class PassagesPartition(file: String) extends InputPartition

class PassagesReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[PassagesPartition].file
    new PartitionReader[InternalRow] {
      private lazy val it = PassagesSource.parseDocument(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(file)), "UTF-8"))
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
