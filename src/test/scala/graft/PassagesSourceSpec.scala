package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class PassagesSourceSpec extends SparkSpec {

  private val xml1 =
    """<passages gare="87393009"><train><date mode="R">20/05/2017 12:09</date><num>135140</num><miss>POPI</miss><term>87384008</term></train></passages>"""
  private val xml2 =
    """<passages gare="87384008"><train><date mode="T">20/05/2017 12:14</date><num>134683</num><miss>PEBU</miss><term>87384008</term><etat>Retardé</etat></train><train><date mode="R">20/05/2017 12:20</date><num>165109</num><miss>POPI</miss><term>87393009</term></train></passages>"""

  private def writeDir(): String = {
    val dir = Files.createTempDirectory("dsv2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.xml"), xml1)
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.xml"), xml2)
    dir
  }

  test("DSv2 connector reads passage XML with one partition per file") {
    val dir = writeDir()
    val df = spark.read.format("graft.sources.dsv2.PassagesSource").load(dir)
    assert(df.schema.fieldNames.toSeq ==
      Seq("station_id", "num", "miss", "term", "expected_ts", "mode", "etat"))
    val rows = df.orderBy("num").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(1)).toSeq == Seq("134683", "135140", "165109"))
    assert(rows(0).getString(5) == "T" && rows(0).getString(6) == "Retardé")
    assert(rows(1).getTimestamp(4).toString.startsWith("2017-05-20 12:09"))
    assert(rows(1).isNullAt(6)) // on-time: no etat element
    assert(df.rdd.getNumPartitions == 2, "split planning: one partition per file")
  }

  test("connector output feeds the domain matcher like any DataFrame") {
    val dir = writeDir()
    val p = spark.read.format("graft.sources.dsv2.PassagesSource").load(dir)
      .withColumn("request_day", lit("2017-05-20"))
      .withColumn("request_time", lit("12:00"))
      .withColumn("day_train_num", concat(lit("20170520_"), col("num")))
    // latest-state upsert over the connector's rows
    val state = graft.domain.Transit.lastPassageState(p)
    assert(state.count() == 3)
    val filters = p.filter(col("mode") === "R")
    assert(filters.count() == 2)
  }
}
