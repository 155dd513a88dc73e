package graft

import org.apache.spark.sql.functions._

/** File-level proof for `sink_compact` (r10, VERDICT task 3): the hash
  * gates content equality + the measured file counts; this spec opens
  * the directories and asserts the physical claims the audit rows
  * summarize —
  *
  *  1. the fragmented write really is small-file debris (64 files),
  *     and the compacted tree really is 4 files;
  *  2. bin-packing produced FULL files (per-file row floor — a
  *     compaction that lands 99 % of rows in one file just moved the
  *     skew), i.e. every packed file is a real row group;
  *  3. range-packing preserved clustering: per-file event_id segments
  *     are contiguous and pairwise disjoint (the property that lets a
  *     hilbert/zorder layout survive maintenance, per the scaleNote).
  */
class CompactionSinkSpec extends SparkSpec {

  private def partFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("sink_compact: 64 fragments bin-pack to 4 full, range-clustered files") {
    val out = engine.Registry.byName("sink_compact").build(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val total = out("before_compact").getLong(1)
    assert(total > 0 && out("after_compact").getLong(1) == total,
      "compaction changed the row count")
    assert(out("before_compact").getLong(2) == 64L)
    assert(out("after_compact").getLong(2) == 4L)

    val (fragDir, compDir) = queries.SourceOps.compactDirs(spark, sf)
    assert(partFiles(fragDir).length == 64)
    val compFiles = partFiles(compDir)
    assert(compFiles.length == 4)

    // per-file row floor: 4-way range packing of a uniform id space
    // must land every file within 2× of the fair share
    val perFile = spark.read.parquet(compDir)
      .groupBy(col("_metadata.file_path")).count()
      .collect().map(_.getLong(1))
    assert(perFile.length == 4)
    assert(perFile.min >= total / 8,
      s"smallest packed file has ${perFile.min} of $total rows — skewed packing")

    // clustering preserved: sorted per-file event_id segments must not
    // interleave (LayoutSinkSpec's disjoint-segment discipline)
    val spans = compFiles.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("event_id"), max("event_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, "compacted file id segments interleave")
      case _ =>
    }
  }
}
