package graft

/** File-level proof for `sink_versioned` (r10): the hash gates each
  * version's fingerprints; this spec measures the claim that makes
  * manifests worth having — the contrast between manifest resolution
  * and directory listing once two commits share a directory.
  */
class VersionedSinkSpec extends SparkSpec {

  test("manifest read is snapshot-closed; directory read sees the append debris") {
    val out = engine.Registry.byName("sink_versioned").build(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val (dataDir, manDir) = queries.SourceOps.versionedDirs(spark, sf)

    val v1Rows = out("v1").getLong(1)
    val v2Rows = out("v2").getLong(1)
    assert(v1Rows > 0 && v2Rows > v1Rows, "append commit added no rows")
    assert(out("v1").getLong(2) == 4L && out("v2").getLong(2) == 8L)

    // physical layout: both commits share ONE directory (8 files),
    // yet the v1 manifest closes over exactly its 4
    val dirFiles = new java.io.File(dataDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(dirFiles.length == 8, s"expected 8 data files, got ${dirFiles.length}")
    val v1Manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(manDir, "v1.txt")), "UTF-8").split("\n")
    assert(v1Manifest.length == 4)

    // THE contrast: a directory-listing reader cannot time-travel —
    // it sees v2's debris; the manifest reader gets v1 back exactly,
    // read AFTER the v2 files landed beside it
    assert(spark.read.parquet(dataDir).count() == v2Rows,
      "directory listing should see both commits")
    assert(spark.read.parquet(v1Manifest.toIndexedSeq: _*).count() == v1Rows,
      "manifest read must be closed at commit time")
  }

  test("source_version_diff: the manifest diff is exactly the append increment") {
    val (_, manDir) = queries.SourceOps.buildVersioned(spark, sf)
    val v1 = queries.SourceOps.readManifest(manDir, "v1")
    val v2 = queries.SourceOps.readManifest(manDir, "v2")
    val diff = v2.filterNot(v1.toSet)
    assert(v1.toSet.subsetOf(v2.toSet), "append must not drop v1 files")
    assert(diff.length == 4, s"expected 4 diff files, got ${diff.length}")

    // diff rows + v1 rows partition v2 exactly (no overlap, no loss)
    val v1Rows = spark.read.parquet(v1: _*).count()
    val diffRows = spark.read.parquet(diff: _*).count()
    assert(v1Rows + diffRows == spark.read.parquet(v2: _*).count())

    // and the diff IS the logical append: event_id multiples of 5
    val ids = spark.read.parquet(diff: _*)
      .select("event_id").collect().map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(_ % 5 == 0),
      "diff read must contain exactly the commit-2 rows")
  }

  test("sink_vacuum: deletes exactly the unreferenced debris, never the live table") {
    val out = engine.Registry.byName("sink_vacuum").build(spark, sf)
      .collect()
    val byPhase = out.map(r => r.getString(0) -> r).toMap
    assert(byPhase("pre").getLong(1) == 11 &&
      byPhase("pre").getLong(2) == 3,
      "pre phase must list 8 live + 3 planted orphan files")
    assert(byPhase("post").getLong(1) == 8 &&
      byPhase("post").getLong(2) == 0,
      "post phase must list exactly the manifest set")
    // live fingerprints identical across the physical delete
    Seq(3, 4, 5, 6).foreach { i =>
      assert(byPhase("pre").get(i) == byPhase("post").get(i),
        s"live-read column $i changed across vacuum")
    }
    // on disk: directory == v2 manifest exactly, manifests intact,
    // and v1 (an older retained snapshot) still fully readable
    val (dataDir, manDir) = queries.SourceOps.versionedDirs(spark, sf)
    val listed = new java.io.File(dataDir).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSet
    val v1 = queries.SourceOps.readManifest(manDir, "v1")
    val v2 = queries.SourceOps.readManifest(manDir, "v2")
    assert(listed == v2.toSet,
      "post-vacuum directory must equal the newest manifest")
    assert(spark.read.parquet(v1: _*).count() > 0,
      "older retained snapshot must survive vacuum")
  }
}
