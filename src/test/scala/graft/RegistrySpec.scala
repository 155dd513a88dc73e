package graft

import graft.engine.Registry

/** Contract hygiene for the driver surface: things that would silently
  * zero a round if they regressed. */
class RegistrySpec extends SparkSpec {

  test("every oracle SQL is single-line with no raw control characters") {
    // Verify escapes control chars into the JSON, but the driver's SQL
    // runner gets the raw string — keep oracles single-line by policy
    Registry.all.flatMap(d => d.oracle.map(d.name -> _)).foreach { case (n, sql) =>
      assert(!sql.exists(_ < ' '), s"$n oracle contains a control character")
      assert(sql.trim.nonEmpty && sql.trim.toUpperCase.startsWith("SELECT")
        || sql.trim.toUpperCase.startsWith("WITH"), s"$n oracle shape")
    }
  }

  test("every operator carries a 100 TB scale note") {
    Registry.all.foreach(d =>
      assert(d.scaleNote.trim.length > 40, s"${d.name} has no real scaleNote"))
  }

  test("driver contract maps are consistent") {
    assert(SparkEntry.queries.keySet == Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // the flagship is a declared, oracled query
    assert(SparkEntry.oracleSql.contains("agg_sum_group"))
    assert(SparkEntry.entry(spark).limit(1).count() > 0)
  }

  test("no operator name collides case-insensitively (parquet dump dirs)") {
    val names = Registry.all.map(_.name.toLowerCase)
    assert(names.distinct.size == names.size)
  }
}
