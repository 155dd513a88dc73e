package graft

import graft.engine.Catalog

class CatalogSpec extends SparkSpec {

  test("register exposes every table and function to plain SQL") {
    Catalog.register(spark, sf)
    // a representative cross-surface SQL query: tables + custom UDAF +
    // custom codegen function in one statement
    val r = spark.sql(
      """SELECT count(*) AS n_orders,
        |       (SELECT count(*) FROM events) AS n_events,
        |       (SELECT geometric_mean(CAST(l_quantity AS DOUBLE)) FROM lineitem) AS gm,
        |       long_array_dot(array(2L, 3L), array(4L, 5L)) AS dot
        |FROM orders""".stripMargin).head()
    assert(r.getLong(0) == 1500L)
    assert(r.getLong(1) == 1000L)
    assert(r.getDouble(2) > 0)
    assert(r.getLong(3) == 23L)
    Catalog.register(spark, sf) // idempotent
  }

  test("analyzed tables carry CBO statistics that reach the optimizer") {
    val sp = spark.newSession()
    sp.conf.set("spark.sql.cbo.enabled", "true")
    // stats visibility reads SQLConf.get from the thread-ACTIVE
    // session — newSession() alone leaves the parent active
    org.apache.spark.sql.SparkSession.setActiveSession(sp)
    try {
    val orders = Catalog.analyzed(sp, sf, "orders")
    val customer = Catalog.analyzed(sp, sf, "customer")
    // row-count statistics propagate into the optimized plan
    val stats = sp.table(orders).queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(1500)), s"rowCount=${stats.rowCount}")
    // per-column stats (NDV/min/max) exist for the join key
    assert(stats.attributeStats.exists { case (a, s) =>
      a.name == "o_custkey" && s.distinctCount.isDefined
    }, s"no column stats: ${stats.attributeStats.keys.map(_.name)}")
    // with stats present, the small side broadcasts WITHOUT a hint —
    // the stats-driven planning that matters when file sizes alone
    // mislead (e.g. post-filter cardinality at 100 TB)
    val j = sp.table(orders).join(sp.table(customer), sp.table(orders)("o_custkey") === sp.table(customer)("c_custkey"))
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }
}
