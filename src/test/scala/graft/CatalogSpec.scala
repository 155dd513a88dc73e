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

  test("CBO join-reorder: statistics rewrite a badly-authored Q9 star join") {
    val sp = spark.newSession()
    org.apache.spark.sql.SparkSession.setActiveSession(sp)
    try {
      Seq("lineitem", "part", "supplier", "nation")
        .foreach(Catalog.analyzed(sp, sf, _))
      // deliberately bad authoring order: the selective part join LAST —
      // without stats Spark preserves it (left-deep, author order); with
      // stats + joinReorder the DP planner is free to pick a cheaper one
      val q = """SELECT n_name, count(*) AS n
                |FROM g_lineitem
                |JOIN g_supplier ON l_suppkey = s_suppkey
                |JOIN g_nation ON s_nationkey = n_nationkey
                |JOIN g_part ON l_partkey = p_partkey
                |WHERE contains(p_name, 'red')
                |GROUP BY n_name""".stripMargin
      def leafOrder(): Seq[String] = sp.sql(q).queryExecution.optimizedPlan
        .collectLeaves().map(l => "g_\\w+".r.findFirstIn(l.toString).getOrElse("?"))
      sp.conf.set("spark.sql.cbo.enabled", "false")
      val plain = leafOrder()
      val expect = sp.sql(q).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      sp.conf.set("spark.sql.cbo.enabled", "true")
      sp.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val reordered = leafOrder()
      assert(plain != reordered,
        s"statistics did not change the join order: $plain")
      // the reordered plan is still semantically the same query
      val got = sp.sql(q).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      sp.conf.set("spark.sql.cbo.enabled", "false")
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
