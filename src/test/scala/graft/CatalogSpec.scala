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
}
