package graft

/** The `spark.sql(...)` entry surface: fixture tables registered as
  * views, ANSI SQL over them, including a join + aggregate and the
  * registered native function.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql works over the registered table catalog") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val row = spark.sql(
      """SELECT r_name, COUNT(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).collect()
    assert(row.length === 5)
    assert(row.map(_.getLong(1)).sum === 25L)
  }

  test("native graft_dot is callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val d = spark.sql(
      """SELECT vec_id,
        |  graft_dot(transform(embedding, x -> cast(x as double)),
        |            transform(embedding, x -> cast(x as double))) AS norm2
        |FROM embeddings ORDER BY vec_id LIMIT 3""".stripMargin).collect()
    assert(d.length === 3)
    assert(d.forall(_.getDouble(1) > 0.0))
  }
}
