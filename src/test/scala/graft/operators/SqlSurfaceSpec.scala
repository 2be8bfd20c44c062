package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** SQL surface (temp views + spark.sql) and plan-shape assertions for the
  * round-2 operator reshapes.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("registerAll makes every driver table SQL-queryable") {
    Tables.registerAll(spark, sf001)
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      assert(spark.sql(s"SELECT COUNT(*) AS n FROM $t").head().getLong(0) > 0, t)
    }
  }

  test("SQL window query matches its DataFrame twin") {
    Tables.registerAll(spark, sf001)
    val viaSql = graft.SparkEntry.queries("q58_sql_window")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaDf = Tables.orders(spark, sf001)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
      .collect().map(_.toSeq).toSeq
    assert(viaSql == viaDf)
  }

  test("as-of join plan is one window over a union — no join, no fanout") {
    val plan = graft.SparkEntry.queries("q24_asof_join")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(500))
    assert(!plan.toLowerCase.contains("join"),
      s"as-of must not materialize clicks×purchases: ${plan.take(500)}")
  }

  test("LSH bucket assignment is deterministic across runs") {
    val a = graft.SparkEntry.queries("q41c_lsh_buckets")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    val b = graft.SparkEntry.queries("q41c_lsh_buckets")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }
}
