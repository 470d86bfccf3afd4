package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

class BucketingSpec extends SparkSuite {

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10m")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-bucketed tables join and aggregate with ZERO exchange; the " +
    "unbucketed join of the same data shuffles both sides") {
    val dir = "/root/testdata/sf0.001"
    val customer = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    // the in-memory catalog is fresh per JVM but table DIRECTORIES
    // survive in spark-warehouse/ — clear both or the create fails with
    // LOCATION_ALREADY_EXISTS on re-runs
    Seq("b_customer", "b_orders").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    Bucketing.writeBucketed(customer, "b_customer", "c_custkey", 4)
    Bucketing.writeBucketed(
      orders.withColumnRenamed("o_custkey", "c_custkey"),
      "b_orders", "c_custkey", 4)

    withNoBroadcast {
      val bucketed = Bucketing.cobucketedJoin(spark, "b_customer",
        "b_orders", "c_custkey")
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$bucketedPlan")

      val unbucketed = customer.join(
        orders.withColumnRenamed("o_custkey", "c_custkey"), Seq("c_custkey"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange"))

      // same rows either way
      assert(bucketed.count() == unbucketed.count())

      // groupBy on the bucket key is exchange-free too
      val agg = spark.table("b_orders").groupBy(col("c_custkey"))
        .agg(count(lit(1)))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    }
  }
}
