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

  test("ensureExternalBucketed: fingerprint hit RE-REGISTERS the " +
    "persisted location without rewriting (fresh-JVM simulation); " +
    "fingerprint change rewrites; re-registered table keeps the " +
    "zero-exchange bucketed shape") {
    val dir = "/root/testdata/sf0.001"
    val base = "/tmp/graft_bucketing_spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    spark.sql("DROP TABLE IF EXISTS ext_orders_b")
    def ensure(fp: String): Unit =
      Bucketing.ensureExternalBucketed(spark,
        Tables.orders(spark, dir), "ext_orders_b", "o_custkey", 4,
        s"$base/ext_orders_b", fp)
    ensure("v1")
    val rows = spark.table("ext_orders_b").count()
    val marker = new java.io.File(base, "_ext_orders_b_FP")
    assert(marker.exists())
    val wroteAt = marker.lastModified()
    // fresh JVM simulation: the in-memory catalog forgets the name,
    // the data and marker stay on disk
    spark.sql("DROP TABLE ext_orders_b")
    Thread.sleep(5)
    ensure("v1")
    assert(marker.lastModified() == wroteAt,
      "fingerprint hit must not rewrite the data")
    assert(spark.table("ext_orders_b").count() == rows)
    // the DDL-registered table is still a real bucketed table: the
    // bucket-key aggregate plans with zero Exchange
    val agg = spark.table("ext_orders_b").groupBy(col("o_custkey"))
      .agg(count(lit(1)))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
      "re-registered bucketed table lost its bucketing metadata")
    // changed fingerprint → rewrite (marker refreshed)
    ensure("v2")
    assert(java.nio.file.Files.readString(marker.toPath)
      .startsWith("v2;"))
    assert(spark.table("ext_orders_b").count() == rows)
    spark.sql("DROP TABLE IF EXISTS ext_orders_b")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
