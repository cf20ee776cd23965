package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange; plain tables shuffle") {
    // managed tables land in the session's default warehouse dir; dropped below
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val lineitem = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    // Plain join shuffles both sides (disable broadcast to expose it).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = orders.join(lineitem, "o_orderkey")
      assert(Bucketing.hasShuffle(plain), "plain join should shuffle")

      Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
      Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 4)
      val co = Bucketing.cooperativeJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      assert(!Bucketing.hasShuffle(co), s"bucketed join should not shuffle:\n${co.queryExecution.executedPlan}")
      // same results either way
      assert(co.count() === plain.count())

      // bucketed aggregation on the bucket key is also exchange-free
      val agg = spark.table("lineitem_b").groupBy("o_orderkey")
        .agg(sum("l_quantity").as("q"))
      assert(!Bucketing.hasShuffle(agg), "bucketed groupBy should not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
