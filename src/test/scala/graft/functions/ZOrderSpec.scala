package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton bits interleave: unit vectors land on even/odd bit positions") {
    assert(ZOrderUtil.morton(1, 0) === 1L)
    assert(ZOrderUtil.morton(0, 1) === 2L)
    assert(ZOrderUtil.morton(3, 0) === 5L)   // 0b101
    assert(ZOrderUtil.morton(0, 3) === 10L)  // 0b1010
    assert(ZOrderUtil.morton(0xFFFFFFFFL, 0) === 0x5555555555555555L)
    assert(ZOrderUtil.morton(0, 0xFFFFFFFFL) === 0xAAAAAAAAAAAAAAAAL)
  }

  test("expression, util, and SQL-arithmetic oracle all agree") {
    val df = Seq((7L, 11L), (123456L, 654321L), (0L, 0L), (1L << 31, 1L))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        expr("graft_zorder(x, y)").as("via_expr"),
        expr(ZOrderUtil.mortonSql("x", "y")).as("via_sql"))
    df.collect().foreach { r =>
      val expected = ZOrderUtil.morton(r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === expected)
      assert(r.getLong(3) === expected)
    }
  }

  test("z-order chunks have tighter 2-d bounding boxes than linear-sorted chunks") {
    val df = Tables(spark, "/root/testdata/sf0.01", "orders")
      .select(col("o_orderkey"), col("o_custkey").cast("long").as("x"),
        floor(col("o_totalprice") / 1000).as("y"))
    def chunkArea(ordered: org.apache.spark.sql.DataFrame): Double =
      ordered
        .withColumn("chunk", ntile(16).over(Window.orderBy(col("sortkey"), col("o_orderkey"))))
        .groupBy("chunk")
        .agg(((max(col("x")) - min(col("x"))) * (max(col("y")) - min(col("y")))).as("area"))
        .agg(sum(col("area"))).head().getLong(0).toDouble
    val zArea = chunkArea(df.withColumn("sortkey", expr("graft_zorder(x, y)")))
    val linearArea = chunkArea(df.withColumn("sortkey", col("o_orderkey")))
    // insertion order correlates with neither dim: every chunk's box spans
    // ~the full plane; z-ordering must cut the total area several-fold
    assert(zArea * 2 < linearArea,
      s"z-order area $zArea not better than linear $linearArea")
  }
}
