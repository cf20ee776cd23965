package graft

import org.apache.spark.sql.functions._

/** Smoke: every registered query runs at sf0.001 and returns rows; entry
  * satisfies the driver's rows>0 check; oracle keys ⊆ query keys. */
class QueriesSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("oracleSql keys all exist in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned zero rows")
    }
  }

  test("q56 approximate stats track the exact answers within sketch error") {
    val d = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q56_approx_stats")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), Seq(r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val exact = Tables(spark, d, "events")
      .select(col("event_type"), col("user_id"), col("value").cast("double").as("v"))
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("nd"),
        expr("percentile(v, array(0.25, 0.5, 0.75))").as("pc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    exact.foreach { case (k, (nd, pc)) =>
      val (andv, apc) = approx(k)
      assert(math.abs(andv - nd).toDouble / nd < 0.05,
        s"$k approx distinct $andv vs exact $nd")
      pc.zip(apc).foreach { case (e, a) =>
        assert(math.abs(a - e) <= math.max(1.0, math.abs(e) * 0.05),
          s"$k percentile approx $a vs exact $e")
      }
    }
  }
}
