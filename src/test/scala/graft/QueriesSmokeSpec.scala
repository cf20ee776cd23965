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

  test("no oracle SQL is null or empty (module registry val-ordering trap)") {
    // A `val all` that references an oracle `val` declared BELOW it reads
    // null at object init (bit q128 and q133); Some(null) survives the
    // registry flatMap and NPEs only in Verify's JSON dump.
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(v != null && v.trim.nonEmpty, s"null/empty oracle for $k")
    }
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

  test("q132 overlap-matrix invariants: bounds, diagonal, marginal consistency") {
    val rows = SparkEntry.queries("q132_gate_overlap")(spark, sfDir).collect()
    assert(rows.length === 15)
    val m = rows.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val marg = m.collect { case ((a, b), v) if a == b => a -> v._1 }
    assert(marg.size === 5)
    m.foreach { case ((a, b), (fa, fb, both)) =>
      assert(both <= math.min(fa, fb), s"($a,$b) intersection bound")
      assert(fa === marg(a) && fb === marg(b), s"($a,$b) marginals consistent")
      if (a == b) assert(both === fa, s"($a,$b) diagonal")
    }
  }

  test("q56 approximate stats track the exact answers within sketch error") {
    val d = "/root/testdata/sf0.01"
    // The tolerance booleans ARE the sketch-vs-exact comparison (and what
    // the DuckDB oracle pins as literal TRUE) — assert them all, plus the
    // exact columns against an independent aggregation.
    val rows = SparkEntry.queries("q56_approx_stats")(spark, d).collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_tol"), s"${r.getString(0)}: HLL out of tolerance")
      assert(r.getAs[Boolean]("p50_within_tol"), s"${r.getString(0)}: p50 out of rank band")
      assert(r.getAs[Boolean]("pcts_monotone"), s"${r.getString(0)}: quartiles not monotone")
    }
    val got = rows.map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val exact = Tables(spark, d, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }
}
