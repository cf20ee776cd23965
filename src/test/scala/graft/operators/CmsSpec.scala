package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.SketchUtil
import org.apache.spark.sql.functions._

/** CmsAgg: Count-Min invariants that must hold deterministically with the
  * fixed portable hash family — never an underestimate, partitioning
  * invariance (mergeable state), and estimate ≡ brute-force cells. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val toks = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select(explode(split(col("text"), " ")).as("tok"))
    .withColumn("hm", expr("graft_h60(tok)"))

  test("estimates never underestimate, for EVERY token in the corpus") {
    val cms = toks.agg(CmsAgg(col("hm")).as("cms"))
    val bad = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      .withColumn("hm", expr("graft_h60(tok)"))
      .crossJoin(broadcast(cms))
      .withColumn("est", CmsAgg.estimate(col("cms"), col("hm")))
      .filter(col("est") < col("exact"))
    assert(bad.count() === 0, "CMS underestimated at least one token")
  }

  test("sketch is partitioning-invariant (merge associativity)") {
    val one = toks.coalesce(1).agg(CmsAgg(col("hm")).as("cms"))
      .head().getSeq[Long](0)
    val many = toks.repartition(17).agg(CmsAgg(col("hm")).as("cms"))
      .head().getSeq[Long](0)
    assert(one === many)
  }

  test("estimate lookup equals the brute-force cell computation") {
    val cms = toks.agg(CmsAgg(col("hm")).as("cms")).head().getSeq[Long](0)
    val P = SketchUtil.MinhashP
    val sample = toks.select("tok", "hm").distinct().limit(50)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val viaCol = toks.select("tok", "hm").distinct().limit(50)
      .crossJoin(broadcast(toks.agg(CmsAgg(col("hm")).as("cms"))))
      .withColumn("est", CmsAgg.estimate(col("cms"), col("hm")))
      .collect().map(r => r.getString(0) -> r.getLong(r.fieldIndex("est"))).toMap
    sample.foreach { case (tok, hm) =>
      val manual = (0 until 4).map { p =>
        val cell = ((SketchUtil.laneA(p) * (hm % P) + SketchUtil.laneB(p)) % P % 1024).toInt
        cms(p * 1024 + cell)
      }.min
      assert(viaCol(tok) === manual, s"estimate mismatch for '$tok'")
    }
  }

  test("error stays within the classic eps*N bound on the real corpus") {
    // With width 1024, eps = e/1024 ≈ 0.0027; the guarantee is
    // probabilistic over hash draws, but for THIS fixed family and corpus
    // it is deterministic — pin it as a regression bound.
    val n = toks.count()
    val cms = toks.agg(CmsAgg(col("hm")).as("cms"))
    val worst = toks.groupBy("tok").agg(count(lit(1)).as("exact"))
      .withColumn("hm", expr("graft_h60(tok)"))
      .crossJoin(broadcast(cms))
      .withColumn("err", CmsAgg.estimate(col("cms"), col("hm")) - col("exact"))
      .agg(max("err")).head().getLong(0)
    assert(worst <= (0.003 * n).toLong + 1,
      s"max overestimate $worst exceeds eps*N for N=$n")
  }
}
