package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q106 edges its corpus oracle can't isolate: the portable ln's
  * accuracy against the JVM libm (it is a deliberate REPLACEMENT for
  * Math.log, so closeness is an assertion, not a given) and the
  * partitioning-invariance of the ordered per-doc fold. */
class LmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("portable ln tracks Math.log within 4 ulps across count magnitudes") {
    val xs = (Seq(1L, 2L, 3L, 7L, 10L, 63L, 64L, 65L, 999L, 50021L) ++
      (1 to 50).map(i => i * 104729L + 17L)).toDF("x")
    val steps = LmOps.PortableLn.steps("x", "p", spark = true)
    val got = steps.foldLeft(xs)((df, s) => df.withColumn(s._1, expr(s._2)))
      .select(col("x"), col("lnp")).collect()
    got.foreach { r =>
      val x = r.getLong(0); val approx = r.getDouble(1)
      val exact = math.log(x.toDouble)
      val ulp = math.ulp(exact).max(java.lang.Double.MIN_VALUE)
      assert(math.abs(approx - exact) <= 4 * ulp,
        s"ln($x): portable=$approx jvm=$exact diff=${approx - exact}")
    }
  }

  test("q106 scores are identical under different shuffle partition counts") {
    val dir = java.nio.file.Files.createTempDirectory("lmops").toString
    val docs = Seq(
      (1L, "the cat sat on the mat", "s"),
      (2L, "the cat sat on the hat", "s"),
      (3L, "zq xv qj wk zz yy", "s"),
      (4L, "the the the the", "s"))
      .map { case (id, tx, src) => (id, tx, "en", src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val run1 = LmOps.queries("q106_lm_perplexity")(spark, dir).collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val run2 = LmOps.queries("q106_lm_perplexity")(spark, dir).collect().toSeq
      assert(run1.map(_.toSeq) === run2.map(_.toSeq))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // the gibberish doc is the flagged tail on this fixture
    val flagged = run1.filter(_.getBoolean(4)).map(_.getLong(0))
    assert(flagged === Seq(3L))
  }
}
