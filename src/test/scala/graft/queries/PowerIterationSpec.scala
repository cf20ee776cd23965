package graft.queries

import graft.SparkSpec

/** [[VectorOps.powerCard]] — the q221 power-iteration PCA trainer. The
  * DuckDB oracle gates bit-parity; this spec gates the LINEAR-ALGEBRA
  * properties against an independent dense driver-side mirror (plain
  * doubles, no dyadic accumulation — so agreement is numerical, not
  * definitional). */
class PowerIterationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val card = VectorOps.powerCard(spark, sf, 3)

  private def vOf(it: Int): Seq[Double] =
    card.filter(_._1 == it).sortBy(_._2).map(_._3)
  private def lamOf(it: Int): Double =
    card.find(_._1 == it).get._4

  test("every iterate is unit norm") {
    (1 to 3).foreach { it =>
      val n = math.sqrt(vOf(it).map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-12, s"iter $it norm $n")
    }
  }

  test("Rayleigh value is non-decreasing (PSD power iteration)") {
    assert(lamOf(2) >= lamOf(1) && lamOf(3) >= lamOf(2))
    assert(lamOf(3) > 0.0)
  }

  test("matches an independent dense mirror to numerical tolerance") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("transform(embedding, v -> cast(v as double)) as x")
      .collect().map(_.getSeq[Double](0).toArray)
    val n = rows.length
    val d = rows.head.length
    val mu = Array.tabulate(d)(j => rows.map(_(j)).sum / n)
    val cx = rows.map(r => Array.tabulate(d)(j => r(j) - mu(j)))
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lam = 0.0
    for (_ <- 1 to 3) {
      val y = Array.fill(d)(0.0)
      cx.foreach { r =>
        val s = r.zip(v).map(p => p._1 * p._2).sum
        (0 until d).foreach(j => y(j) += r(j) * s)
      }
      lam = v.zip(y).map(p => p._1 * p._2).sum
      val nrm = math.sqrt(y.map(e => e * e).sum)
      v = y.map(_ / nrm)
    }
    // 2^-26 dyadic quantization × ~500 rows ⇒ relative drift ~1e-6 is
    // expected (measured 1.4e-6); the oracle gates exactness, this gates
    // that the dyadic path tracks true linear algebra.
    assert(math.abs(lam - lamOf(3)) / lam < 1e-5,
      s"mirror lam $lam vs engine ${lamOf(3)}")
    val cos = v.zip(vOf(3)).map(p => p._1 * p._2).sum
    assert(math.abs(cos) > 1.0 - 1e-9, s"direction cosine $cos")
  }

  test("deterministic across reruns") {
    assert(VectorOps.powerCard(spark, sf, 3) === card)
  }
}
