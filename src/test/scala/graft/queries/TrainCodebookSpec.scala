package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IVF coarse-quantizer trainer (VectorOps.trainCodebook): Lloyd's
  * spherical k-means with decimal-exact per-cell means. The properties a
  * production trainer must hold, asserted on the real sf0.001 corpus. */
class TrainCodebookSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Unit vectors rebuilt independently of VectorOps' private helper. */
  private def unit: DataFrame =
    Tables(spark, d, "embeddings")
      .withColumn("nrm", expr("graft_l2norm(cast(embedding as array<double>))"))
      .select(expr("transform(embedding, x -> cast(x as double) / nrm)").as("ue"))

  /** Mean over the corpus of each vector's best cosine against `cb` —
    * the spherical k-means objective. */
  private def meanBestCos(cb: Seq[Seq[Double]]): Double = {
    val scores = transform(typedlit(cb), c => call_function("graft_dot", col("ue"), c))
    unit.select(aggregate(scores, lit(Double.MinValue), (a, x) => greatest(a, x)).as("best"))
      .agg(avg("best")).head().getDouble(0)
  }

  test("deterministic: identical codebooks bit-for-bit across reruns") {
    val a = VectorOps.trainCodebook(spark, d, k = 8, iters = 2)
    val b = VectorOps.trainCodebook(spark, d, k = 8, iters = 2)
    assert(a === b, "decimal-exact means must make training order-independent")
  }

  test("training improves the spherical k-means objective over the seed codebook") {
    val seed = VectorOps.trainCodebook(spark, d, k = 8, iters = 0)
    val trained = VectorOps.trainCodebook(spark, d, k = 8, iters = 2)
    val (s0, s2) = (meanBestCos(seed), meanBestCos(trained))
    assert(s2 >= s0, f"objective regressed: seed $s0%.6f -> trained $s2%.6f")
    // on this corpus the improvement is real, not a tie
    assert(s2 > s0 + 1e-4, f"training made no progress: $s0%.6f -> $s2%.6f")
  }

  test("codebook shape: k unit-norm centroids") {
    val cb = VectorOps.trainCodebook(spark, d, k = 8, iters = 1)
    assert(cb.size === 8)
    cb.foreach { c =>
      val nrm = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
      assert(math.abs(nrm - 1.0) < 1e-9, s"centroid not unit-norm: $nrm")
    }
  }
}
