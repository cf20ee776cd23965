package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The PQ production trainer ([[VectorOps.trainPqCodebooks]]) beside the
  * oracled seed-codebook queries q240/q241 — the trainCodebook/q52
  * discipline applied to product quantization:
  *
  *  1. MONOTONE DISTORTION — Lloyd never increases the corpus-mean
  *     quantization error: seed ≥ 1 iter ≥ 2 iters (dyadic-mean slack
  *     only).
  *  2. DETERMINISM — two trainings produce bit-identical books (the
  *     fixed-point means are partitioning-independent).
  *  3. DROP-IN SEARCH — the refined books drive the SAME ADC search
  *     (pqTop3 override): full top-3 per query, scores in [−1, 1], and
  *     the search equals itself re-run (no hidden state).
  *  4. SHAPE — m books of ksub centroids whose sub-dimensions match the
  *     variance-balanced permutation's sub-lists.
  */
class PqSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("Lloyd refinement is monotone in distortion and deterministic") {
    val (dims, seed) = VectorOps.pqArtifacts(spark, d)
    val d0 = VectorOps.pqDistortion(spark, d, seed)
    val cb1 = VectorOps.trainPqCodebooks(spark, d, 1)
    val cb2 = VectorOps.trainPqCodebooks(spark, d, 2)
    val d1 = VectorOps.pqDistortion(spark, d, cb1)
    val d2 = VectorOps.pqDistortion(spark, d, cb2)
    assert(d1 <= d0 + 1e-9, s"iteration 1 must not increase distortion: $d0 -> $d1")
    assert(d2 <= d1 + 1e-9, s"iteration 2 must not increase distortion: $d1 -> $d2")
    assert(d1 < d0, "on this corpus one Lloyd round must strictly improve the seeds")
    // Bit-identical rerun (fixed-point means, no RNG anywhere).
    assert(VectorOps.trainPqCodebooks(spark, d, 2) === cb2)
    // Shape: m books of ksub centroids over the permutation's sub-dims.
    assert(cb2.length === dims.length)
    cb2.zip(dims).foreach { case (book, dj) =>
      assert(book.length === seed.head.length)
      book.foreach(c => assert(c.length === dj.length))
    }
  }

  test("trained books drop into the ADC search unchanged") {
    val cb = VectorOps.trainPqCodebooks(spark, d, 2)
    val res = VectorOps.pqTop3(spark, d, Some(cb))
      .orderBy("query_id", "rnk", "neighbor_id")
      .collect()
    val byQuery = res.groupBy(_.getLong(0))
    assert(byQuery.size === 8, "one group per query vector")
    byQuery.values.foreach(rows => assert(rows.length >= 3))
    res.foreach { r =>
      val cos = r.getDouble(2)
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9,
        s"ADC approx cosine out of range: $r")
    }
    // Stable: the same search re-run returns the same rows.
    assert(VectorOps.pqTop3(spark, d, Some(cb))
      .orderBy("query_id", "rnk", "neighbor_id")
      .collect().map(_.toSeq).toSeq === res.map(_.toSeq).toSeq)
  }
}
