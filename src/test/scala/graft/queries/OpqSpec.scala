package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Learned-rotation OPQ ([[VectorOps.trainOpqRotation]] /
  * [[VectorOps.trainOpq]]) — the parametric rung above the oracled
  * permutation arm (q240/q241 keep the SQL-restatable permutation; this
  * spec owns the learned rotation, the q52 seed-vs-trained discipline):
  *
  *  1. ORTHOGONALITY — R is a full d×d orthonormal basis (RRᵀ = I), so
  *     rotation preserves dots (⟨Rx, Ry⟩ = ⟨x, y⟩) and ADC scores in the
  *     rotated space estimate the SAME cosines.
  *  2. MASS CONSERVATION — Rayleigh eigenvalues sum to trace(Σ ueueᵀ)
  *     = n for unit vectors, and lead with the dominant direction.
  *  3. ALLOCATION — eigenvalue allocation partitions the d rotated
  *     coordinates into m subspaces with the permutation arm's sizes.
  *  4. DISTORTION — under the SAME Lloyd budget, the learned rotation's
  *     quantization error ≤ the variance-balanced permutation's (the
  *     whole point of OPQ: a permutation IS one of the orthogonal
  *     matrices the learned arm optimizes over).
  *  5. DROP-IN ADC — [[VectorOps.adcTop3]] runs unchanged on the rotated
  *     frame: full top-3 per query, scores in [−1, 1].
  *  6. DETERMINISM — two trainings are bit-identical (fixed-point
  *     matvecs, V₀ = I, no RNG).
  */
class OpqSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val (rot, lams, dims, cb) =
    VectorOps.trainOpq(spark, d, rotIters = 4, lloydIters = 1)

  test("rotation is orthonormal and preserves dot products") {
    val dim = rot.size
    assert(dim > 0)
    rot.foreach(r => assert(r.size === dim))
    for (i <- 0 until dim; j <- i until dim) {
      val dot = rot(i).zip(rot(j)).foldLeft(0e0)((a, p) => a + p._1 * p._2)
      val expect = if (i == j) 1e0 else 0e0
      assert(math.abs(dot - expect) < 1e-9, s"RRᵀ[$i][$j] = $dot")
    }
    // Dot preservation, measured through the actual rotation code path.
    val u = VectorOps.unitVectors(spark, d)
      .select(col("vec_id"), col("ue")).filter(col("vec_id") < 8)
    val plain = u.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val rotated = VectorOps.opqRotate(u, rot)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    for (a <- plain.keys; b <- plain.keys if a < b) {
      val d0 = plain(a).zip(plain(b)).foldLeft(0e0)((s, p) => s + p._1 * p._2)
      val d1 = rotated(a).zip(rotated(b)).foldLeft(0e0)((s, p) => s + p._1 * p._2)
      assert(math.abs(d0 - d1) < 1e-6, s"⟨$a,$b⟩ drifted: $d0 vs $d1")
    }
  }

  test("eigenvalues conserve mass and the allocation is a balanced partition") {
    val n = VectorOps.unitVectors(spark, d).count().toDouble
    val tot = lams.sum
    assert(math.abs(tot - n) < 1e-3 * n,
      s"Σλ = $tot must equal trace = n = $n for unit vectors")
    assert(lams.max === lams.head || lams.head > 0.9 * lams.max,
      "subspace iteration must lead with (near-)dominant direction")
    // Allocation: a partition of 0..d−1 with the permutation arm's sizes.
    assert(dims.flatten.sorted === (0 until rot.size).toList)
    val permSizes = (0 until rot.size).groupBy(_ % dims.size)
      .map { case (j, g) => j -> g.size }
    dims.zipWithIndex.foreach { case (dj, j) =>
      assert(dj.size === permSizes(j), s"subspace $j capacity")
    }
  }

  test("learned rotation beats the permutation arm at equal Lloyd budget") {
    val u = VectorOps.unitVectors(spark, d).select(col("vec_id"), col("ue"))
    val (permDims, _) = VectorOps.pqArtifacts(spark, d)
    val permCb = VectorOps.trainPqCodebooks(spark, d, 1)
    val permErr = VectorOps.frameDistortion(u, permDims, permCb)
    val rotated = VectorOps.opqRotate(u, rot)
    val opqErr = VectorOps.frameDistortion(rotated, dims, cb)
    assert(opqErr <= permErr + 1e-9,
      s"OPQ distortion $opqErr must not exceed permutation arm $permErr")
  }

  test("rotated books drop into the ADC search unchanged") {
    val rotated = VectorOps.opqRotate(
      VectorOps.unitVectors(spark, d).select(col("vec_id"), col("ue")), rot)
      .localCheckpoint(true)
    val res = VectorOps.adcTop3(rotated, dims, cb)
      .orderBy("query_id", "rnk", "neighbor_id").collect()
    val byQuery = res.groupBy(_.getLong(0))
    assert(byQuery.size === 8, "one group per query vector")
    byQuery.values.foreach(rows => assert(rows.length >= 3))
    res.foreach { r =>
      val cos = r.getDouble(2)
      assert(cos >= -1.0 - 1e-6 && cos <= 1.0 + 1e-6,
        s"ADC approx cosine out of range: $r")
    }
  }

  test("training is deterministic") {
    val (rot2, lams2) = VectorOps.trainOpqRotation(spark, d, iters = 4)
    assert(rot2 === rot)
    assert(lams2 === lams)
  }
}
