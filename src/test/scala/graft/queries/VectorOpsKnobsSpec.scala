package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The ANN granularity knobs (VERDICT r7 item 1): LSH bit-count and IVF
  * codebook size are DERIVED from corpus size, with the oracle-scale
  * corpora (n = 500 at sf0.001/sf0.01) pinned to exactly the 8 bits /
  * k = 16 the DuckDB oracle SQL spells out — so q33/q40/q52 stay
  * hash-exact while the same code picks sane granularity at 10⁹ vectors.
  * Pure formulas, no SparkSession needed. */
class VectorOpsKnobsSpec extends AnyFunSuite {

  test("oracle-scale fixed points: the derived knobs equal the oracle constants") {
    assert(VectorOps.lshBitsFor(500L) === 8)  // = range(0, 8) in q33/q40 SQL
    assert(VectorOps.ivfKFor(500L) === 16)    // = vec_id < 16 in q40/q52 SQL
  }

  test("knobs grow with corpus size (and stay clamped)") {
    assert(VectorOps.lshBitsFor(2000L) === 10)         // sf0.1 bench corpus
    assert(VectorOps.ivfKFor(2000L) === 32)
    assert(VectorOps.lshBitsFor(1000000000L) === 24)   // clamp ceiling
    assert(VectorOps.ivfKFor(1000000000L) === 16384)   // 2^floor(log2(√10⁹))
    assert(VectorOps.lshBitsFor(1L) === 4)             // clamp floor
    assert(VectorOps.ivfKFor(1L) === 16)               // k floor
  }

  test("monotonic: more vectors never means coarser sketches") {
    val sizes = Seq(1L, 100L, 500L, 2000L, 50000L, 1000000L, 100000000L, 10000000000L)
    sizes.sliding(2).foreach { case Seq(a, b) =>
      assert(VectorOps.lshBitsFor(a) <= VectorOps.lshBitsFor(b),
        s"lshBitsFor not monotonic between $a and $b")
      assert(VectorOps.ivfKFor(a) <= VectorOps.ivfKFor(b),
        s"ivfKFor not monotonic between $a and $b")
    }
  }

  test("bucket-occupancy targets hold across scales") {
    // ~n/2^bits vectors per LSH bucket stays bounded until the 24-bit clamp;
    // n/k per IVF cell stays O(√n).
    Seq(500L, 2000L, 1000000L).foreach { n =>
      val perBucket = n.toDouble / (1L << VectorOps.lshBitsFor(n))
      assert(perBucket <= 4.0, s"n=$n: $perBucket vectors/bucket")
      val perCell = n.toDouble / VectorOps.ivfKFor(n)
      assert(perCell <= 2.5 * math.sqrt(n.toDouble), s"n=$n: $perCell vectors/cell")
    }
  }
}
