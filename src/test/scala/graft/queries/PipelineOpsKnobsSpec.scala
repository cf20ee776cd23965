package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The two-level window knobs (VERDICT r8 #1): q92's chunk width and
  * q93's ticket-prefix length are DERIVED from corpus size so neither
  * query ever sorts a corpus-proportional window partition — both levels
  * of each decomposition stay ~√n-sized. Unlike the ANN knobs these are
  * never oracle-matched (the oracle is the one-level spec and hash
  * equality proves the decomposition exact), so the assertions here are
  * about partition-size balance, not cross-engine fixed points. */
class PipelineOpsKnobsSpec extends AnyFunSuite {

  test("oracle-scale values: small corpora still exercise the two-level path") {
    // n = 500 (sf0.001/sf0.01 documents): 16-wide chunks → ~32 chunks,
    // and a 1-hex-char bucket → 16 buckets — both levels multi-partition
    // even at test scale, so CORRECTNESS actually covers the composition.
    assert(PipelineOps.chunkWidthFor(500L) === 16L)
    assert(PipelineOps.ticketPrefixFor(500L) === 1)
    assert(PipelineOps.chunkWidthFor(5000L) === 64L) // sf0.1
    assert(PipelineOps.ticketPrefixFor(5000L) === 1)
  }

  test("clamps: degenerate corpora never yield degenerate knobs") {
    assert(PipelineOps.chunkWidthFor(0L) === 16L)
    assert(PipelineOps.chunkWidthFor(1L) === 16L)
    assert(PipelineOps.ticketPrefixFor(1L) === 1)
    assert(PipelineOps.ticketPrefixFor(Long.MaxValue) === 7) // 63-bit corpus: the 8 clamp is headroom
  }

  test("both levels stay ~√n-bounded across 8 orders of magnitude") {
    Seq(1000L, 100000L, 10000000L, 1000000000L, 100000000000L,
        1000000000000L).foreach { n =>
      val s = PipelineOps.chunkWidthFor(n).toDouble
      val sqrtN = math.sqrt(n.toDouble)
      // q92: level 1 sorts ≤ ~S rows, level 2 sorts ~n/S summaries
      assert(s <= sqrtN + 1, s"n=$n: chunk width $s above √n")
      assert(n / s <= 2.1 * sqrtN, s"n=$n: ${n / s} chunk summaries per source")
      // q93: level 1 sorts ~n/16^k rows per bucket, level 2 sorts 16^k
      // summaries; floor(bitLen/8) quantization costs at most 16×
      val buckets = math.pow(16.0, PipelineOps.ticketPrefixFor(n).toDouble)
      assert(buckets <= 16.0 * sqrtN, s"n=$n: $buckets buckets")
      assert(n / buckets <= 16.0 * sqrtN, s"n=$n: ${n / buckets} rows per bucket")
    }
  }

  test("monotonic: a bigger corpus never derives a smaller chunk or prefix") {
    val sizes = Seq(1L, 500L, 5000L, 100000L, 10000000L, 1000000000L,
      1000000000000L)
    sizes.sliding(2).foreach { case Seq(a, b) =>
      assert(PipelineOps.chunkWidthFor(a) <= PipelineOps.chunkWidthFor(b))
      assert(PipelineOps.ticketPrefixFor(a) <= PipelineOps.ticketPrefixFor(b))
    }
  }

  test("q100 oracle knob parity: the SQL shard-count arithmetic equals chunkWidthFor") {
    // q100's oracle — unlike q92/q93's one-level specs — DERIVES the shard
    // count itself, via GREATEST(16, 1 << (LENGTH(BIN(FLOOR(SQRT(n)))) - 1)).
    // Replicate that arithmetic independently (binary-string length, like
    // BIN) and pin the cross-engine fixed point at many n, not just the
    // three scale factors the hash gate covers. Both engines floor the
    // SAME correctly-rounded IEEE sqrt, so parity holds even where
    // floor(ieee_sqrt(n)) differs from the mathematical floor.
    Seq(1L, 16L, 255L, 256L, 500L, 4999L, 5000L, 65536L, 1000000L,
        987654321L, 1000000000000L).foreach { n =>
      val sq = math.sqrt(n.toDouble).toLong
      val viaSql = math.max(16L,
        if (sq < 1) 1L else 1L << (java.lang.Long.toBinaryString(sq).length - 1))
      assert(PipelineOps.chunkWidthFor(n) === viaSql, s"n=$n")
    }
  }
}
