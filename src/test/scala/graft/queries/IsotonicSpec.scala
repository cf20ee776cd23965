package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** [[LmOps.pavFit]] — the exact-rational minimax isotonic fit behind
  * q232. The DuckDB oracle gates the bucket-table restatement; this spec
  * gates the ALGORITHM: the minimax formula must coincide with classic
  * pool-adjacent-violators pooling (the textbook O(m) algorithm, here a
  * deliberately independent stack implementation), the fit must be
  * monotone, and pooling must preserve weighted mass. */
class IsotonicSpec extends AnyFunSuite {

  /** Independent mirror: classic PAV — pool any adjacent pair whose
    * means violate monotonicity, repeat to fixpoint. Exact rationals
    * throughout (BigInt cross-multiplied compares). */
  private def pavClassic(bk: Seq[(Long, Long)]): Seq[(BigInt, BigInt)] = {
    // stack of (numerator, denominator, width)
    val st = scala.collection.mutable.ArrayBuffer.empty[(BigInt, BigInt, Int)]
    bk.foreach { case (nb, pos) =>
      st += ((BigInt(pos), BigInt(nb), 1))
      while (st.length >= 2 && {
        val a = st(st.length - 2); val b = st.last
        a._1 * b._2 > b._1 * a._2 // prior mean > new mean: violation
      }) {
        val b = st.remove(st.length - 1); val a = st.remove(st.length - 1)
        st += ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
      }
    }
    st.toSeq.flatMap { case (p, n, w) => Seq.fill(w)((p, n)) }
  }

  private def cmp(a: (BigInt, BigInt), b: (BigInt, BigInt)): Int =
    (a._1 * b._2).compare(b._1 * a._2)

  private val rnd = new scala.util.Random(0xC0FFEE)
  private def randBuckets(m: Int): Seq[(Long, Long)] =
    (0 until m).map { _ =>
      val nb = 1L + rnd.nextInt(1000)
      (nb, rnd.nextLong(nb + 1))
    }

  test("minimax fit == classic stack PAV on 300 random bucket tables") {
    for (_ <- 1 to 300) {
      val bk = randBuckets(1 + rnd.nextInt(10))
      val mm = LmOps.pavFit(bk)
      val cl = pavClassic(bk)
      assert(mm.length === cl.length)
      mm.zip(cl).zipWithIndex.foreach { case ((a, b), i) =>
        assert(cmp(a, b) === 0, s"pos $i: $a vs $b on $bk")
      }
    }
  }

  test("fit is non-decreasing and clamped to [0, 1]") {
    for (_ <- 1 to 100) {
      val bk = randBuckets(2 + rnd.nextInt(9))
      val fit = LmOps.pavFit(bk)
      fit.sliding(2).foreach { case Seq(a, b) => assert(cmp(a, b) <= 0) }
      fit.foreach { case (p, n) =>
        assert(p >= 0 && p <= n, s"fit $p/$n out of [0,1]")
      }
    }
  }

  test("already-monotone input is returned unchanged (no pooling)") {
    val bk = Seq((10L, 1L), (10L, 3L), (10L, 5L), (10L, 9L))
    val fit = LmOps.pavFit(bk)
    bk.zip(fit).foreach { case ((nb, pos), (p, n)) =>
      assert(p * nb === BigInt(pos) * n)
    }
  }

  test("a single violating pair pools to the weighted mean of the pair") {
    // means 0.8 then 0.2, weights 10 and 30 -> pooled mean 14/40
    val fit = LmOps.pavFit(Seq((10L, 8L), (30L, 6L)))
    fit.foreach { case (p, n) => assert(p * 40 === BigInt(14) * n) }
  }

  test("pooling preserves weighted mass within every pooled block") {
    for (_ <- 1 to 100) {
      val bk = randBuckets(2 + rnd.nextInt(9))
      val fit = LmOps.pavFit(bk)
      // total fitted mass == total positive mass (sum over blocks)
      val fitted = bk.zip(fit).map { case ((nb, _), (p, n)) =>
        // exact rational nb * p/n accumulated over a common denominator
        (BigInt(nb) * p, n)
      }.reduceLeft((a, b) => (a._1 * b._2 + b._1 * a._2, a._2 * b._2))
      val total = BigInt(bk.map(_._2).sum)
      assert(fitted._1 === total * fitted._2)
    }
  }
}
