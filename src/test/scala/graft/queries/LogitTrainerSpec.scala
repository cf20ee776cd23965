package graft.queries

import graft.SparkSpec

/** [[LmOps.trainLogit]] — the gradient-descent logistic quality trainer
  * behind q220. The DuckDB oracle gates bit-parity; this spec gates the
  * LEARNING properties the card claims: monotone loss, the label-aligned
  * feature carrying the model, and run-to-run determinism. */
class LogitTrainerSpec extends SparkSpec {

  private lazy val cards = LmOps.trainLogit(spark, "/root/testdata/sf0.001", 4)

  test("loss is strictly decreasing across all GD iterations") {
    val losses = cards.map(_._3)
    assert(losses.size === 5)
    losses.sliding(2).foreach { case Seq(a, b) => assert(b < a, s"$losses") }
  }

  test("the stop-density feature (label-aligned) dominates the learned model") {
    val wFinal = cards.last._2
    assert(wFinal(3) > 0.5) // x3 = (16*nstop - nw)/nw, sign == label
    assert(math.abs(wFinal(3)) > wFinal.zipWithIndex
      .filter(_._2 != 3).map(w => math.abs(w._1)).max)
  }

  test("iteration 0 is the exact zero-init state: loss ln2, nothing flagged") {
    val (it0, w0, loss0, flag0) = cards.head
    assert(it0 === 0 && w0.forall(_ == 0.0) && flag0 === 0L)
    // sigma(0) = 0.5 exactly -> portable-ln(0.5); 1-ulp band around ln 2
    assert(math.abs(loss0 - math.log(2.0)) < 1e-7)
  }

  test("deterministic: a second training run reproduces every bit") {
    val again = LmOps.trainLogit(spark, "/root/testdata/sf0.001", 4)
    assert(again === cards)
  }

  test("final model flags a minority, not everything (the eta=2 choice)") {
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    val flagged = cards.last._4
    assert(flagged > 0L && flagged < n)
  }
}
