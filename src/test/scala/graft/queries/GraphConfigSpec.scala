package graft.queries

import graft.SparkSpec

/** [[GraphConfig]] — the recall-targeted (entries, width, hops)
  * derivation for the persisted graph index (LshConfig.schemeFor's
  * discipline applied to the graph member). The contract has two
  * halves:
  *
  *  1. HONESTY — [[GraphConfig.MeasuredCurve]] is not a claim, it is a
  *     MEASUREMENT: the spec re-runs the q252 sweep card and asserts
  *     the pinned curve equals it row-by-row, so the shipped default
  *     can never drift from what the card publishes.
  *  2. DERIVATION — schemeFor picks the CHEAPEST qualifying arm under
  *     the documented cost model, falls back to best-measured-recall
  *     when the target is unreachable, and the registered default IS
  *     schemeFor(DefaultTarget) applied to the committed curve.
  */
class GraphConfigSpec extends SparkSpec {

  import GraphConfig._

  private val sf = "/root/testdata/sf0.01"

  test("MeasuredCurve equals the q252 card row-by-row (sf0.01)") {
    val card = VectorOps.all.find(_.name == "q252_graph_width_sweep").get
      .fn(spark, sf)
      .collect()
      .map(r => Scheme(r.getInt(0), r.getInt(1), r.getInt(2)) ->
        r.getDouble(5))
      .toMap
    assert(card.keySet === SweepArms.toSet,
      "the card must publish exactly the sweep grid")
    MeasuredCurve.foreach { case (scheme, pinned) =>
      assert(card(scheme) === pinned,
        s"pinned recall for $scheme drifted: curve says $pinned, " +
          s"the card measures ${card(scheme)} — re-pin MeasuredCurve")
    }
    assert(MeasuredCurve.map(_._1) === SweepArms,
      "curve and sweep grid must list the same arms in the same order")
  }

  test("schemeFor picks the cheapest qualifying arm") {
    // At the default target both (4,3,3) and (8,3,3) qualify on the
    // committed curve; (4,3,3) costs half as much.
    assert(schemeFor(DefaultTarget) === Scheme(4, 3, 3))
    assert(Default === schemeFor(DefaultTarget))
    // A looser target admits cheaper arms.
    val loose = schemeFor(0.2)
    assert(loose === Scheme(1, 1, 3),
      s"everything qualifies at 0.2 — greedy is cheapest: $loose")
    // A target above every measurement falls back to the best-recall
    // arm instead of throwing.
    assert(schemeFor(0.99) === MeasuredCurve.maxBy(_._2)._1)
  }

  test("derivation is deterministic and cost-ordered on synthetic curves") {
    val curve = Seq(
      Scheme(1, 1, 1) -> 0.3,
      Scheme(2, 1, 1) -> 0.6,
      Scheme(1, 2, 1) -> 0.6, // cost 9 < Scheme(2,1,1)'s 10
      Scheme(4, 4, 4) -> 0.9)
    assert(schemeFor(0.5, curve) === Scheme(1, 2, 1),
      "cheapest qualifying arm must win")
    // Equal-cost tie: fewer hops wins (sequential joins = latency).
    val tie = Seq(Scheme(1, 2, 2) -> 0.5, Scheme(1, 4, 1) -> 0.5)
    assert(tie.map(_._1).map(_.cost()).distinct.size === 1, "fixture: equal cost")
    assert(schemeFor(0.5, tie) === Scheme(1, 4, 1))
    // Fallback pool: best recall, cheapest among ties.
    val fb = Seq(Scheme(8, 8, 8) -> 0.4, Scheme(1, 1, 1) -> 0.4,
      Scheme(2, 2, 2) -> 0.3)
    assert(schemeFor(0.9, fb) === Scheme(1, 1, 1))
  }

  test("the registered q251 card reports the Default scheme's measured recall") {
    val card = VectorOps.all.find(_.name == "q251_graph_index_card").get
      .fn(spark, sf).head()
    val recall = card.getDouble(card.fieldIndex("recall_at1"))
    val pinned = MeasuredCurve.find(_._1 == Default).get._2
    assert(recall === pinned,
      s"q251 probes at the Default scheme, so its held-out recall must " +
        s"equal the curve's Default row: card $recall vs curve $pinned")
  }
}
