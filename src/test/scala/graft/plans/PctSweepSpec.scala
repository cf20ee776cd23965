package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** The exact-percentile discipline as CI (round-11 verdict item 6):
  * every exact `percentile(` in MAIN sources must either go through
  * [[graft.queries.PctGate]] (corpus-proportional inputs: exact to 2^23
  * rows, deterministic md5-ticket sample above, branch-identical in
  * both engines) or carry a `pct-bound:` audit comment within the
  * preceding lines stating why its aggregation buffer is bounded
  * (grouped with a documented wide-buffer boundary and an
  * approx_percentile swap-in, a tolerance-band whose point is the exact
  * value, …). `approx_percentile` is exempt — its sketch is fixed-size
  * by construction. PctGate.scala itself is the one file allowed to
  * spell `percentile(` freely: it IS the gate.
  *
  * Pure static scan — no SparkSession needed. */
object PctSweep {
  val Marker = "pct-bound:"

  /** Does the line invoke EXACT percentile? (approx_percentile contains
    * the substring, so strip it first.) */
  private[plans] def exactPercentile(line: String): Boolean =
    line.replace("approx_percentile(", "").contains("percentile(")

  /** 1-based line numbers of exact-percentile calls lacking a Marker
    * within the same or `window` preceding lines. */
  def violations(src: String, window: Int = 8): Seq[Int] = {
    val lines = src.split("\n", -1)
    lines.zipWithIndex.collect {
      case (l, i) if exactPercentile(l) &&
        !(math.max(0, i - window) to i).exists(j => lines(j).contains(Marker)) =>
        i + 1
    }.toSeq
  }
}

class PctSweepSpec extends AnyFunSuite {

  test("no unaudited exact percentile outside PctGate in main sources") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    var gated = 0
    var audited = 0
    BoundedCollect.mainSources.foreach { case (path, src) =>
      if (path.endsWith("PctGate.scala")) {
        gated += 1 // the gate itself — the only free-percentile file
      } else {
        val all = src.split("\n", -1).count(PctSweep.exactPercentile)
        val viol = PctSweep.violations(src)
        audited += all - viol.size
        viol.foreach(ln => bad += s"$path:$ln")
      }
    }
    assert(bad.isEmpty,
      s"unaudited exact percentile( sites — route corpus-proportional inputs " +
        s"through PctGate.thresholdDf/thresholdsDf, or add a " +
        s"'${PctSweep.Marker} <why bounded>' comment: ${bad.mkString(", ")}")
    assert(gated === 1, "scan self-check: PctGate.scala must be in the walk")
    assert(audited >= 3,
      s"scan self-check: expected the known allowlisted grouped sites, saw $audited")
  }

  test("static checker fires on a synthetic offender and exempts approx") {
    val bad = "val t = df.agg(expr(\"percentile(v, 0.999)\"))\n"
    assert(PctSweep.violations(bad) === Seq(1))
    val ok = "// pct-bound: grouped by small enum\n" +
      "val t = df.agg(expr(\"percentile(v, 0.5)\"))\n"
    assert(PctSweep.violations(ok).isEmpty)
    val approx = "val t = df.agg(expr(\"approx_percentile(v, 0.5, 10000)\"))\n"
    assert(PctSweep.violations(approx).isEmpty,
      "approx_percentile is sketch-bounded — not a violation")
    val tooFar = ("// pct-bound: stale\n" + ("//\n" * 9)) +
      "val t = df.agg(expr(\"percentile(v, 0.5)\"))\n"
    assert(PctSweep.violations(tooFar).nonEmpty)
  }
}
