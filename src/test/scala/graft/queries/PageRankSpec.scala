package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[UrlOps.pageRank]] — the integer fixed-point PageRank loop, gated
  * against an independent plain-Scala mirror of the published update rule
  * (same integer arithmetic, no Spark), plus the determinism and
  * dangling-mass properties the scaladoc claims. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val S = UrlOps.PrScale

  /** Plain-Scala mirror of the exact fixed-point recursion (driver-side
    * maps and sums — an independent implementation of the same integer
    * spec, not a call into the engine). */
  private def mirror(edges0: Seq[(String, String, Long)], iters: Int): Map[String, Long] = {
    val edges = edges0.filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSeq
    val ow = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = verts.size.toLong
    var r = verts.map(_ -> S / n).toMap
    for (_ <- 1 to iters) {
      val dang = verts.filterNot(ow.contains).map(r).sum
      val infl = edges.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        (r(s) / ow(s)) * w + ((r(s) % ow(s)) * w) / ow(s)
      }.sum).toMap
      r = verts.map(v => v ->
        (15L * S / (100L * n) + 85L * infl.getOrElse(v, 0L) / 100L + 85L * (dang / n) / 100L)).toMap
    }
    r
  }

  private val diamond = Seq(
    ("a.com", "b.com", 3L), ("a.com", "c.com", 1L),
    ("b.com", "d.com", 2L), ("c.com", "d.com", 5L),
    ("d.com", "a.com", 1L))

  test("ranks match the plain-Scala integer mirror exactly (weighted diamond)") {
    val got = UrlOps.pageRank(diamond.toDF("src_dom", "dst_dom", "w"), 4)
      .select("domain", "r_fp").as[(String, Long)].collect().toMap
    assert(got === mirror(diamond, 4))
  }

  test("dangling sink: mass is redistributed, sink still ranks highest") {
    // b and c both feed d; d has no out-edges (the dangling case the
    // synthetic corpus graph never produces but a real crawl does).
    val g = Seq(("a.io", "d.io", 1L), ("b.io", "d.io", 1L), ("c.io", "d.io", 1L))
    val got = UrlOps.pageRank(g.toDF("src_dom", "dst_dom", "w"), 3)
      .select("domain", "r_fp", "out_w").as[(String, Long, Long)].collect()
    val m = mirror(g, 3)
    assert(got.map(r => r._1 -> r._2).toMap === m)
    val (top, rest) = got.partition(_._1 == "d.io")
    assert(top.head._3 === 0L) // dangling: no out mass
    assert(rest.forall(_._2 < top.head._2))
    // dangling redistribution keeps total mass near S: each of the 4
    // vertices sheds < 1 unit per floor, 3 floors per vertex per round
    val total = got.map(_._2).sum
    assert(total <= S && total >= S - 100L)
  }

  test("bit-identical under repartitioning (no sum-order dependence)") {
    val df = diamond.toDF("src_dom", "dst_dom", "w")
    val a = UrlOps.pageRank(df, 4).collect().toSeq
    val b = UrlOps.pageRank(df.repartition(7, col("dst_dom")), 4).collect().toSeq
    assert(a === b)
  }

  test("seeded teleport (TrustRank): a link farm outranks on PageRank, not on trust") {
    // Trusted cluster: seed s.com endorses a.com and b.com. Link farm:
    // f1/f2/f3 densely inter-link and all point at target.com — which
    // ends up with the highest in-mass in the graph but NO path from
    // the seed.
    val g = Seq(
      ("s.com", "a.com", 2L), ("s.com", "b.com", 2L), ("a.com", "s.com", 1L),
      ("f1.com", "f2.com", 5L), ("f2.com", "f3.com", 5L), ("f3.com", "f1.com", 5L),
      ("f1.com", "target.com", 9L), ("f2.com", "target.com", 9L),
      ("f3.com", "target.com", 9L))
    val df = g.toDF("src_dom", "dst_dom", "w")
    val pr = UrlOps.pageRank(df, 4)
      .select("domain", "r_fp").as[(String, Long)].collect().toMap
    val tr = UrlOps.pageRankSeeded(df, 4, Some(Seq("s.com")))
      .select("domain", "r_fp").as[(String, Long)].collect().toMap
    // PageRank: the farm target is the global authority.
    assert(pr("target.com") === pr.values.max)
    // TrustRank: no seed-path to the farm -> its mass collapses; the
    // trusted cluster holds the top ranks.
    assert(tr("target.com") * 2 < pr("target.com"))
    assert(Seq("s.com", "a.com", "b.com").map(tr).min > tr("target.com"))
    // seeds = None reduces exactly to pageRank
    val uni = UrlOps.pageRankSeeded(df, 4, None)
      .select("domain", "r_fp").as[(String, Long)].collect().toMap
    assert(uni === pr)
  }

  test("q219 corpus card: every domain present, delta shrinks vs rank scale") {
    val d = graft.SparkEntry.queries("q219_domain_pagerank")(spark, "/root/testdata/sf0.001")
    val rows = d.select("domain", "r_fp", "delta_fp").as[(String, Long, Long)].collect()
    assert(rows.length === 80) // 20 sources x 4 TLDs all reachable
    assert(rows.map(_._2).sum <= S)
    // 4 damped iterations: last-round movement is well under the mean rank
    assert(rows.map(_._3).max < S / 80)
  }
}
