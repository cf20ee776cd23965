package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants of the round-18 lifecycle/separability cards
  * (the DuckDB oracles own value correctness at three scales; these pins
  * are the card CONTRACTS an operator's tooling relies on):
  *
  *  - q262 (churn-recall): exactly one churned and one fresh row, both
  *    scored against the same query count; `recall_gap` restates
  *    fresh − churned recall and `rebuild_due` restates the gap
  *    threshold — the card can never publish a verdict inconsistent
  *    with its own numbers.
  *  - q263 (separability sweep): exactly one row per committed noise
  *    point, recall within [0, 1], and the probe bill positive — every
  *    operating point executed a real search, none fell back to an
  *    empty frame.
  *  - q251/q252 (build-vs-probe disclosure): build_scorings is the same
  *    constant on every sweep row and strictly positive — the amortized
  *    build bill is disclosed, not re-measured per arm.
  */
class LifecycleCardsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def card(name: String) =
    VectorOps.all.find(_.name == name).get.fn(spark, sf)

  test("q262 churn card: arms, shared denominator, self-consistent verdict") {
    val rows = card("q262_churn_recall_card").collect()
    assert(rows.map(_.getAs[String]("arm")).sorted.toSeq ===
      Seq("churned", "fresh"))
    val byArm = rows.map(r => r.getAs[String]("arm") -> r).toMap
    val ch = byArm("churned"); val fr = byArm("fresh")
    assert(ch.getAs[Long]("n_queries") === fr.getAs[Long]("n_queries"),
      "both arms must be scored over the same query batch")
    val gap = fr.getAs[Double]("recall_at1") - ch.getAs[Double]("recall_at1")
    rows.foreach { r =>
      assert(r.getAs[Double]("recall_gap") === gap,
        "recall_gap must restate fresh - churned from the card's own rows")
      assert(r.getAs[Boolean]("rebuild_due") === (gap > 0.25),
        "rebuild_due must restate the threshold on the published gap")
    }
  }

  test("q263 separability sweep: one executed row per committed noise point") {
    val rows = card("q263_separability_sweep").collect()
    assert(rows.map(_.getAs[Double]("cluster_noise")).toSeq ===
      Seq(0.3, 0.6, 1.2), "one row per committed noise point, ordered")
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at1")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("scored_cands") > 0L,
        "every operating point must have executed a real search")
      assert(r.getAs[Long]("n_queries") > 0L)
    }
  }

  test("q252 sweep rows disclose one constant positive build bill") {
    val rows = card("q252_graph_width_sweep").collect()
    val bills = rows.map(_.getAs[Long]("build_scorings")).distinct
    assert(bills.length === 1,
      "build_scorings is the index's one-time bill — identical on every arm row")
    assert(bills.head > 0L)
  }

  test("q251 card splits build and probe bills") {
    val r = card("q251_graph_index_card").head()
    assert(r.getAs[Long]("build_scorings") > 0L)
    assert(r.getAs[Long]("probe_scorings") > 0L)
    assert(r.getAs[Long]("build_scorings") !== r.getAs[Long]("probe_scorings"),
      "fixture sanity: the two bills measure different work")
  }
}
