package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q225 — largest-remainder budget apportionment invariants: the integer
  * guarantees that are the op's reason to exist. */
class ApportionmentSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val rows =
    graft.SparkEntry.queries("q225_budget_apportionment")(spark, sf)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("base"),
        r.getAs[Double]("rem"), r.getAs[Long]("rk"),
        r.getAs[Boolean]("granted"), r.getAs[Long]("budget")))

  private lazy val target: Long =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("t"))
      .agg(sum("t")).head().getLong(0) / 2

  test("budgets sum EXACTLY to the global target") {
    assert(rows.map(_._6).sum === target)
  }

  test("each source gets floor(share) or floor(share)+1, nothing else") {
    rows.foreach { case (s, base, _, _, granted, budget) =>
      assert(budget === base + (if (granted) 1L else 0L), s)
    }
  }

  test("top-ups go precisely to the L largest remainders (ties by source)") {
    val l = (target - rows.map(_._2).sum).toInt
    val expected = rows.sortBy(r => (-r._3, r._1)).take(l).map(_._1).toSet
    assert(rows.filter(_._5).map(_._1).toSet === expected)
    assert(rows.count(_._5) === l)
  }

  test("ranks are a permutation of 0..n-1 consistent with remainder order") {
    assert(rows.map(_._4).sorted === rows.indices.map(_.toLong))
    val byRank = rows.sortBy(_._4).toSeq
    byRank.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
      case _ =>
    }
  }
}
