package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The bounded-collect contract as CI (round-10 verdict item 6): every
  * `.collect()` in MAIN sources must carry a `collect-bound:` audit
  * comment within the preceding lines stating WHY the collected plan is
  * driver-safe (limit, k-bounded group, caller-enforced cap, …). The
  * static scan makes an unaudited collect a compile-adjacent failure —
  * the next 100 queries can't silently regress the driver-state
  * discipline. The plan-level tests drive
  * [[PlanHygiene.isCollectBounded]] on the audited shapes and prove it
  * rejects the offending ones.
  */
object BoundedCollect {
  val Marker = "collect-bound:"

  /** Repo root resolved by walking up from CWD to the dir holding
    * build.sbt — source-scanning gates must not silently cover zero
    * files when the test JVM is forked with a different working
    * directory. */
  def repoRoot: java.nio.file.Path = {
    var d = java.nio.file.Paths.get("").toAbsolutePath
    while (d != null && !java.nio.file.Files.exists(d.resolve("build.sbt")))
      d = d.getParent
    require(d != null,
      s"no build.sbt above ${java.nio.file.Paths.get("").toAbsolutePath}")
    d
  }

  /** All main .scala sources as (path, content) — the corpus every
    * static audit gate walks. */
  def mainSources: Seq[(String, String)] = {
    val root = repoRoot.resolve("src/main/scala")
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    java.nio.file.Files.walk(root).iterator().forEachRemaining { p =>
      if (p.toString.endsWith(".scala"))
        out += ((p.toString, new String(java.nio.file.Files.readAllBytes(p), "UTF-8")))
    }
    out.toSeq
  }

  /** 1-based line numbers of `.collect()` occurrences lacking a Marker
    * within the same or `window` preceding lines. */
  def violations(src: String, window: Int = 8): Seq[Int] = {
    val lines = src.split("\n", -1)
    lines.zipWithIndex.collect {
      case (l, i) if l.contains(".collect()") &&
        !(math.max(0, i - window) to i).exists(j => lines(j).contains(Marker)) =>
        i + 1
    }.toSeq
  }
}

class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  test("every .collect() in main sources carries a collect-bound: audit") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    var total = 0
    BoundedCollect.mainSources.foreach { case (path, src) =>
      total += src.split("\n", -1).count(_.contains(".collect()"))
      BoundedCollect.violations(src).foreach(ln => bad += s"$path:$ln")
    }
    assert(bad.isEmpty,
      s"unaudited .collect() sites (add a '${BoundedCollect.Marker} <why bounded>' " +
        s"comment within the 8 preceding lines): ${bad.mkString(", ")}")
    assert(total >= 9, s"scan self-check: expected the known audited sites, saw $total")
  }

  test("static checker fires on a synthetic offender") {
    val bad = "val rows = df.filter(col(\"x\") > 1).collect()\n"
    assert(BoundedCollect.violations(bad) === Seq(1))
    val ok = "// collect-bound: limit(1) argmax\nval rows = df.limit(1).collect()\n"
    assert(BoundedCollect.violations(ok).isEmpty)
    val tooFar = ("// collect-bound: stale\n" + ("//\n" * 9)) + "val r = df.collect()\n"
    assert(BoundedCollect.violations(tooFar).nonEmpty,
      "an audit more than 8 lines above must not excuse the site")
  }

  test("isCollectBounded admits the audited plan shapes") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    // BpeOps idiom: ordered limit-1 argmax and the limit-4k window.
    assert(PlanHygiene.isCollectBounded(
      docs.orderBy(col("n_chars").desc).limit(1), 1L))
    assert(PlanHygiene.isCollectBounded(
      docs.orderBy(col("n_chars").desc).limit(24), 24L))
    // Bench idiom: groupless aggregate.
    assert(PlanHygiene.isCollectBounded(docs.agg(sum(col("n_chars"))), 1L))
    // Literal relation.
    assert(PlanHygiene.isCollectBounded(Seq((1, "a")).toDF("a", "b"), 2L))
  }

  test("isCollectBounded rejects the offending plan shapes") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    // Raw corpus scan: data-proportional.
    assert(!PlanHygiene.isCollectBounded(docs.select(col("doc_id")), 1000000L))
    // A limit above the declared cap.
    assert(!PlanHygiene.isCollectBounded(docs.limit(100), 24L))
    // Exploding a 1-row aggregate is data-proportional again.
    val exploded = docs.agg(collect_list(col("doc_id")).as("xs"))
      .select(explode(col("xs")))
    assert(!PlanHygiene.isCollectBounded(exploded, 1000000L))
    // A grouped aggregate (group cardinality unknown at plan time).
    assert(!PlanHygiene.isCollectBounded(
      docs.groupBy(col("source")).agg(count(lit(1))), 1000000L))
  }
}
