package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL/domain operators — the RefinedWeb-style URL filtering family
  * (Penedo et al. 2023 §3.1: URL blocklist filtering before any content
  * gate; domain-level rollups drive the curation dashboards).
  *
  * The synthetic corpus has no URL column (TESTDATA.md), so both queries
  * first SYNTHESIZE a deterministic URL per document from existing
  * columns — subdomain/TLD/port/query varied by doc_id residues, domain
  * from `source` — with the identical arithmetic restated in the DuckDB
  * oracle (the q96/q97 shell idiom): the gate then checks the
  * host-parsing, registrable-domain, rollup, and blocklist semantics,
  * not the wrapping.
  *
  * Two blocklist shapes on purpose:
  *  - q107 flags per doc with a LITERAL IN-list — the right plan for a
  *    hand-curated list of tens of domains: pure row-local expression,
  *    zero joins, stays in the scan's codegen span.
  *  - q108 excludes via a BROADCAST ANTI-JOIN against a blocklist
  *    relation — the right plan when the blocklist is a real table
  *    (production lists run millions of rows: broadcast while it fits,
  *    the same keyed join shuffled when it doesn't) — then rolls up to
  *    registrable domain. Host extraction is row-local either way; the
  *    only shuffle in q108 is the domain rollup itself.
  */
object UrlOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private val Blocklist = Seq("src3.com", "src7.io", "src11.net", "src4.org", "badsite.xyz")

  /** Deterministic URL shell: https:// + {,www.,cdn.} + source + TLD by
    * doc_id%4 + :8443 on doc_id%7=0 + /lang/doc_id%100 + ?ref=feed on
    * doc_id%5=0. Exercises every piece parse_url must strip (subdomain,
    * port, path, query). */
  private val urlExpr =
    "concat('https://'," +
      " CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '' WHEN 1 THEN 'www.' ELSE 'cdn.' END," +
      " source," +
      // div 20 decorrelates the TLD from source (= src{doc_id % 20} in
      // the synthetic corpus), so every source spans all four TLDs
      " CASE CAST((doc_id div 20) % 4 AS INT) WHEN 0 THEN '.com' WHEN 1 THEN '.org' WHEN 2 THEN '.net' ELSE '.io' END," +
      " CASE WHEN doc_id % 7 = 0 THEN ':8443' ELSE '' END," +
      " '/', lang, '/', CAST(doc_id % 100 AS STRING)," +
      " CASE WHEN doc_id % 5 = 0 THEN '?ref=feed' ELSE '' END)"
  private val urlSql =
    """'https://' ||
      |      CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN '' WHEN 1 THEN 'www.' ELSE 'cdn.' END ||
      |      source ||
      |      CASE CAST((doc_id // 20) % 4 AS INTEGER) WHEN 0 THEN '.com' WHEN 1 THEN '.org' WHEN 2 THEN '.net' ELSE '.io' END ||
      |      CASE WHEN doc_id % 7 = 0 THEN ':8443' ELSE '' END ||
      |      '/' || lang || '/' || CAST(doc_id % 100 AS VARCHAR) ||
      |      CASE WHEN doc_id % 5 = 0 THEN '?ref=feed' ELSE '' END""".stripMargin

  /** Spark side uses the NATIVE parse_url (codegen'd, java.net.URI
    * semantics); the oracle restates host extraction as a regex that is
    * exact for the synthesized shapes (no userinfo, optional port).
    * Registrable domain = last two host labels — the PSL-free
    * simplification; a production deployment swaps in a public-suffix
    * lookup via the same broadcast pattern as the q89 shingle probe. */
  private def withHostDomain(df: DataFrame): DataFrame =
    df.withColumn("host", expr("parse_url(url, 'HOST')"))
      .withColumn("domain", expr(
        "concat(element_at(split(host, '\\\\.'), -2), '.', element_at(split(host, '\\\\.'), -1))"))

  private def q107(s: SparkSession, d: String): DataFrame =
    withHostDomain(
      t(s, d, "documents").select(col("doc_id"), col("source"), col("lang"))
        .withColumn("url", expr(urlExpr)))
      .withColumn("is_blocked", col("domain").isin(Blocklist: _*))
      .select(col("doc_id"), col("url"), col("host"), col("domain"), col("is_blocked"))
      .orderBy("doc_id")
  private def q107Sql =
    s"""WITH u AS (
       |  SELECT doc_id,
       |    $urlSql AS url
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, url, regexp_extract(url, 'https://([^/:]+)', 1) AS host
       |  FROM u),
       |dm AS (
       |  SELECT doc_id, url, host,
       |    toks[-2] || '.' || toks[-1] AS domain
       |  FROM (SELECT doc_id, url, host, string_split(host, '.') AS toks FROM h))
       |SELECT doc_id, url, host, domain,
       |  domain IN (${Blocklist.map(b => s"'$b'").mkString(", ")}) AS is_blocked
       |FROM dm ORDER BY doc_id""".stripMargin

  private def q108(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bl = Blocklist.toDF("bad_domain")
    withHostDomain(
      t(s, d, "documents").select(col("doc_id"), col("source"), col("lang"))
        .withColumn("url", expr(urlExpr)))
      .join(broadcast(bl), col("domain") === col("bad_domain"), "left_anti")
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("n_docs").desc, col("domain"))
  }
  private def q108Sql =
    s"""WITH u AS (
       |  SELECT doc_id, lang,
       |    $urlSql AS url
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, lang, url, regexp_extract(url, 'https://([^/:]+)', 1) AS host
       |  FROM u),
       |dm AS (
       |  SELECT doc_id, lang, host,
       |    toks[-2] || '.' || toks[-1] AS domain
       |  FROM (SELECT doc_id, lang, host, string_split(host, '.') AS toks FROM h))
       |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
       |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
       |FROM dm
       |WHERE domain NOT IN (${Blocklist.map(b => s"'$b'").mkString(", ")})
       |GROUP BY domain ORDER BY n_docs DESC, domain""".stripMargin

  /** q118: per-domain quality drilldown — the curation dashboard a crawl
    * team reviews before adjusting its seed list (RefinedWeb's
    * domain-level analyses; CommonCrawl curation reports the same cut):
    * for every registrable domain, how many docs each quality gate
    * passes and what fraction survives the full funnel. Composes q107's
    * host/domain extraction with the shared five-gate verdict table
    * ([[PipelineOps.gateFlags]] — built once per session/corpus); the
    * oracle embeds q107's and all five gates' published SQL as CTEs.
    *
    * Scale shape: domain extraction is row-local; the verdict join is
    * doc_id-keyed; the rollup is one hash aggregation keyed by domain
    * (domains are zipf-headed — a hot domain is partial-aggregated
    * map-side like any hash agg, no skew window anywhere). The one
    * derived double (survival_rate) is a single division of exact
    * BIGINT counts. */
  private def q118(s: SparkSession, d: String): DataFrame = {
    val dom = graft.SparkEntry.queries("q107_url_extract")(s, d)
      .select(col("doc_id"), col("domain"))
    dom.join(PipelineOps.gateFlags(s, d), Seq("doc_id"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("l"), 1L).otherwise(0L)).as("n_line_pass"),
        sum(when(col("g"), 1L).otherwise(0L)).as("n_gopher_pass"),
        sum(when(col("r"), 1L).otherwise(0L)).as("n_repetition_pass"),
        sum(when(col("c"), 1L).otherwise(0L)).as("n_decontaminated"),
        sum(when(col("u"), 1L).otherwise(0L)).as("n_nondup"),
        sum(when(col("l") && col("g") && col("r") && col("c") && col("u"), 1L)
          .otherwise(0L)).as("n_survivors"))
      .withColumn("survival_rate",
        col("n_survivors").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("n_docs").desc, col("domain"))
  }
  /** def, not val: reads the sibling modules' published oracle maps
    * (the five-gate prologue via [[PipelineOps.gateCtesSql]]). */
  private def q118Sql: String = {
    s"""WITH ${PipelineOps.gateCtesSql},
       |dq AS ($q107Sql),
       |f AS (
       |  SELECT d.doc_id, dq.domain,
       |    ${PipelineOps.gateFlagExprsSql}
       |  FROM documents d
       |  JOIN dq USING (doc_id)
       |  ${PipelineOps.gateJoinsSql})
       |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN l THEN 1 ELSE 0 END) AS BIGINT) AS n_line_pass,
       |  CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass,
       |  CAST(SUM(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT) AS n_repetition_pass,
       |  CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n_decontaminated,
       |  CAST(SUM(CASE WHEN u THEN 1 ELSE 0 END) AS BIGINT) AS n_nondup,
       |  CAST(SUM(CASE WHEN l AND g AND r AND c AND u THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_survivors,
       |  CAST(SUM(CASE WHEN l AND g AND r AND c AND u THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS survival_rate
       |FROM f GROUP BY domain ORDER BY n_docs DESC, domain""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q107_url_extract", q107, Some(q107Sql)),
    Q("q108_domain_rollup", q108, Some(q108Sql)),
    Q("q118_domain_quality", q118, Some(q118Sql)))
}
