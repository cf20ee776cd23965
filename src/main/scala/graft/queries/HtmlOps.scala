package graft.queries

import graft.Tables
import graft.functions.Html
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q96: HTML → main-text extraction over the documents corpus (the
  * missing step-zero of a web-scale pretraining pipeline, VERDICT r8
  * "what's missing" #2; the reference collects clean API text, so this
  * is brief-driven — see graft.functions.Html).
  *
  * The corpus is clean text, so each document is first wrapped in a
  * deterministic HTML shell — head/title, a style block, a script block
  * whose body legally contains `<`, a link-menu nav, an h1, the text as
  * paragraphs (split at a frequent token), and a link-heavy footer —
  * IDENTICALLY in both engines. The Spark side then runs the real
  * extractor (graft.functions.Html column combinators) and the oracle
  * restates the identical regex pipeline in DuckDB, so the gate checks
  * the extraction semantics, not just the wrapping:
  *
  *  - script/style bodies must vanish (never leak into main_text);
  *  - title/h1/nav/footer boilerplate must be dropped — the nav and
  *    footer are built LONG enough to pass the length gate and die on
  *    link density alone, so that rule is load-bearing in the oracle;
  *  - the paragraph content must survive, whitespace-normalized.
  *
  * Scale shape: row-local string expressions end to end — no shuffle,
  * no window, pipelines inside the scan stage at any corpus size. */
object HtmlOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private def q96(s: SparkSession, d: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>Daily digest</title>" +
        "<style>p { margin: 0; }</style>" +
        "<script>if (x < 1) { y = \"<div>\"; }</script>" +
        "</head><body>" +
        "<!-- layout rev 7, uses <p> blocks -->" +
        "<nav><a href=\"/\">Home page</a> | <a href=\"/about\">About our project</a>" +
        " | <a href=\"/contact\">Contact the team</a></nav><h1>"),
      coalesce(col("source"), lit("")),
      lit("</h1><p>"),
      // NULL-safe: concat propagates a NULL source/text into NULL html and
      // NULL main_text, where the oracle's COALESCE reassembly yields ''.
      replace(coalesce(col("text"), lit("")), lit(" table "), lit(" </p><p> ")),
      lit("</p><footer><a href=\"/terms\">Terms of use</a>" +
        " <a href=\"/privacy\">Privacy policy</a> (c) example corp</footer>" +
        "</body></html>"))
    val ex = Html.extract(Html.blocks(html))
    t(s, d, "documents")
      .select(col("doc_id"), ex.as("x"))
      .select(col("doc_id"),
        col("x.n_blocks").as("n_blocks"),
        col("x.n_kept").as("n_kept"),
        col("x.n_link_dropped").as("n_link_dropped"),
        length(col("x.main_text")).cast("bigint").as("main_len"),
        col("x.main_text").as("main_text"))
      .orderBy("doc_id")
  }
  private val q96Sql =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<html><head><title>Daily digest</title>'
      |    || '<style>p { margin: 0; }</style>'
      |    || '<script>if (x < 1) { y = "<div>"; }</script>'
      |    || '</head><body>'
      |    || '<!-- layout rev 7, uses <p> blocks -->'
      |    || '<nav><a href="/">Home page</a> | <a href="/about">About our project</a>'
      |    || ' | <a href="/contact">Contact the team</a></nav><h1>'
      |    || COALESCE(source, '') || '</h1><p>'
      |    || replace(COALESCE(text, ''), ' table ', ' </p><p> ')
      |    || '</p><footer><a href="/terms">Terms of use</a>'
      |    || ' <a href="/privacy">Privacy policy</a> (c) example corp</footer>'
      |    || '</body></html>' AS html
      |  FROM documents),
      |seg AS (
      |  SELECT doc_id, list_transform(
      |    regexp_split_to_array(
      |      regexp_replace(html,
      |        '(?is)<(?:script|style)[^>]*>.*?</(?:script|style)>|<!--.*?-->',
      |        ' ', 'g'),
      |      '(?i)</?(?:p|div|h[1-6]|li|br|td|th|tr|ul|ol|table|nav|header|footer)[^>]*>'),
      |    b -> struct_pack(
      |      p := trim(regexp_replace(regexp_replace(b, '<[^>]*>', '', 'g'),
      |        '\s+', ' ', 'g')),
      |      -- COALESCE: DuckDB array_to_string(empty) is NULL where Spark
      |      -- array_join(empty) is '' — an anchorless block must score 0
      |      l := CAST(len(COALESCE(array_to_string(
      |        regexp_extract_all(b, '<a[^>]*>([^<]*)</a>', 1), ''), '')) AS BIGINT)))
      |    AS bs
      |  FROM h),
      |cls AS (
      |  SELECT doc_id,
      |    list_filter(bs, x -> len(x.p) > 0) AS nonempty,
      |    list_filter(bs, x -> len(x.p) >= 25 AND x.l * 2 <= len(x.p)) AS kept,
      |    list_filter(bs, x -> len(x.p) >= 25 AND x.l * 2 > len(x.p)) AS linkdrop
      |  FROM seg)
      |SELECT doc_id,
      |  CAST(len(nonempty) AS BIGINT) AS n_blocks,
      |  CAST(len(kept) AS BIGINT) AS n_kept,
      |  CAST(len(linkdrop) AS BIGINT) AS n_link_dropped,
      |  CAST(len(COALESCE(array_to_string(list_transform(kept, x -> x.p), ' '), ''))
      |    AS BIGINT) AS main_len,
      |  COALESCE(array_to_string(list_transform(kept, x -> x.p), ' '), '') AS main_text
      |FROM cls ORDER BY doc_id""".stripMargin

  val all: Seq[Q] = Seq(Q("q96_html_extract", q96, Some(q96Sql)))
}
