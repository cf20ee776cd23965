package graft.queries

import graft.{Scalars, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation planning operators — the decisions a pretraining run
  * makes AFTER the per-doc gates and dedup passes have produced their
  * verdicts: how many epochs of each source to take (q171), what a fixed
  * context length wastes (q172), what each near-dup threshold would
  * actually remove (q173), and which documents mix languages (q174).
  *
  * Shared scale discipline: every query here touches the corpus at most
  * once (a hash aggregation or a row-local projection); all planning
  * arithmetic runs on |sources|-, |thresholds|- or pairs-sized tables
  * behind the enforced ≤1-row scalar attach where a global count is
  * needed.
  */
object CurationOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private def wsTokens = size(split(coalesce(col("text"), lit("")), " ")).cast("long")

  // ---------------------------------------------------------------------
  // q171 — UniMax sampling allocation (Chung et al. 2023, "UniMax: Fairer
  // and More Effective Language Sampling for Large-Scale Multilingual
  // Pretraining"): given a token budget B and a per-source epoch cap E,
  // walk sources in ascending order of supply (= cap_tokens · E) and give
  // each min(supply, remaining_budget div remaining_sources) — small
  // sources get their full E epochs, large ones split the leftover budget
  // evenly ("waterfilling" with integer floors).
  //
  // The fold is SEQUENTIAL by definition (each allocation changes the
  // water level for the rest), so it runs where sequential state belongs:
  // inside one row. The corpus contributes exactly ONE hash aggregation
  // (per-source token counts); the waterfill is an `aggregate` fold over
  // a |sources|-row sorted array in a groupless aggregate — bounded by
  // source cardinality, not corpus size, the same boundedness argument as
  // q120's mixture fold. Integer arithmetic throughout (floor division),
  // so the oracle — which must state the same sequential recurrence via
  // WITH RECURSIVE, DuckDB's only sequential-fold shape with an
  // accumulator — agrees bit-for-bit; the single double division
  // (epochs = alloc/cap) happens identically in both engines.
  // ---------------------------------------------------------------------
  private val EpochCap = 4L

  private def q171(s: SparkSession, d: String): DataFrame = {
    // |sources| rows; referenced twice (fold input + final join) —
    // materialize per the QueryModule convention so the corpus token
    // aggregation runs once.
    val caps = t(s, d, "documents")
      .select(col("source"), wsTokens.as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("cap_tokens"))
      .withColumn("supply_tokens", col("cap_tokens") * EpochCap)
      .localCheckpoint(true)
    val folded = caps
      .agg(
        // coalesce: NULL source would sort FIRST in sort_array but LAST in
        // the oracle's ORDER BY, silently permuting the sequential fold.
        sort_array(collect_list(struct(col("supply_tokens").as("supply"),
            coalesce(col("source"), lit("")).as("source"))))
          .as("xs"),
        (sum(col("cap_tokens")) * 2).as("b"),
        count(lit(1)).as("n"))
      .select(expr(
        """aggregate(xs,
          |  named_struct('r', b, 'k', n,
          |    'allocs', CAST(array() AS array<struct<source:string,alloc:bigint>>)),
          |  (acc, x) -> named_struct(
          |    'r', acc.r - least(x.supply, acc.r div acc.k),
          |    'k', acc.k - 1,
          |    'allocs', array_append(acc.allocs,
          |      named_struct('source', x.source,
          |        'alloc', least(x.supply, acc.r div acc.k))))).allocs""".stripMargin)
        .as("allocs"))
      .select(explode(col("allocs")).as("a"))
      .select(col("a.source").as("source"), col("a.alloc").as("alloc_tokens"))
    caps.join(folded, "source")
      .withColumn("epochs_used",
        when(col("cap_tokens") > 0,
          col("alloc_tokens").cast("double") / col("cap_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .select(col("source"), col("cap_tokens"), col("supply_tokens"),
        col("alloc_tokens"), col("epochs_used"))
      .orderBy("source")
  }
  private val q171Sql =
    s"""WITH RECURSIVE caps AS (
       |  SELECT source,
       |    CAST(SUM(len(string_split(COALESCE(text, ''), ' '))) AS BIGINT) AS cap_tokens
       |  FROM documents GROUP BY source),
       |tot AS (
       |  SELECT CAST(SUM(cap_tokens) * 2 AS BIGINT) AS b,
       |    CAST(COUNT(*) AS BIGINT) AS n FROM caps),
       |ord AS (
       |  SELECT source, cap_tokens, cap_tokens * $EpochCap AS supply_tokens,
       |    CAST(ROW_NUMBER() OVER (ORDER BY cap_tokens * $EpochCap, COALESCE(source, ''))
       |      AS BIGINT) AS i
       |  FROM caps),
       |step AS (
       |  SELECT CAST(0 AS BIGINT) AS i, b AS r,
       |    CAST(NULL AS VARCHAR) AS source, CAST(NULL AS BIGINT) AS alloc
       |  FROM tot
       |  UNION ALL
       |  SELECT o.i, s.r - LEAST(o.supply_tokens, s.r // (tot.n - o.i + 1)),
       |    o.source, LEAST(o.supply_tokens, s.r // (tot.n - o.i + 1))
       |  FROM step s JOIN ord o ON o.i = s.i + 1 CROSS JOIN tot)
       |SELECT o.source, o.cap_tokens, o.supply_tokens, st.alloc AS alloc_tokens,
       |  CASE WHEN o.cap_tokens > 0
       |    THEN CAST(st.alloc AS DOUBLE) / CAST(o.cap_tokens AS DOUBLE)
       |    ELSE 0e0 END AS epochs_used
       |FROM ord o JOIN step st ON st.i = o.i
       |ORDER BY o.source""".stripMargin

  // ---------------------------------------------------------------------
  // q172 — context-length truncation waste: for each candidate training
  // context length L, how many documents overflow and what fraction of
  // corpus tokens a truncate-at-L policy discards (the number packing —
  // q92 — exists to drive toward zero). One corpus pass; the literal
  // context-length explode multiplies rows by |Ls| BEFORE a hash
  // aggregation absorbs them map-side, so nothing corpus-proportional
  // ever shuffles. Integer-exact except the final division.
  // ---------------------------------------------------------------------
  private def q172(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .select(wsTokens.as("n_tokens"))
      .select(col("n_tokens"), explode(expr("array(128L, 512L, 2048L)")).as("ctx_len"))
      .groupBy(col("ctx_len"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("n_tokens") > col("ctx_len"), 1)).as("n_truncated"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(greatest(col("n_tokens") - col("ctx_len"), lit(0L))).as("tokens_lost"))
      .withColumn("loss_frac",
        when(col("total_tokens") > 0,
          col("tokens_lost").cast("double") / col("total_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .orderBy("ctx_len")
  }
  private val q172Sql =
    """WITH d AS (
      |  SELECT CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |x AS (
      |  SELECT n_tokens, ctx_len
      |  FROM d CROSS JOIN (SELECT CAST(unnest([128, 512, 2048]) AS BIGINT) AS ctx_len) c),
      |g AS (
      |  SELECT ctx_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(COUNT(*) FILTER (WHERE n_tokens > ctx_len) AS BIGINT) AS n_truncated,
      |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |    CAST(SUM(GREATEST(n_tokens - ctx_len, 0)) AS BIGINT) AS tokens_lost
      |  FROM x GROUP BY ctx_len)
      |SELECT ctx_len, n_docs, n_truncated, total_tokens, tokens_lost,
      |  CASE WHEN total_tokens > 0
      |    THEN CAST(tokens_lost AS DOUBLE) / CAST(total_tokens AS DOUBLE)
      |    ELSE 0e0 END AS loss_frac
      |FROM g ORDER BY ctx_len""".stripMargin

  // ---------------------------------------------------------------------
  // q173 — near-dup threshold sweep: the ROI curve a dedup run consults
  // before committing to a Jaccard cutoff — per candidate threshold, how
  // many verified pairs fire and how many documents / tokens / chars the
  // keep-lower-doc_id policy would remove. Consumes q27's memoized
  // verified-pairs artifact (the q42 consumer pattern), so the corpus
  // cost was already paid; everything here is pairs-×-|thresholds|-sized.
  // The victim token lookup joins the (small) victim set against the
  // corpus doc_id-keyed — broadcast at test scale, keyed shuffle at
  // corpus scale. Thresholds compare against the pair jaccard, itself
  // bit-identical in both engines (same integer inputs, one division).
  // The oracle embeds q27's published SQL as a CTE (the q95/q150
  // composition pattern), so this is also a composition proof.
  // ---------------------------------------------------------------------
  private def q173(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // Pairs × thresholds survivors; two consumers (pair count + victim
    // set) — pairs-sized, materialize once.
    val f = DedupOps.verifiedPairs(s, d)
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        explode(expr("array(0.5D, 0.6D, 0.7D, 0.8D, 0.9D)")).as("threshold"))
      .filter(col("jaccard") >= col("threshold"))
      .localCheckpoint(true)
    val th = Seq(0.5, 0.6, 0.7, 0.8, 0.9).toDF("threshold")
    val pc = f.groupBy(col("threshold")).agg(count(lit(1)).as("n_pairs"))
    val docs = t(s, d, "documents")
      .select(col("doc_id"), col("n_chars"), wsTokens.as("tok"))
    val vs = f.select(col("threshold"), col("doc_b")).distinct()
      .join(docs, col("doc_b") === col("doc_id"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_victims"), sum(col("tok")).as("tokens_removed"),
        sum(col("n_chars")).as("chars_removed"))
    val nd = t(s, d, "documents").agg(count(lit(1)).as("n_docs"))
    Scalars.withScalar(
        th.join(pc, Seq("threshold"), "left").join(vs, Seq("threshold"), "left"), nd)
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_victims"), lit(0L)).as("n_victims"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"),
        coalesce(col("chars_removed"), lit(0L)).as("chars_removed"),
        (coalesce(col("n_victims"), lit(0L)).cast("double")
          / col("n_docs").cast("double")).as("docs_removed_frac"))
      .orderBy("threshold")
  }
  private def q173Sql: String = {
    val pr = DedupOps.oracleSql("q27_dedup_ngram_jaccard")
    s"""WITH pr AS ($pr),
       |th AS (SELECT CAST(unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE) AS threshold),
       |f AS (
       |  SELECT threshold, doc_a, doc_b
       |  FROM pr, th WHERE pr.jaccard >= th.threshold),
       |pc AS (SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM f GROUP BY 1),
       |v AS (SELECT DISTINCT threshold, doc_b FROM f),
       |vs AS (
       |  SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_victims,
       |    CAST(SUM(len(string_split(COALESCE(d.text, ''), ' '))) AS BIGINT) AS tokens_removed,
       |    CAST(SUM(d.n_chars) AS BIGINT) AS chars_removed
       |  FROM v JOIN documents d ON d.doc_id = v.doc_b GROUP BY 1),
       |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
       |SELECT th.threshold,
       |  CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
       |  CAST(COALESCE(n_victims, 0) AS BIGINT) AS n_victims,
       |  CAST(COALESCE(tokens_removed, 0) AS BIGINT) AS tokens_removed,
       |  CAST(COALESCE(chars_removed, 0) AS BIGINT) AS chars_removed,
       |  CAST(COALESCE(n_victims, 0) AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |    AS docs_removed_frac
       |FROM th LEFT JOIN pc USING (threshold) LEFT JOIN vs USING (threshold)
       |CROSS JOIN nd
       |ORDER BY threshold""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q174 — intra-document code-switch detection: per-line language ID
  // (q22's n-gram-hit families applied to each 8-token line — the q98
  // line convention) rolled up to a per-doc mixing profile: dominant
  // language, its share, adjacent-line switch count, and a mixed flag.
  // Multilingual cleaning pipelines route mixed docs to different
  // tokenizer/filter paths than monolingual ones (CCNet keeps per-lang
  // shards; a doc whose lines disagree belongs to neither shard).
  //
  // Strictly ROW-LOCAL (the q96/q97/q145 class): line synthesis, per-line
  // regex scoring and the adjacency scan are higher-order-function
  // lambdas over one row; the only exchange is the output sort. The
  // dominant-language argmax is a fixed priority ladder (en, fr, de,
  // unknown on >=) restated identically in the oracle, so ties are
  // engine-deterministic. Adjacent-switch counting differs in FORM
  // (Spark: zip_with over two slices — sequence() auto-reverses when
  // start > stop so it can't express an empty 2..n range; DuckDB:
  // generate_series indexing, which can) but both state "count i where
  // lang[i] != lang[i-1]"; hash equality at three scales is the proof.
  // ---------------------------------------------------------------------
  private def q174(s: SparkSession, d: String): DataFrame = {
    val en = "\\\\b(the|a|is|and|of)\\\\b"
    val fr = "\\\\b(le|la|les|et|est|une)\\\\b"
    val de = "\\\\b(der|die|das|und|ist)\\\\b"
    t(s, d, "documents")
      .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("toks"))
      .withColumn("lines", expr(
        "transform(sequence(0, (size(toks) - 1) div 8)," +
          " i -> array_join(slice(toks, i * 8 + 1, 8), ' '))"))
      .withColumn("langs", expr(
        s"""transform(lines, l ->
           |  CASE WHEN regexp_count(l, '$fr') > regexp_count(l, '$en')
           |         AND regexp_count(l, '$fr') > regexp_count(l, '$de') THEN 'fr'
           |    WHEN regexp_count(l, '$de') > regexp_count(l, '$en') THEN 'de'
           |    WHEN regexp_count(l, '$en') > 0 THEN 'en'
           |    ELSE 'unknown' END)""".stripMargin))
      .withColumn("n_lines", size(col("langs")).cast("long"))
      .withColumn("en_lines", expr("size(filter(langs, x -> x = 'en'))").cast("long"))
      .withColumn("fr_lines", expr("size(filter(langs, x -> x = 'fr'))").cast("long"))
      .withColumn("de_lines", expr("size(filter(langs, x -> x = 'de'))").cast("long"))
      .withColumn("unk_lines", expr("size(filter(langs, x -> x = 'unknown'))").cast("long"))
      .withColumn("dom_lang", expr(
        """CASE WHEN en_lines >= fr_lines AND en_lines >= de_lines
          |       AND en_lines >= unk_lines THEN 'en'
          |  WHEN fr_lines >= de_lines AND fr_lines >= unk_lines THEN 'fr'
          |  WHEN de_lines >= unk_lines THEN 'de'
          |  ELSE 'unknown' END""".stripMargin))
      .withColumn("dom_share", expr(
        """CAST(CASE dom_lang WHEN 'en' THEN en_lines WHEN 'fr' THEN fr_lines
          |  WHEN 'de' THEN de_lines ELSE unk_lines END AS DOUBLE)
          |  / CAST(n_lines AS DOUBLE)""".stripMargin))
      .withColumn("n_switches", expr(
        """CAST(size(filter(zip_with(
          |  slice(langs, 1, size(langs) - 1), slice(langs, 2, size(langs) - 1),
          |  (a, b) -> a <> b), x -> x)) AS BIGINT)""".stripMargin))
      .withColumn("is_mixed", expr(
        "(CASE WHEN en_lines > 0 THEN 1 ELSE 0 END + CASE WHEN fr_lines > 0 THEN 1 ELSE 0 END" +
          " + CASE WHEN de_lines > 0 THEN 1 ELSE 0 END) >= 2"))
      .select(col("doc_id"), col("n_lines"), col("en_lines"), col("fr_lines"),
        col("de_lines"), col("unk_lines"), col("dom_lang"), col("dom_share"),
        col("n_switches"), col("is_mixed"))
      .orderBy("doc_id")
  }
  private val q174Sql = {
    val en = "\\b(the|a|is|and|of)\\b"
    val fr = "\\b(le|la|les|et|est|une)\\b"
    val de = "\\b(der|die|das|und|ist)\\b"
    s"""WITH t AS (
       |  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks
       |  FROM documents),
       |ln AS (
       |  SELECT doc_id,
       |    list_transform(range(0, (len(toks) - 1) // 8 + 1),
       |      i -> array_to_string(toks[i * 8 + 1 : i * 8 + 8], ' ')) AS lines
       |  FROM t),
       |lg AS (
       |  SELECT doc_id,
       |    list_transform(lines, l ->
       |      CASE WHEN len(regexp_extract_all(l, '$fr')) > len(regexp_extract_all(l, '$en'))
       |             AND len(regexp_extract_all(l, '$fr')) > len(regexp_extract_all(l, '$de')) THEN 'fr'
       |        WHEN len(regexp_extract_all(l, '$de')) > len(regexp_extract_all(l, '$en')) THEN 'de'
       |        WHEN len(regexp_extract_all(l, '$en')) > 0 THEN 'en'
       |        ELSE 'unknown' END) AS langs
       |  FROM ln),
       |c AS (
       |  SELECT doc_id, langs,
       |    CAST(len(langs) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(langs, x -> x = 'en')) AS BIGINT) AS en_lines,
       |    CAST(len(list_filter(langs, x -> x = 'fr')) AS BIGINT) AS fr_lines,
       |    CAST(len(list_filter(langs, x -> x = 'de')) AS BIGINT) AS de_lines,
       |    CAST(len(list_filter(langs, x -> x = 'unknown')) AS BIGINT) AS unk_lines
       |  FROM lg),
       |dl AS (
       |  SELECT *, CASE WHEN en_lines >= fr_lines AND en_lines >= de_lines
       |        AND en_lines >= unk_lines THEN 'en'
       |      WHEN fr_lines >= de_lines AND fr_lines >= unk_lines THEN 'fr'
       |      WHEN de_lines >= unk_lines THEN 'de'
       |      ELSE 'unknown' END AS dom_lang
       |  FROM c)
       |SELECT doc_id, n_lines, en_lines, fr_lines, de_lines, unk_lines, dom_lang,
       |  CAST(CASE dom_lang WHEN 'en' THEN en_lines WHEN 'fr' THEN fr_lines
       |    WHEN 'de' THEN de_lines ELSE unk_lines END AS DOUBLE)
       |    / CAST(n_lines AS DOUBLE) AS dom_share,
       |  CAST(len(list_filter(generate_series(2, CAST(len(langs) AS INTEGER)),
       |    i -> langs[i] <> langs[i - 1])) AS BIGINT) AS n_switches,
       |  (CASE WHEN en_lines > 0 THEN 1 ELSE 0 END
       |    + CASE WHEN fr_lines > 0 THEN 1 ELSE 0 END
       |    + CASE WHEN de_lines > 0 THEN 1 ELSE 0 END) >= 2 AS is_mixed
       |FROM dl ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q175 — Unicode-normalized exact dedup: q26's keep-first semantics with
  // NFC canonical composition (the native `graft_nfc` expression) applied
  // BEFORE the lower/trim/whitespace-collapse chain, so byte-different but
  // Unicode-equal texts (decomposed e+U+0301 vs precomposed é) land in the
  // same duplicate group — the normalize-before-hash step every real
  // cleaning pipeline runs (raw web text mixes normalization forms
  // freely; byte-keyed dedup silently misses those duplicates).
  //
  // Deliberately the SCALE formulation, not q26's window-by-norm: groups
  // key on md5 of the normalized text, so the one corpus-wide shuffle
  // moves a fixed-width 32-char digest (q98's idiom), never full document
  // text; canonical member and group size come from a hash aggregation
  // (map-side partials absorb the duplicate mass) joined back on the same
  // key. `was_renormalized` reports whether NFC changed anything —
  // identically false on an all-ASCII corpus (the oracle still pins the
  // plumbing; the adversarial-corpus fuzz gate exercises the unicode
  // path, and the unit spec pins composed/decomposed collision).
  // ---------------------------------------------------------------------
  private def q175(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "documents")
      .withColumn("nfc_text", expr("graft_nfc(coalesce(text, ''))"))
      .withColumn("h", md5(regexp_replace(lower(trim(col("nfc_text"))), "\\s+", " ")))
      .select(col("doc_id"), col("h"),
        (col("nfc_text") =!= coalesce(col("text"), lit(""))).as("was_renormalized"))
    val groups = base.groupBy(col("h"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("group_size"))
    base.join(groups, "h")
      .select(col("doc_id"), col("canonical_id"), col("group_size"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"), col("was_renormalized"))
      .orderBy("doc_id")
  }
  private val q175Sql =
    """WITH n AS (
      |  SELECT doc_id, nfc_normalize(COALESCE(text, '')) AS nfc_text,
      |    COALESCE(text, '') AS raw
      |  FROM documents),
      |k AS (
      |  SELECT doc_id,
      |    md5(regexp_replace(lower(trim(nfc_text)), '\s+', ' ', 'g')) AS h,
      |    nfc_text <> raw AS was_renormalized
      |  FROM n)
      |SELECT doc_id,
      |  MIN(doc_id) OVER w AS canonical_id,
      |  COUNT(*) OVER w AS group_size,
      |  doc_id <> MIN(doc_id) OVER w AS is_dup,
      |  was_renormalized
      |FROM k
      |WINDOW w AS (PARTITION BY h)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q176 — per-source boilerplate-line removal (the RefinedWeb/CCNet
  // line-frequency filter): a line occurring in ≥ 3 documents AND ≥ 5% of
  // its source's documents is template boilerplate (navigation chrome,
  // cookie banners) and is struck from EVERY doc — unlike q98's
  // keep-first, which preserves one copy. Thresholds are evaluated in
  // INTEGER arithmetic (df·20 ≥ n_src_docs), so the verdict is
  // engine-exact with no double comparison.
  //
  // Scale shape (the q98 family): one line explode, an md5-keyed
  // (source, h, doc_id) DISTINCT aggregation — duplicate mass absorbed
  // map-side, 32-char digest bounds shuffle width — then the verdict
  // joins back on (source, h) and a doc_id rollup reassembles. The
  // |sources|-row doc-count table broadcasts.
  // ---------------------------------------------------------------------
  private def q176(s: SparkSession, d: String): DataFrame = {
    // Exploded once, consumed by the doc-frequency aggregate AND the
    // verdict join: materialize per the QueryModule convention.
    val lines = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        split(coalesce(col("text"), lit("")), " ").as("toks"))
      .select(col("doc_id"), col("source"), posexplode(expr(
        "transform(sequence(0, (size(toks) - 1) div 8)," +
          " i -> array_join(slice(toks, i * 8 + 1, 8), ' '))"))
        .as(Seq("idx", "line")))
      .select(col("doc_id"), col("source"), col("idx").cast("long").as("idx"),
        col("line"), md5(col("line")).as("h"))
      .localCheckpoint(true)
    val srcDocs = t(s, d, "documents").groupBy(col("source"))
      .agg(count(lit(1)).as("n_src_docs"))
    val df = lines.select(col("source"), col("h"), col("doc_id")).distinct()
      .groupBy(col("source"), col("h")).agg(count(lit(1)).as("line_df"))
      .join(broadcast(srcDocs), "source")
      .select(col("source"), col("h"),
        (col("line_df") >= 3 && col("line_df") * 20 >= col("n_src_docs"))
          .as("is_boiler"))
    lines.join(df, Seq("source", "h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        count(when(col("is_boiler"), 1)).as("n_boiler_lines"),
        array_join(expr(
          "transform(array_sort(collect_list(CASE WHEN NOT is_boiler" +
            " THEN struct(idx, line) END)), x -> x.line)"), "\n")
          .as("clean_text"))
      .withColumn("boiler_frac",
        col("n_boiler_lines").cast("double") / col("n_lines").cast("double"))
      .select(col("doc_id"), col("n_lines"), col("n_boiler_lines"),
        col("boiler_frac"), col("clean_text"))
      .orderBy("doc_id")
  }
  private val q176Sql =
    """WITH t AS (
      |  SELECT doc_id, source, string_split(COALESCE(text, ''), ' ') AS toks
      |  FROM documents),
      |ln AS (
      |  SELECT doc_id, source, idx,
      |    array_to_string(toks[idx * 8 + 1 : idx * 8 + 8], ' ') AS line
      |  FROM (SELECT doc_id, source, toks,
      |          unnest(range(0, (len(toks) - 1) // 8 + 1)) AS idx
      |        FROM t)),
      |sd AS (SELECT source, COUNT(*) AS n_src_docs FROM documents GROUP BY source),
      |df AS (
      |  SELECT source, md5(line) AS h, COUNT(DISTINCT doc_id) AS line_df
      |  FROM ln GROUP BY source, md5(line)),
      |verdict AS (
      |  SELECT df.source, df.h,
      |    (df.line_df >= 3 AND df.line_df * 20 >= sd.n_src_docs) AS is_boiler
      |  FROM df JOIN sd USING (source))
      |SELECT ln.doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(COUNT(*) FILTER (WHERE is_boiler) AS BIGINT) AS n_boiler_lines,
      |  CAST(COUNT(*) FILTER (WHERE is_boiler) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS boiler_frac,
      |  COALESCE(array_to_string(list(line ORDER BY idx)
      |    FILTER (WHERE NOT is_boiler), chr(10)), '') AS clean_text
      |FROM ln JOIN verdict ON ln.source = verdict.source AND md5(ln.line) = verdict.h
      |GROUP BY ln.doc_id
      |ORDER BY ln.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q177 — source-interleaved shard assignment: the dataloader layout
  // that guarantees every shard sees every source in corpus proportion
  // (pure ticket-shuffle — q100 — only guarantees it in expectation;
  // curriculum mixing and distributed data-parallel training both want
  // the per-shard mix EXACT). Round-robin by per-source rank: doc with
  // per-source ticket rank r lands in shard r mod S, so per-(source,
  // shard) counts differ by at most one BY CONSTRUCTION — the balance
  // matrix this query emits is the proof artifact.
  //
  // Scale shape: the per-source rank is q93's two-level exact rank
  // (ticket-prefix buckets, both levels √n-bounded — never a
  // corpus/|sources| single-task window); S is corpus-derived (≈√n,
  // power of two, the q52/q100 knob idiom) with the identical integer
  // derivation in the oracle; the output is the (shard × source) count
  // matrix, S·|sources| rows. Oracle states the one-level per-source
  // ROW_NUMBER — hash equality proves the bucket decomposition.
  // ---------------------------------------------------------------------
  private[queries] def shardsFor(n: Long): Int =
    java.lang.Long.highestOneBit(math.max(4L, math.sqrt(n.toDouble).toLong)).toInt

  /** (doc_id, source, shard) via the q93-class two-level rank — shared by
    * q177 (balance matrix) and q199 (shard manifest). */
  // Memoized per (session, corpus): two consumers (q177, q199) would
  // otherwise each pay the corpus count + two-level rank from scratch —
  // the uvCache/verifiedPairs artifact-sharing convention.
  private val shardCache = new graft.SessionCache[DataFrame]

  private def shardAssignments(s: SparkSession, d: String): DataFrame =
    shardCache.getOrBuild(s, d) { buildShardAssignments(s, d).localCheckpoint(true) }

  private def buildShardAssignments(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = t(s, d, "documents").count()
    val kPfx = PipelineOps.ticketPrefixFor(n)
    val nShards = shardsFor(n)
    val tickets = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat_ws("|", coalesce(col("source"), lit("")), col("doc_id"))).as("tkt"))
      .withColumn("bucket", substring(col("tkt"), 1, kPfx))
      .localCheckpoint(true)
    val wLocal = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("tkt"), col("doc_id"))
    val wBuckets = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tickets.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("bucket_docs"))
      .select(col("source"), col("bucket"),
        coalesce(sum(col("bucket_docs")).over(wBuckets), lit(0L)).as("bucket_offset"))
    tickets
      .withColumn("local_rnk", row_number().over(wLocal).cast("bigint"))
      .join(offsets, Seq("source", "bucket"))
      .select(col("doc_id"), col("source"),
        ((col("bucket_offset") + col("local_rnk") - 1) % nShards).as("shard"))
  }

  private def q177(s: SparkSession, d: String): DataFrame = {
    shardAssignments(s, d)
      .groupBy(col("shard"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("shard", "source")
  }
  private val q177Sql =
    """WITH params AS (
      |  SELECT GREATEST(4, 1 << (LENGTH(BIN(CAST(FLOOR(SQRT(CAST(
      |    GREATEST(COUNT(*), 4) AS DOUBLE))) AS BIGINT))) - 1)) AS s
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(COALESCE(source, '') || '|' || CAST(doc_id AS VARCHAR)),
      |        doc_id) AS rnk
      |  FROM documents)
      |SELECT (rnk - 1) % (SELECT s FROM params) AS shard, source,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM r GROUP BY 1, 2
      |ORDER BY shard, source""".stripMargin

  // ---------------------------------------------------------------------
  // q178 — IVF cluster-quality card: per cell of the ANN family's seed
  // codebook (q52's corpus-derived k), how many vectors it holds, how
  // tight it is (mean/min cosine to its own centroid) and how well
  // separated (mean margin over the second-best centroid). Low-margin
  // cells are where IVF recall dies and where SemDeDup (q114)
  // over-merges — this is the diagnostic read before trusting either.
  //
  // Scale shape: cell assignment + both cosines are ROW-LOCAL scoring
  // against the broadcast literal codebook (k ∝ √n — q131's argument);
  // the only shuffle is the cell-keyed aggregation. Per-cell mean
  // cosines are vec_id-ordered IEEE folds (the q165 discipline — the
  // fold buffers one double per cell member, the documented wide-buffer
  // boundary); min is order-free.
  // ---------------------------------------------------------------------
  private def q178(s: SparkSession, d: String): DataFrame = {
    val u = VectorOps.unitVectors(s, d)
    val k = VectorOps.ivfKFor(u.count())
    val sc = VectorOps.sortedCells(VectorOps.codebook(u, k), k)
    u.select(col("vec_id"),
        element_at(sc, 1)("cid").as("cell"),
        element_at(sc, 1)("cc").as("own_cos"),
        (element_at(sc, 1)("cc") - element_at(sc, 2)("cc")).as("margin"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("aggregate(array_sort(collect_list(struct(vec_id, own_cos)))," +
          " cast(0 as double), (a, x) -> a + x.own_cos)").as("cos_sum"),
        min(col("own_cos")).as("min_cos"),
        expr("aggregate(array_sort(collect_list(struct(vec_id, margin)))," +
          " cast(0 as double), (a, x) -> a + x.margin)").as("margin_sum"))
      .select(col("cell"), col("n_vecs"),
        (col("cos_sum") / col("n_vecs").cast("double")).as("mean_cos"),
        col("min_cos"),
        (col("margin_sum") / col("n_vecs").cast("double")).as("mean_margin"))
      .orderBy("cell")
  }
  private val q178Sql =
    """WITH params AS (
      |  SELECT GREATEST(16, 1 << (LENGTH(BIN(CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) - 1)) AS k
      |  FROM embeddings),
      |e AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b)) AS nrm
      |  FROM embeddings),
      |u AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS ue FROM e),
      |cent AS (SELECT vec_id AS cid, ue AS cu FROM u WHERE vec_id < (SELECT k FROM params)),
      |cc AS (
      |  SELECT u.vec_id, cent.cid,
      |    list_reduce(list_prepend(0.0, list_transform(list_zip(u.ue, cent.cu),
      |      p -> p[1] * p[2])), (a, b) -> a + b) AS cc
      |  FROM u CROSS JOIN cent),
      |ranked AS (
      |  SELECT vec_id, cid, cc,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid) AS rn
      |  FROM cc),
      |a AS (
      |  SELECT vec_id,
      |    CAST(MAX(CASE WHEN rn = 1 THEN cid END) AS INTEGER) AS cell,
      |    MAX(CASE WHEN rn = 1 THEN cc END) AS own_cos,
      |    MAX(CASE WHEN rn = 1 THEN cc END) - MAX(CASE WHEN rn = 2 THEN cc END) AS margin
      |  FROM ranked WHERE rn <= 2 GROUP BY vec_id)
      |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  list_reduce(list_prepend(0.0, list(own_cos ORDER BY vec_id)), (x, y) -> x + y)
      |    / CAST(COUNT(*) AS DOUBLE) AS mean_cos,
      |  MIN(own_cos) AS min_cos,
      |  list_reduce(list_prepend(0.0, list(margin ORDER BY vec_id)), (x, y) -> x + y)
      |    / CAST(COUNT(*) AS DOUBLE) AS mean_margin
      |FROM a GROUP BY cell
      |ORDER BY cell""".stripMargin

  // ---------------------------------------------------------------------
  // q179 — dual-LM importance scoring (the CCNet/DSIR data-selection
  // shape, Wenzek et al. 2020 / Xie et al. 2023: score each document by
  // ln p_target(x) − ln p_raw(x) where the TARGET LM is trained on
  // high-quality data and the RAW LM on the whole corpus, then keep the
  // top tail). Here both are the engine's bigram add-one LM: the raw
  // side is the memoized q106 artifact; the target side trains on the
  // five-gate survivors (the memoized gateFlags verdict — "clean" is the
  // pipeline's own definition, as in production where the target set is
  // a curated corpus). Unseen-by-the-target transitions smooth to
  // ln(1) − ln(0 + V) through LEFT-join COALESCE — the q113 missing-key
  // discipline, no dense probe. All ln arguments are integers →
  // PortableLn keeps every score bit-identical in DuckDB; per-doc sums
  // are pos-ordered IEEE folds; the selection threshold is an exact
  // interpolated percentile attached through the enforced ≤1-row scalar.
  //
  // Degenerate precondition: an empty gate-survivor set drives V to 0
  // and the smoothing ln to a nonsense-but-deterministic value computed
  // IDENTICALLY by both engines (PortableLn is total); real corpora
  // always pass docs, so no guard — parity, not validity, is the
  // contract there.
  //
  // Scale shape: two corpus-proportional passes (the target-count
  // aggregations and the transition probe join), both token-keyed hash
  // work — the q106/q113 family; everything else is vocabulary-sized or
  // the two ≤1-row scalars. The probe LEFT-joins the corpus transitions
  // against vocabulary-sized count tables on the keys those counts were
  // aggregated by.
  // ---------------------------------------------------------------------
  private def q179(s: SparkSession, d: String): DataFrame = {
    val raw = LmOps.lmScores(s, d)
    // Same base/transition derivation as lmScores (kept cheap per the
    // q113 lesson: a bare explode off a checkpointed base beats
    // checkpointing the exploded table).
    val base = t(s, d, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 2)
      .localCheckpoint(true) // consumers: probe transitions + train subset
    val trans = base
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> struct(i as pos, toks[i-1] as prev, toks[i] as cur))")).as("x"))
      .select(col("doc_id"), col("x.pos").as("pos"),
        col("x.prev").as("prev"), col("x.cur").as("cur"))
    val pass = PipelineOps.gateFlags(s, d)
      .filter(col("l") && col("g") && col("r") && col("c") && col("u"))
      .select(col("doc_id"))
    val trainBase = base.join(pass, "doc_id").localCheckpoint(true)
    val uniT = trainBase.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("ucnt"))
    val vT = uniT.agg(count(lit(1)).as("v"))
    val bcT = trainBase
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> struct(toks[i-1] as prev, toks[i] as cur))")).as("x"))
      .select(col("x.prev").as("prev"), col("x.cur").as("cur"))
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("bcnt"))
    val joined = Scalars.withScalar(
      trans.join(bcT, Seq("prev", "cur"), "left")
        .join(uniT.withColumnRenamed("w", "prev"), Seq("prev"), "left"),
      vT)
    val lnCols =
      LmOps.PortableLn.steps("(coalesce(bcnt, cast(0 as bigint)) + 1)", "a", spark = true) ++
        LmOps.PortableLn.steps("(coalesce(ucnt, cast(0 as bigint)) + v)", "b", spark = true)
    val scored = lnCols.foldLeft(joined) { case (df, (name, e)) =>
      df.withColumn(name, expr(e))
    }
    val tgt = scored
      .withColumn("lp", expr("lna - lnb"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nt"),
        expr("aggregate(array_sort(collect_list(struct(pos, lp)))," +
          " cast(0 as double), (a, x) -> a + x.lp)").as("lp_sum"))
      .select(col("doc_id"), (col("lp_sum") / col("nt").cast("double")).as("avg_lp_target"))
    // Two consumers (percentile + flag): materialize the scored table.
    val both = raw
      .select(col("doc_id"), col("n_transitions"), col("avg_logprob").as("avg_lp_raw"))
      .join(tgt, "doc_id")
      .withColumn("importance", col("avg_lp_target") - col("avg_lp_raw"))
      .localCheckpoint(true)
    val thr = PctGate.thresholdDf(both, both.count(),
      "importance", "0.75", "q179p75", "imp_p75")
    Scalars.withScalar(both, thr)
      .select(col("doc_id"), col("n_transitions"), col("avg_lp_raw"),
        col("avg_lp_target"), col("importance"), col("imp_p75"),
        (col("importance") >= col("imp_p75")).as("selected"))
      .orderBy("doc_id")
  }
  private def q179Sql: String = {
    val (rawLast, rawCtes) = LmOps.lnCtes("j0", "l",
      Seq("(bcnt + 1)" -> "a", "(ucnt + v)" -> "b"))
    val (tgtLast, tgtCtes) = LmOps.lnCtes("k0", "m",
      Seq("(COALESCE(bcnt_t, 0) + 1)" -> "a", "(COALESCE(ucnt_t, 0) + vt)" -> "b"))
    s"""WITH ${PipelineOps.gateCtesSql},
       |base AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents
       |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 2),
       |trans AS (
       |  SELECT doc_id, i AS pos, toks[i] AS prev, toks[i + 1] AS cur
       |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
       |        FROM base)),
       |uni AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS ucnt
       |  FROM (SELECT unnest(toks) AS w FROM base) GROUP BY w),
       |vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
       |bc AS (
       |  SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS bcnt
       |  FROM trans GROUP BY prev, cur),
       |j0 AS (
       |  SELECT t.doc_id, t.pos, b.bcnt, u.ucnt, (SELECT v FROM vv) AS v
       |  FROM trans t JOIN bc b USING (prev, cur) JOIN uni u ON u.w = t.prev),
       |${rawCtes.mkString(",\n")},
       |pd_raw AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(lna - lnb ORDER BY pos)),
       |      (a, x) -> a + x) AS lp_sum
       |  FROM $rawLast GROUP BY doc_id),
       |gate_pass AS (
       |  SELECT doc_id FROM documents
       |  ${PipelineOps.gateJoinsSql}
       |  WHERE ${PipelineOps.gateConjunctionSql}),
       |base_t AS (SELECT base.* FROM base JOIN gate_pass USING (doc_id)),
       |uni_t AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS ucnt_t
       |  FROM (SELECT unnest(toks) AS w FROM base_t) GROUP BY w),
       |vv_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS vt FROM uni_t),
       |bc_t AS (
       |  SELECT toks[i] AS prev, toks[i + 1] AS cur, CAST(COUNT(*) AS BIGINT) AS bcnt_t
       |  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
       |        FROM base_t)
       |  GROUP BY 1, 2),
       |k0 AS (
       |  SELECT t.doc_id, t.pos, bt.bcnt_t, ut.ucnt_t, (SELECT vt FROM vv_t) AS vt
       |  FROM trans t
       |  LEFT JOIN bc_t bt USING (prev, cur)
       |  LEFT JOIN uni_t ut ON ut.w = t.prev),
       |${tgtCtes.mkString(",\n")},
       |pd_t AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(lna - lnb ORDER BY pos)),
       |      (a, x) -> a + x) / CAST(COUNT(*) AS DOUBLE) AS avg_lp_target
       |  FROM $tgtLast GROUP BY doc_id),
       |sel AS (
       |  SELECT r.doc_id, r.n_transitions,
       |    r.lp_sum / CAST(r.n_transitions AS DOUBLE) AS avg_lp_raw,
       |    t.avg_lp_target,
       |    t.avg_lp_target - r.lp_sum / CAST(r.n_transitions AS DOUBLE) AS importance
       |  FROM pd_raw r JOIN pd_t t USING (doc_id)),
       |thr AS (${PctGate.thresholdSql("sel", "importance", "0.75", "q179p75", "imp_p75")})
       |SELECT doc_id, n_transitions, avg_lp_raw, avg_lp_target, importance,
       |  (SELECT imp_p75 FROM thr) AS imp_p75,
       |  importance >= (SELECT imp_p75 FROM thr) AS selected
       |FROM sel ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q180 — cell-quota balanced sampling (topic/cluster-balanced corpus
  // selection): cap every IVF cell of the seed codebook at the fair
  // share ceil(n/k), selecting within each cell by deterministic md5
  // ticket rank — the embedding-space twin of q93's per-source
  // temperature sampling (DoReMi/cluster-balanced data mixes cap
  // over-represented semantic clusters, not just over-represented
  // sources). Selection is a pure function of the data: stable across
  // engines, partitionings, reruns.
  //
  // Scale shape: assignment is row-local scoring against the broadcast
  // literal codebook; the one wide stage is the per-cell rank window —
  // per-task rows ≈ n/k ≈ √n because k ∝ √n (q144's partition-class
  // argument; a pathologically skewed cell degrades toward n, and the
  // q93 ticket-prefix two-level decomposition is the documented swap-in
  // — q178 is the diagnostic that would trigger it). The fair-share cap
  // is integer arithmetic from the two ≤1-row scalars.
  // ---------------------------------------------------------------------
  private def q180(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = VectorOps.unitVectors(s, d)
    val n = u.count()
    val k = VectorOps.ivfKFor(n)
    val sc = VectorOps.sortedCells(VectorOps.codebook(u, k), k)
    val qcap = (n + k - 1) / k
    val w = Window.partitionBy(col("cell")).orderBy(col("tkt"), col("vec_id"))
    u.select(col("vec_id"),
        element_at(sc, 1)("cid").as("cell"),
        md5(concat_ws("|", lit("v"), col("vec_id"))).as("tkt"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .withColumn("quota", lit(qcap))
      .withColumn("selected", col("rnk") <= col("quota"))
      .select(col("vec_id"), col("cell"), col("rnk"), col("quota"), col("selected"))
      .orderBy("vec_id")
  }
  private val q180Sql =
    """WITH params AS (
      |  SELECT GREATEST(16, 1 << (LENGTH(BIN(CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT))) - 1)) AS k,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM embeddings),
      |e AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b)) AS nrm
      |  FROM embeddings),
      |u AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS ue FROM e),
      |cent AS (SELECT vec_id AS cid, ue AS cu FROM u WHERE vec_id < (SELECT k FROM params)),
      |cc AS (
      |  SELECT u.vec_id, cent.cid,
      |    list_reduce(list_prepend(0.0, list_transform(list_zip(u.ue, cent.cu),
      |      p -> p[1] * p[2])), (a, b) -> a + b) AS cc
      |  FROM u CROSS JOIN cent),
      |assign AS (
      |  SELECT vec_id, CAST(cid AS INTEGER) AS cell FROM (
      |    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid) AS rn
      |    FROM cc) t WHERE rn = 1),
      |r AS (
      |  SELECT vec_id, cell,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY cell
      |      ORDER BY md5('v|' || CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rnk
      |  FROM assign)
      |SELECT vec_id, cell, rnk,
      |  (SELECT (n + k - 1) // k FROM params) AS quota,
      |  rnk <= (SELECT (n + k - 1) // k FROM params) AS selected
      |FROM r ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // q181 — license classification + per-source license mix (The Stack /
  // StarCoder curation: code corpora keep only permissively-licensed
  // documents, and the license-mix table per source is the report that
  // decision reads). The synthetic corpus carries no license text, so —
  // the UrlOps shell idiom — a deterministic header is synthesized per
  // doc_id residue with the IDENTICAL arithmetic restated in the oracle:
  // the gate then checks the first-match priority classification and the
  // rollup, not the wrapping. Detection is substring containment (the
  // portable subset — no regex needed), first-match priority fixed
  // apache > mit > gpl > cc, so overlapping notices resolve identically
  // in both engines.
  //
  // Scale shape: classification is strictly row-local in the scan span;
  // the one shuffle is the (source, license) hash aggregation; the
  // per-source share divides by a broadcast per-source total.
  // ---------------------------------------------------------------------
  private def q181(s: SparkSession, d: String): DataFrame = {
    val header =
      "CASE CAST(doc_id % 7 AS INT)" +
        " WHEN 0 THEN 'licensed under the apache license, version 2.0. '" +
        " WHEN 1 THEN 'permission is hereby granted (mit license). '" +
        " WHEN 2 THEN 'this program is free software: gnu general public license. '" +
        " WHEN 3 THEN 'licensed under a creative commons attribution 4.0 license. '" +
        " ELSE '' END"
    val classified = t(s, d, "documents")
      .withColumn("full", expr(s"concat($header, coalesce(text, ''))"))
      .withColumn("license", expr(
        """CASE WHEN instr(full, 'apache license') > 0 THEN 'apache-2.0'
          |  WHEN instr(full, 'mit license') > 0 THEN 'mit'
          |  WHEN instr(full, 'gnu general public license') > 0 THEN 'gpl'
          |  WHEN instr(full, 'creative commons') > 0 THEN 'cc-by'
          |  ELSE 'unknown' END""".stripMargin))
    val srcTotals = classified.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src_docs"))
    classified.groupBy(col("source"), col("license"))
      .agg(count(lit(1)).as("n_docs"))
      .join(broadcast(srcTotals), "source")
      .select(col("source"), col("license"), col("n_docs"),
        (col("n_docs").cast("double") / col("n_src_docs").cast("double")).as("share"),
        col("license").isin("apache-2.0", "mit", "cc-by").as("is_permissive"))
      .orderBy("source", "license")
  }
  private val q181Sql =
    """WITH c AS (
      |  SELECT source,
      |    CASE CAST(doc_id % 7 AS INTEGER)
      |      WHEN 0 THEN 'licensed under the apache license, version 2.0. '
      |      WHEN 1 THEN 'permission is hereby granted (mit license). '
      |      WHEN 2 THEN 'this program is free software: gnu general public license. '
      |      WHEN 3 THEN 'licensed under a creative commons attribution 4.0 license. '
      |      ELSE '' END || COALESCE(text, '') AS ftxt
      |  FROM documents),
      |lic AS (
      |  SELECT source,
      |    CASE WHEN contains(ftxt, 'apache license') THEN 'apache-2.0'
      |      WHEN contains(ftxt, 'mit license') THEN 'mit'
      |      WHEN contains(ftxt, 'gnu general public license') THEN 'gpl'
      |      WHEN contains(ftxt, 'creative commons') THEN 'cc-by'
      |      ELSE 'unknown' END AS license
      |  FROM c),
      |st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src_docs FROM lic GROUP BY source)
      |SELECT lic.source, license, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS DOUBLE) / CAST(st.n_src_docs AS DOUBLE) AS share,
      |  license IN ('apache-2.0', 'mit', 'cc-by') AS is_permissive
      |FROM lic JOIN st ON lic.source = st.source
      |GROUP BY lic.source, license, st.n_src_docs
      |ORDER BY lic.source, license""".stripMargin

  // ---------------------------------------------------------------------
  // q182 — vocabulary min-count pruning impact: replace every token whose
  // corpus frequency is below MinCount with <unk> (the unigram-LM /
  // word2vec preprocessing step) and report the per-doc OOV rate plus the
  // global vocabulary reduction. The decision this feeds: how much of the
  // long tail a count threshold actually deletes, per document — a doc
  // whose OOV rate explodes under pruning is exactly the rare-token text
  // (names, code, noise) the LM will model worst.
  //
  // Scale shape (the q106/q113 probe family): ONE corpus token
  // aggregation builds the count table; the verdict join probes tokens
  // against it on the key it was aggregated by; vocabulary sizes attach
  // through the enforced ≤1-row scalar. Integer-exact except the final
  // rate division.
  // ---------------------------------------------------------------------
  private val MinCount = 5L

  private def q182(s: SparkSession, d: String): DataFrame = {
    // Exploded once, consumed by the count aggregation AND the probe.
    val words = t(s, d, "documents")
      .select(col("doc_id"), explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .localCheckpoint(true)
    val wc = words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val vocabStats = wc.agg(
      count(lit(1)).as("vocab_full"),
      count(when(col("cnt") >= MinCount, 1)).as("vocab_kept"))
    Scalars.withScalar(
        words.join(wc, "w")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            count(when(col("cnt") < MinCount, 1)).as("n_oov")),
        vocabStats)
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double")).as("oov_rate"),
        col("vocab_full"), col("vocab_kept"))
      .orderBy("doc_id")
  }
  private val q182Sql =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS w
       |  FROM documents),
       |wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY w),
       |vs AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS vocab_full,
       |    CAST(COUNT(*) FILTER (WHERE cnt >= $MinCount) AS BIGINT) AS vocab_kept
       |  FROM wc),
       |pd AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(COUNT(*) FILTER (WHERE cnt < $MinCount) AS BIGINT) AS n_oov
       |  FROM w JOIN wc USING (w) GROUP BY doc_id)
       |SELECT doc_id, n_tokens, n_oov,
       |  CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate,
       |  (SELECT vocab_full FROM vs) AS vocab_full,
       |  (SELECT vocab_kept FROM vs) AS vocab_kept
       |FROM pd ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q183 — duplicate-cluster size distribution: the histogram a dedup run
  // publishes (SemDeDup/Lee et al. report exactly this curve) — for each
  // cluster size, how many clusters, how many documents they hold, and
  // how many docs keep-one-per-cluster deletes. Consumes q42's connected
  // components through the public registry; the oracle embeds q42's
  // published SQL (the q95/q150 composition-proof pattern). Everything
  // past q42 is one canonical-row filter + a |distinct sizes|-row
  // aggregation.
  // ---------------------------------------------------------------------
  private def q183(s: SparkSession, d: String): DataFrame = {
    graft.SparkEntry.queries("q42_dup_clusters")(s, d)
      .filter(col("is_canonical"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("docs_removed"))
      .orderBy("cluster_size")
  }
  private def q183Sql: String = {
    val c = PipelineOps.oracleSql("q42_dup_clusters")
    s"""WITH c AS ($c)
       |SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |  cluster_size * CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  (cluster_size - 1) * CAST(COUNT(*) AS BIGINT) AS docs_removed
       |FROM c WHERE is_canonical
       |GROUP BY cluster_size ORDER BY cluster_size""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q184 — Otsu auto-threshold over the LM quality score: pick the
  // avg_logprob cutoff that maximizes between-class variance over a
  // 32-bin histogram (Otsu 1979 — the parameter-free alternative to
  // q106's fixed bottom-decile; gate calibration without choosing a
  // percentile). Classic Otsu runs on the HISTOGRAM with bin midpoints
  // as class values, which is exactly what makes it exact-at-scale: the
  // corpus contributes one integer bin-count aggregation, and every
  // double operation afterwards runs over the 32-row bin table inside
  // ONE row (the q143 bounded-fold class — collect, fold in bin order,
  // argmax by struct ordering with the smaller split winning ties).
  // Degenerate corpus (all scores equal) yields bin 0 for every doc,
  // every split scores -1, and the threshold collapses to lo —
  // deterministically, in both engines.
  // ---------------------------------------------------------------------
  private def q184(s: SparkSession, d: String): DataFrame = {
    val scores = LmOps.lmScores(s, d).select(col("doc_id"), col("avg_logprob"))
    val stats = scores.agg(
      min(col("avg_logprob")).as("lo"), max(col("avg_logprob")).as("hi"),
      count(lit(1)).as("n"))
    val binned = Scalars.withScalar(scores, stats)
      .withColumn("bin", expr(
        "CASE WHEN hi > lo THEN least(31, cast(floor((avg_logprob - lo)" +
          " / (hi - lo) * 32e0) as int)) ELSE 0 END"))
    val binCounts = binned.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    Scalars.withScalar(
        binCounts.agg(collect_list(struct(col("bin"), col("cnt"))).as("raw")), stats)
      .withColumn("cnts", expr(
        "transform(sequence(0, 31), i -> coalesce(element_at(" +
          "map_from_entries(raw), i), cast(0 as bigint)))"))
      .withColumn("mids", expr(
        "transform(sequence(0, 31), i -> lo + (hi - lo)" +
          " * ((cast(i as double) + 5e-1) / 32e0))"))
      .withColumn("wtotal", expr(
        "aggregate(sequence(1, 32), cast(0 as double)," +
          " (a, i) -> a + cast(element_at(cnts, i) as double) * element_at(mids, i))"))
      .withColumn("cand0", expr(
        """transform(sequence(1, 31), k -> named_struct(
          |  'k', k,
          |  'w0', aggregate(slice(cnts, 1, k), cast(0 as bigint), (a, x) -> a + x),
          |  's0', aggregate(sequence(1, k), cast(0 as double),
          |    (a, i) -> a + cast(element_at(cnts, i) as double) * element_at(mids, i))))"""
          .stripMargin))
      .withColumn("cand", expr(
        """transform(cand0, c -> named_struct(
          |  'nv', CASE WHEN c.w0 > 0 AND c.w0 < n THEN
          |      -(((cast(c.w0 as double) / cast(n as double))
          |        * (cast(n - c.w0 as double) / cast(n as double)))
          |        * ((c.s0 / cast(c.w0 as double) - (wtotal - c.s0) / cast(n - c.w0 as double))
          |          * (c.s0 / cast(c.w0 as double) - (wtotal - c.s0) / cast(n - c.w0 as double))))
          |    ELSE 1e0 END,
          |  'k', c.k))""".stripMargin))
      .withColumn("best", array_min(col("cand")))
      .select(col("n").as("n_docs"), col("lo"), col("hi"),
        col("best.k").as("best_k"),
        expr("lo + (hi - lo) * (cast(best.k as double) / 32e0)").as("threshold"),
        expr("-best.nv").as("between_var"))
  }
  private def q184Sql: String = {
    val (lastStage, lnCtes) = LmOps.lnCtes("j0", "l",
      Seq("(bcnt + 1)" -> "a", "(ucnt + v)" -> "b"))
    s"""WITH base AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |  FROM documents
       |  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 2),
       |trans AS (
       |  SELECT doc_id, i AS pos, toks[i] AS prev, toks[i + 1] AS cur
       |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
       |        FROM base)),
       |uni AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS ucnt
       |  FROM (SELECT unnest(toks) AS w FROM base) GROUP BY w),
       |vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni),
       |bc AS (
       |  SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS bcnt
       |  FROM trans GROUP BY prev, cur),
       |j0 AS (
       |  SELECT t.doc_id, t.pos, b.bcnt, u.ucnt, (SELECT v FROM vv) AS v
       |  FROM trans t JOIN bc b USING (prev, cur) JOIN uni u ON u.w = t.prev),
       |${lnCtes.mkString(",\n")},
       |sc AS (
       |  SELECT doc_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(lna - lnb ORDER BY pos)),
       |      (a, x) -> a + x) / CAST(COUNT(*) AS DOUBLE) AS avg_logprob
       |  FROM $lastStage GROUP BY doc_id),
       |st AS (
       |  SELECT MIN(avg_logprob) AS lo, MAX(avg_logprob) AS hi,
       |    CAST(COUNT(*) AS BIGINT) AS n FROM sc),
       |binned AS (
       |  SELECT CASE WHEN st.hi > st.lo
       |      THEN LEAST(31, CAST(FLOOR((avg_logprob - st.lo) / (st.hi - st.lo) * 32e0) AS INTEGER))
       |      ELSE 0 END AS bin
       |  FROM sc CROSS JOIN st),
       |bcnt AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM binned GROUP BY bin),
       |dense AS (
       |  SELECT CAST(r.i AS INTEGER) AS bin, COALESCE(bcnt.cnt, 0) AS cnt
       |  FROM range(0, 32) r(i) LEFT JOIN bcnt ON bcnt.bin = r.i),
       |cl AS (SELECT list(cnt ORDER BY bin) AS cnts FROM dense),
       |arrs AS (
       |  SELECT st.lo, st.hi, st.n, cl.cnts,
       |    list_transform(range(0, 32),
       |      i -> st.lo + (st.hi - st.lo)
       |        * ((CAST(i AS DOUBLE) + 5e-1) / 32e0)) AS mids
       |  FROM cl CROSS JOIN st),
       |wt AS (
       |  SELECT *, list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(1, 33),
       |        i -> CAST(cnts[i] AS DOUBLE) * mids[i])), (a, b) -> a + b) AS wtotal
       |  FROM arrs),
       |cand0 AS (
       |  SELECT *, list_transform(range(1, 32), k -> struct_pack(
       |      k := k,
       |      w0 := list_reduce(list_prepend(CAST(0 AS BIGINT), cnts[1:k]),
       |        (a, x) -> a + x),
       |      s0 := list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |        list_transform(range(1, k + 1),
       |          i -> CAST(cnts[i] AS DOUBLE) * mids[i])), (a, b) -> a + b))) AS c0
       |  FROM wt),
       |cand AS (
       |  SELECT *, list_transform(c0, c -> struct_pack(
       |      nv := CASE WHEN c.w0 > 0 AND c.w0 < n THEN
       |          -(((CAST(c.w0 AS DOUBLE) / CAST(n AS DOUBLE))
       |            * (CAST(n - c.w0 AS DOUBLE) / CAST(n AS DOUBLE)))
       |            * ((c.s0 / CAST(c.w0 AS DOUBLE) - (wtotal - c.s0) / CAST(n - c.w0 AS DOUBLE))
       |              * (c.s0 / CAST(c.w0 AS DOUBLE) - (wtotal - c.s0) / CAST(n - c.w0 AS DOUBLE))))
       |        ELSE 1e0 END,
       |      k := c.k)) AS cands
       |  FROM cand0),
       |best AS (
       |  SELECT *, list_reduce(cands,
       |      (a, b) -> CASE WHEN b < a THEN b ELSE a END) AS bst
       |  FROM cand)
       |SELECT n AS n_docs, lo, hi, CAST(bst.k AS INTEGER) AS best_k,
       |  lo + (hi - lo) * (CAST(bst.k AS DOUBLE) / 32e0) AS threshold,
       |  -bst.nv AS between_var
       |FROM best""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q186 — content-defined chunking (the Rabin/FastCDC family storage
  // dedup runs, at token granularity): a token CLOSES a chunk when its
  // portable hash ≡ 0 mod 16 (expected chunk ≈ 16 tokens), so chunk
  // boundaries depend only on CONTENT — an insertion early in a document
  // shifts fixed-size blocks but leaves every later CDC chunk identical,
  // which is exactly why dedup systems use it. Chunks are then hashed and
  // deduplicated corpus-wide; per doc, how many of its chunks exist
  // elsewhere (the shareable fraction).
  //
  // The boundary hash is the repo's portable h60 idiom (first 15 md5
  // nibbles as BIGINT — q28/q100's engine-exact hash). Scale shape: one
  // posexplode; the chunk-id prefix sum is a doc_id-keyed window
  // (per-task rows = document length — the q128/q159 boundedness class,
  // NOT corpus-proportional); chunk texts aggregate by (doc, chunk) and
  // dedup by chunk-hash — both keyed hash aggs, md5 digests bound the
  // shuffle width (q98's idiom).
  // ---------------------------------------------------------------------
  private def q186(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, d, "documents")
      .select(col("doc_id"), posexplode(split(coalesce(col("text"), lit("")), " "))
        .as(Seq("pos", "tok")))
      .withColumn("brk",
        when(expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint) % 16 = 0"), 1L)
          .otherwise(0L))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = toks
      .withColumn("chunk", coalesce(sum(col("brk")).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(count(lit(1)).as("chunk_toks"),
        md5(array_join(expr("transform(array_sort(collect_list(struct(pos, tok)))," +
          " x -> x.tok)"), " ")).as("h"))
      .localCheckpoint(true) // consumers: global chunk census + doc rollup
    // "shared" means exists in ANOTHER document: distinct-doc count per
    // chunk hash, so intra-doc repetition of a chunk doesn't inflate the
    // cross-document dedup-potential number.
    val census = chunks.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    chunks.join(census, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("ndocs") > 1, 1)).as("n_shared_chunks"),
        sum(col("chunk_toks")).as("n_tokens"))
      .select(col("doc_id"), col("n_chunks"), col("n_shared_chunks"),
        (col("n_shared_chunks").cast("double") / col("n_chunks").cast("double"))
          .as("shared_frac"),
        (col("n_tokens").cast("double") / col("n_chunks").cast("double"))
          .as("avg_chunk_tokens"))
      .orderBy("doc_id")
  }
  private val q186Sql =
    """WITH tk AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
      |  FROM (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks,
      |          unnest(generate_series(1, len(string_split(COALESCE(text, ''), ' ')))) AS i
      |        FROM documents)),
      |b AS (
      |  SELECT doc_id, pos, tok,
      |    CASE WHEN ('0x' || substr(md5(tok), 1, 15))::BIGINT % 16 = 0
      |      THEN 1 ELSE 0 END AS brk
      |  FROM tk),
      |cid AS (
      |  SELECT doc_id, pos, tok,
      |    CAST(COALESCE(SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS chunk
      |  FROM b),
      |ch AS (
      |  SELECT doc_id, chunk, CAST(COUNT(*) AS BIGINT) AS chunk_toks,
      |    md5(array_to_string(list(tok ORDER BY pos), ' ')) AS h
      |  FROM cid GROUP BY doc_id, chunk),
      |census AS (SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ndocs
      |           FROM ch GROUP BY h)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |  CAST(COUNT(*) FILTER (WHERE ndocs > 1) AS BIGINT) AS n_shared_chunks,
      |  CAST(COUNT(*) FILTER (WHERE ndocs > 1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS shared_frac,
      |  CAST(SUM(chunk_toks) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS avg_chunk_tokens
      |FROM ch JOIN census USING (h)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q187 — near-dup graph degree distribution: per node degree in q27's
  // verified-pair graph, how many documents — including the degree-0 mass
  // the pair table can't see (a LEFT join from the corpus restores it).
  // The shape of this histogram is the dedup-health read: a heavy tail
  // means template clusters (q42 will produce giant components); all mass
  // at 0-1 means near-dup removal is surgical. Everything past the
  // memoized pairs artifact is pairs-sized + one |degrees|-row aggregate;
  // the oracle embeds q27's SQL (composition proof).
  // ---------------------------------------------------------------------
  private def q187(s: SparkSession, d: String): DataFrame = {
    val pairs = DedupOps.verifiedPairs(s, d)
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    t(s, d, "documents").select(col("doc_id"))
      .join(deg, Seq("doc_id"), "left")
      .select(coalesce(col("degree"), lit(0L)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
      .orderBy("degree")
  }
  private def q187Sql: String = {
    val pr = DedupOps.oracleSql("q27_dedup_ngram_jaccard")
    s"""WITH pr AS ($pr),
       |deg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
       |  FROM (SELECT doc_a AS doc_id FROM pr UNION ALL SELECT doc_b FROM pr)
       |  GROUP BY doc_id)
       |SELECT COALESCE(deg.degree, 0) AS degree, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM documents LEFT JOIN deg USING (doc_id)
       |GROUP BY 1 ORDER BY degree""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q188 — character-entropy quality signal (the Dolma/Gopher "gibberish"
  // gate): Shannon entropy of the per-doc character distribution,
  // H = ln n − (Σ c·ln c)/n over character counts — near-zero for
  // degenerate repetition ("aaaa…"), high for natural text. Both ln
  // instances take INTEGER arguments, so PortableLn keeps every H
  // bit-identical in DuckDB; the per-doc Σ c·ln c is a character-ordered
  // IEEE fold (alphabet-bounded buffer).
  //
  // Scale shape: one char explode into a (doc_id, ch) hash aggregation
  // (map-side combine absorbs the per-doc repetition), one doc_id-keyed
  // rollup, a LEFT join back to the corpus so zero-char docs surface with
  // H = 0 rather than vanishing (the q97/q98 row-per-doc discipline —
  // empty-string char splits differ between engines, so char rows are
  // filtered to non-empty on BOTH sides and the join restores the docs).
  // ---------------------------------------------------------------------
  private def q188(s: SparkSession, d: String): DataFrame = {
    val counts = t(s, d, "documents")
      .select(col("doc_id"), explode(split(coalesce(col("text"), lit("")), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val lnc = LmOps.PortableLn.steps("c", "c", spark = true)
      .foldLeft(counts) { case (df, (name, e)) => df.withColumn(name, expr(e)) }
    val perDoc = lnc.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_distinct_chars"),
        expr("aggregate(array_sort(collect_list(struct(ch, c, lnc)))," +
          " cast(0 as double), (a, x) -> a + cast(x.c as double) * x.lnc)").as("clnc"))
    val lnn = LmOps.PortableLn.steps("n", "n", spark = true)
      .foldLeft(perDoc) { case (df, (name, e)) => df.withColumn(name, expr(e)) }
      .withColumn("entropy", expr("lnn - clnc / cast(n as double)"))
    t(s, d, "documents").select(col("doc_id"))
      .join(lnn.select(col("doc_id"), col("n"), col("n_distinct_chars"), col("entropy")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n"), lit(0L)).as("n_chars_counted"),
        coalesce(col("n_distinct_chars"), lit(0L)).as("n_distinct_chars"),
        coalesce(col("entropy"), lit(0.0)).as("entropy"))
      .withColumn("low_entropy", col("entropy") < 1.5)
      .orderBy("doc_id")
  }
  private def q188Sql: String = {
    val (cLast, cCtes) = LmOps.lnCtes("cc0", "ce", Seq("c" -> "c"))
    val (nLast, nCtes) = LmOps.lnCtes("pd0", "ne", Seq("n" -> "n"))
    s"""WITH cc0 AS (
       |  SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT doc_id, unnest(string_split(COALESCE(text, ''), '')) AS ch
       |        FROM documents)
       |  WHERE ch <> '' GROUP BY doc_id, ch),
       |${cCtes.mkString(",\n")},
       |pd0 AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
       |    CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(CAST(c AS DOUBLE) * lnc ORDER BY ch)), (a, x) -> a + x) AS clnc
       |  FROM $cLast GROUP BY doc_id),
       |${nCtes.mkString(",\n")},
       |pd AS (SELECT doc_id, n, n_distinct_chars, lnn - clnc / CAST(n AS DOUBLE) AS entropy
       |       FROM $nLast)
       |SELECT d.doc_id,
       |  COALESCE(pd.n, 0) AS n_chars_counted,
       |  COALESCE(pd.n_distinct_chars, 0) AS n_distinct_chars,
       |  COALESCE(pd.entropy, 0e0) AS entropy,
       |  COALESCE(pd.entropy, 0e0) < 1.5 AS low_entropy
       |FROM documents d LEFT JOIN pd USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q189 — T5-style span corruption (Raffel et al. 2020 §3.1.4; the
  // denoising-objective twin of q136's FIM): replace deterministic token
  // spans with <extra_id_k> sentinels, emit (input, target) training
  // pairs. Span starts and lengths come from the portable md5 ticket of
  // (doc_id, pos) — h % 20 == 0 starts a span (≈5% of positions), length
  // h % 3 + 2 — so corruption is a pure function of the data (the q93
  // membership discipline): stable across engines, partitionings, reruns.
  //
  // Masking is SEQUENTIAL within a document (a span consumes the next
  // tokens; spans cannot overlap), so it runs as a position-ordered
  // `aggregate` fold INSIDE the row — row-local, doc-length-bounded, zero
  // shuffle beyond the output sort (the q96/q97 class). The oracle states
  // the same recurrence as WITH RECURSIVE over positions — see the
  // q189Sql scaladoc for why not list_reduce.
  // ---------------------------------------------------------------------
  private def q189(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("toks"))
      .withColumn("hs", expr(
        "transform(sequence(0, size(toks) - 1), p -> cast(conv(substring(" +
          "md5(concat(cast(doc_id as string), '|', cast(p as string))), 1, 15)," +
          " 16, 10) as bigint))"))
      .withColumn("acc", expr(
        """aggregate(
          |  zip_with(toks, hs, (t, h) -> named_struct('t', t, 'h', h)),
          |  named_struct('out', cast('' as string), 'tgt', cast('' as string),
          |    'rem', cast(0 as bigint), 'k', cast(0 as bigint),
          |    'masked', cast(0 as bigint)),
          |  (a, x) -> CASE
          |    WHEN a.rem > 0 THEN named_struct(
          |      'out', a.out,
          |      'tgt', concat(a.tgt, ' ', x.t),
          |      'rem', a.rem - 1, 'k', a.k, 'masked', a.masked + 1)
          |    WHEN x.h % 20 = 0 THEN named_struct(
          |      'out', concat(a.out, ' <extra_id_', cast(a.k as string), '>'),
          |      'tgt', concat(a.tgt, ' <extra_id_', cast(a.k as string), '> ', x.t),
          |      'rem', x.h % 3 + 1, 'k', a.k + 1, 'masked', a.masked + 1)
          |    ELSE named_struct(
          |      'out', concat(a.out, ' ', x.t),
          |      'tgt', a.tgt, 'rem', a.rem, 'k', a.k, 'masked', a.masked)
          |  END)""".stripMargin))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        col("acc.masked").as("n_masked"),
        col("acc.k").as("n_spans"),
        expr("trim(acc.out)").as("input_text"),
        expr("trim(acc.tgt)").as("target_text"))
      .orderBy("doc_id")
  }
  /** Oracle note: the natural DuckDB statement of this fold —
    * `list_reduce` over a per-doc struct list — returned the RIGHT values
    * per row in isolation but PERMUTED across rows in full-corpus runs on
    * this DuckDB build (observed at sf0.01: doc A's doc_id/n_tokens next
    * to doc B's fold result; not reproducible on synthetic minimal
    * cases). The oracle therefore states the recurrence as WITH RECURSIVE
    * over positions — one state row per (doc, step), plainly keyed by
    * doc_id at every step, immune to lambda vectorization alignment. */
  private val q189Sql =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks
      |  FROM documents),
      |tk AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
      |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t)),
      |hr AS (
      |  SELECT doc_id, pos, tok,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
      |      || CAST(pos AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM tk),
      |nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM hr GROUP BY doc_id),
      |st AS (
      |  SELECT doc_id, CAST(-1 AS BIGINT) AS pos, '' AS ot, '' AS tgt,
      |    CAST(0 AS BIGINT) AS rem, CAST(0 AS BIGINT) AS k,
      |    CAST(0 AS BIGINT) AS masked
      |  FROM nd
      |  UNION ALL
      |  SELECT s.doc_id, x.pos,
      |    CASE WHEN s.rem > 0 THEN s.ot
      |         WHEN x.h % 20 = 0 THEN s.ot || ' <extra_id_' || CAST(s.k AS VARCHAR) || '>'
      |         ELSE s.ot || ' ' || x.tok END,
      |    CASE WHEN s.rem > 0 THEN s.tgt || ' ' || x.tok
      |         WHEN x.h % 20 = 0 THEN s.tgt || ' <extra_id_' || CAST(s.k AS VARCHAR) || '> ' || x.tok
      |         ELSE s.tgt END,
      |    CASE WHEN s.rem > 0 THEN s.rem - 1
      |         WHEN x.h % 20 = 0 THEN x.h % 3 + 1 ELSE s.rem END,
      |    CASE WHEN s.rem > 0 THEN s.k
      |         WHEN x.h % 20 = 0 THEN s.k + 1 ELSE s.k END,
      |    CASE WHEN s.rem > 0 OR x.h % 20 = 0 THEN s.masked + 1 ELSE s.masked END
      |  FROM st s JOIN hr x ON x.doc_id = s.doc_id AND x.pos = s.pos + 1)
      |SELECT s.doc_id, nd.n_tokens, s.masked AS n_masked, s.k AS n_spans,
      |  trim(s.ot) AS input_text, trim(s.tgt) AS target_text
      |FROM st s JOIN nd ON nd.doc_id = s.doc_id AND s.pos = nd.n_tokens - 1
      |ORDER BY s.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q190 — hashed-feature collision audit for q135's DSIR buckets: how
  // many DISTINCT n-grams each of the B = 1024 buckets absorbs, and the
  // occupancy skew. Hashed features trade collisions for fixed width;
  // this is the table that says whether B was big enough (mean ≈
  // vocab/B, a heavy max means a hot bucket is conflating many grams).
  // One vocabulary-sized DISTINCT aggregation after the gram explode —
  // the gram census is the only corpus-proportional pass; bucket stats
  // are B-row arithmetic.
  // ---------------------------------------------------------------------
  private def q190(s: SparkSession, d: String): DataFrame = {
    val B = 1024
    val toks = t(s, d, "documents")
      .filter(trim(coalesce(col("text"), lit(""))) =!= "")
      .select(split(trim(col("text")), "\\s+").as("toks"))
    val grams = toks.select(
      explode(concat(col("toks"),
        when(size(col("toks")) >= 2, expr(
          "transform(sequence(1, size(toks) - 1), i -> concat(toks[i-1], ' ', toks[i]))"))
          .otherwise(expr("cast(array() as array<string>)")))).as("gram"))
    grams
      .groupBy(col("gram")).agg(count(lit(1)).as("occ"))
      .withColumn("bucket",
        expr(s"cast(conv(substring(md5(gram), 1, 8), 16, 10) as bigint) % $B"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_distinct_grams"),
        sum(col("occ")).as("n_occurrences"))
      .orderBy("bucket")
  }
  private val q190Sql =
    """WITH t AS (
      |  SELECT regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents WHERE trim(COALESCE(text, '')) <> ''),
      |g AS (
      |  SELECT unnest(toks) AS gram FROM t
      |  UNION ALL
      |  SELECT toks[i] || ' ' || toks[i + 1] AS gram
      |  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
      |        FROM t WHERE len(toks) >= 2)),
      |gc AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS occ FROM g GROUP BY gram)
      |SELECT ('0x' || substr(md5(gram), 1, 8))::BIGINT % 1024 AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
      |  CAST(SUM(occ) AS BIGINT) AS n_occurrences
      |FROM gc GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------------
  // q191 — per-source document-length quantiles (p10/p50/p90 token
  // counts + exact mean): the per-source length profile a mixture
  // designer reads next to q120/q171 — a source whose p90 dwarfs its p50
  // packs badly (q92) and truncates expensively (q172). Exact
  // interpolated percentiles per source (the q106 percentile/
  // quantile_cont parity); the mean divides an exact integer sum once.
  //
  // Scale note: the grouped percentile buffers one value per group
  // member — the documented wide-buffer boundary (q103's percentile
  // class); approx_percentile (q56's tolerance-oracle pattern) is the
  // swap-in when a single source outgrows an executor.
  // ---------------------------------------------------------------------
  private def q191(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .select(col("source"), wsTokens.as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        // pct-bound: grouped per source — the documented wide-buffer
        // boundary (scale note above); approx_percentile is the swap-in
        // when a single source outgrows an executor.
        expr("percentile(n_tokens, array(0.1D, 0.5D, 0.9D))").as("ps"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double")).as("mean_tokens"),
        expr("element_at(ps, 1)").as("p10"),
        expr("element_at(ps, 2)").as("p50"),
        expr("element_at(ps, 3)").as("p90"))
      .orderBy("source")
  }
  private val q191Sql =
    """WITH d AS (
      |  SELECT source, CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |g AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |    quantile_cont(n_tokens, [0.1, 0.5, 0.9]) AS ps
      |  FROM d GROUP BY source)
      |SELECT source, n_docs, total_tokens,
      |  CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_tokens,
      |  ps[1] AS p10, ps[2] AS p50, ps[3] AS p90
      |FROM g ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q193 — dedup-strategy cost estimator: the planner table that says, at
  // THIS corpus's measured stats, how many rows and bytes each dedup
  // pass's one corpus-wide shuffle moves and how many corpus passes it
  // costs. The row/byte formulas restate the engine's own audited plan
  // shapes (q26's md5 doc keys, q98's md5 line keys, q28's 4 band rows
  // per doc, q94's xxh64 8-gram index) — the 100 TB cost model made
  // explicit and queryable instead of living in scaladoc. One corpus
  // aggregation to three scalars; the strategy table is a 4-row literal
  // explode over arithmetic on those scalars.
  // ---------------------------------------------------------------------
  private def q193(s: SparkSession, d: String): DataFrame = {
    val stats = t(s, d, "documents")
      .select(wsTokens.as("tk"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("total_tokens"),
        sum(expr("(tk + 7) div 8")).as("total_lines"),
        sum(greatest(col("tk") - 7, lit(0L))).as("total_grams"))
    stats.select(explode(expr(
        """array(
          |  named_struct('strategy', 'exact_doc_md5',
          |    'shuffle_rows', n_docs, 'key_bytes', 32L, 'corpus_passes', 1L),
          |  named_struct('strategy', 'line_dedup_md5',
          |    'shuffle_rows', total_lines, 'key_bytes', 32L, 'corpus_passes', 1L),
          |  named_struct('strategy', 'minhash_lsh_bands',
          |    'shuffle_rows', n_docs * 4, 'key_bytes', 40L, 'corpus_passes', 1L),
          |  named_struct('strategy', 'substring_gram_xxh64',
          |    'shuffle_rows', total_grams, 'key_bytes', 8L, 'corpus_passes', 2L))"""
          .stripMargin)).as("x"))
      .select(col("x.strategy").as("strategy"),
        col("x.shuffle_rows").as("shuffle_rows"),
        col("x.key_bytes").as("key_bytes"),
        (col("x.shuffle_rows").cast("double") * col("x.key_bytes").cast("double")
          / lit(1048576.0)).as("est_shuffle_mb"),
        col("x.corpus_passes").as("corpus_passes"))
      .orderBy("strategy")
  }
  private val q193Sql =
    """WITH st AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(tk) AS BIGINT) AS total_tokens,
      |    CAST(SUM((tk + 7) // 8) AS BIGINT) AS total_lines,
      |    CAST(SUM(GREATEST(tk - 7, 0)) AS BIGINT) AS total_grams
      |  FROM (SELECT CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS tk
      |        FROM documents)),
      |rows_ AS (
      |  SELECT 'exact_doc_md5' AS strategy, n_docs AS shuffle_rows,
      |    CAST(32 AS BIGINT) AS key_bytes, CAST(1 AS BIGINT) AS corpus_passes FROM st
      |  UNION ALL
      |  SELECT 'line_dedup_md5', total_lines, 32, 1 FROM st
      |  UNION ALL
      |  SELECT 'minhash_lsh_bands', n_docs * 4, 40, 1 FROM st
      |  UNION ALL
      |  SELECT 'substring_gram_xxh64', total_grams, 8, 2 FROM st)
      |SELECT strategy, shuffle_rows, key_bytes,
      |  CAST(shuffle_rows AS DOUBLE) * CAST(key_bytes AS DOUBLE) / 1048576e0
      |    AS est_shuffle_mb,
      |  corpus_passes
      |FROM rows_ ORDER BY strategy""".stripMargin

  // ---------------------------------------------------------------------
  // q194 — word2vec negative-sampling table (Mikolov et al. 2013 §2.2:
  // sample negatives ∝ count^0.75): the top-100 words by frequency with
  // their damped weights and renormalized probabilities — the serving
  // table a skip-gram trainer draws from (truncated to top-K, the common
  // serving approximation; renormalization is over the emitted table).
  // count^0.75 = exp(0.75·ln count) through the PortableLn → PortableExp
  // pipeline, so every weight is bit-identical in DuckDB (a naive
  // pow(x, 0.75) is not). The probability normalizer is a rank-ordered
  // fold over the 100-row table (q143's bounded-fold class); rank itself
  // is sorted-array position — no window anywhere.
  //
  // Scale shape: ONE corpus word count (map-side absorbed) →
  // TakeOrderedAndProject(100) → 100-row arithmetic.
  // ---------------------------------------------------------------------
  private def q194(s: SparkSession, d: String): DataFrame = {
    val top = t(s, d, "documents")
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(100)
    val ranked = top
      .agg(expr("array_sort(collect_list(struct(-cnt as nc, word, cnt)))").as("xs"))
      .select(posexplode(col("xs")).as(Seq("i", "x")))
      .select((col("i") + 1).cast("long").as("rank"),
        col("x.word").as("word"), col("x.cnt").as("cnt"))
    val staged = (LmOps.PortableLn.steps("cnt", "w", spark = true) ++
      LmOps.PortableExp.steps("(75e-2 * lnw)", "ng", spark = true))
      .foldLeft(ranked) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .withColumn("weight", col("expng"))
      .localCheckpoint(true) // consumers: normalizer fold + final select
    val tot = staged.agg(
      expr("aggregate(array_sort(collect_list(struct(rank, weight)))," +
        " cast(0 as double), (a, x) -> a + x.weight)").as("total_w"))
    Scalars.withScalar(staged, tot)
      .select(col("rank"), col("word"), col("cnt"), col("weight"),
        (col("weight") / col("total_w")).as("prob"))
      .orderBy("rank")
  }
  private def q194Sql: String = {
    val (lnLast, lnC) = LmOps.lnCtes("r0", "nl", Seq("cnt" -> "w"))
    val (expLast, expC) = LmOps.expCtes(lnLast, "xp", Seq("(75e-2 * lnw)" -> "ng"))
    s"""WITH wc AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(string_split(COALESCE(text, ''), ' ')) AS word
       |        FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |r0 AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rank,
       |    word, cnt
       |  FROM (SELECT word, cnt FROM wc ORDER BY cnt DESC, word LIMIT 100)),
       |${lnC.mkString(",\n")},
       |${expC.mkString(",\n")},
       |w AS (SELECT rank, word, cnt, expng AS weight FROM $expLast),
       |tw AS (
       |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE), list(weight ORDER BY rank)),
       |    (a, x) -> a + x) AS total_w
       |  FROM w)
       |SELECT rank, word, cnt, weight,
       |  weight / (SELECT total_w FROM tw) AS prob
       |FROM w ORDER BY rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q195 — repetition-loop detection: the degenerate-generation signal
  // (model-written spam loops "a b a b a b…"; OpenWebMath/RefinedWeb both
  // strip it) — smallest full-sequence token period p ≤ 16, plus the
  // longest same-token run (q91 counts n-gram mass; this detects exact
  // PERIODICITY, which mass stats miss at low duplication). Strictly
  // row-local HOF work (O(16·len) period probe + one change-point scan);
  // the only exchange is the output sort. Spark's sequence(1, 0) DESCENDS
  // — both short-doc branches are CASE-guarded identically in the oracle
  // even where DuckDB's generate_series would degrade gracefully.
  // ---------------------------------------------------------------------
  private def q195(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("period", expr(
        """CASE WHEN n < 2 THEN 0L ELSE coalesce(array_min(filter(
          |  sequence(1, cast(least(16L, n - 1) as int)),
          |  p -> size(filter(sequence(p, cast(n as int) - 1),
          |    i -> element_at(toks, i + 1) <> element_at(toks, i - p + 1))) = 0)),
          |  0) END""".stripMargin).cast("long"))
      .withColumn("cps", expr(
        """concat(array(0),
          |  CASE WHEN n >= 2 THEN filter(sequence(1, cast(n as int) - 1),
          |    i -> element_at(toks, i + 1) <> element_at(toks, i))
          |  ELSE cast(array() as array<int>) END,
          |  array(cast(n as int)))""".stripMargin))
      .withColumn("longest_run", expr(
        """array_max(zip_with(slice(cps, 2, size(cps) - 1),
          |  slice(cps, 1, size(cps) - 1), (a, b) -> a - b))""".stripMargin)
        .cast("long"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("period"),
        col("longest_run"),
        (col("period") > 0 || col("longest_run") >= 8).as("is_loopy"))
      .orderBy("doc_id")
  }
  private val q195Sql =
    """WITH t AS (
      |  SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks,
      |    CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, n,
      |    CASE WHEN n < 2 THEN 0 ELSE COALESCE(list_min(list_filter(
      |      range(1, CAST(LEAST(16, n - 1) AS INTEGER) + 1),
      |      p -> len(list_filter(range(p, CAST(n AS INTEGER)),
      |        i -> toks[i + 1] <> toks[i - p + 1])) = 0)), 0) END AS period,
      |    list_concat(list_concat([0],
      |      CASE WHEN n >= 2 THEN list_filter(range(1, CAST(n AS INTEGER)),
      |        i -> toks[i + 1] <> toks[i]) ELSE [] END),
      |      [CAST(n AS INTEGER)]) AS cps
      |  FROM t)
      |SELECT doc_id, n AS n_tokens, CAST(period AS BIGINT) AS period,
      |  CAST(list_max(list_transform(range(2, len(cps) + 1),
      |    j -> cps[j] - cps[j - 1])) AS BIGINT) AS longest_run,
      |  (period > 0 OR list_max(list_transform(range(2, len(cps) + 1),
      |    j -> cps[j] - cps[j - 1])) >= 8) AS is_loopy
      |FROM p ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q196 — dedup-aware cross-validation folds: k-fold assignment keyed on
  // the near-dup CLUSTER's md5 ticket, not the document's — every doc in
  // a connected near-dup component lands in the SAME fold, so no
  // validation fold ever scores a near-copy of a training doc (the
  // canonical eval-leakage mistake; Lee et al. 2022 §6 measure exactly
  // this inflation). `cross_fold_edges` is the PROOF column: verified
  // near-dup edges crossing folds — zero by construction, recomputed, not
  // assumed. Composition over q42's components and q27's pairs; oracle
  // embeds both siblings' SQL.
  //
  // Scale shape: fold id is row-local ticket arithmetic on the cluster
  // key; the audit join is pairs-sized; the fold rollup is a K-row
  // aggregate behind the enforced ≤1-row scalar attach.
  // ---------------------------------------------------------------------
  private def q196(s: SparkSession, d: String): DataFrame = {
    val K = 5
    // Consumers: fold rollup + two sides of the edge audit.
    val folds = graft.SparkEntry.queries("q42_dup_clusters")(s, d)
      .select(col("doc_id"), col("cluster_id"))
      .withColumn("fold", expr(
        s"cast(conv(substring(md5(concat('f|', cast(cluster_id as string)))," +
          s" 1, 15), 16, 10) as bigint) % $K"))
      .localCheckpoint(true)
    val pairs = DedupOps.verifiedPairs(s, d).select(col("doc_a"), col("doc_b"))
    val crossEdges = pairs
      .join(folds.select(col("doc_id").as("doc_a"), col("fold").as("fa")), "doc_a")
      .join(folds.select(col("doc_id").as("doc_b"), col("fold").as("fb")), "doc_b")
      .agg(count(when(col("fa") =!= col("fb"), 1)).as("cross_fold_edges"))
    Scalars.withScalar(
        folds.groupBy(col("fold"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("cluster_id")).as("n_clusters")),
        crossEdges)
      .orderBy("fold")
  }
  private def q196Sql: String = {
    val c = PipelineOps.oracleSql("q42_dup_clusters")
    val pr = DedupOps.oracleSql("q27_dedup_ngram_jaccard")
    s"""WITH c AS ($c), pr AS ($pr),
       |f AS (
       |  SELECT doc_id, cluster_id,
       |    ('0x' || substr(md5('f|' || CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT % 5
       |      AS fold
       |  FROM c),
       |x AS (
       |  SELECT CAST(COUNT(*) FILTER (WHERE fa.fold <> fb.fold) AS BIGINT)
       |    AS cross_fold_edges
       |  FROM pr JOIN f fa ON fa.doc_id = pr.doc_a
       |          JOIN f fb ON fb.doc_id = pr.doc_b)
       |SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       |  (SELECT cross_fold_edges FROM x) AS cross_fold_edges
       |FROM f GROUP BY fold ORDER BY fold""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q197 — LLM-watermark detection (Kirchenbauer et al. 2023: a
  // watermarking sampler boosts a context-seeded "green list"; the
  // detector z-tests the green fraction against the p = 1/2 null). Green
  // membership here is the portable h60 parity of the (prev|cur) bigram
  // — the same context-seeded-hash construction, engine-exact — so
  // z = (2g − n)/√n is bit-identical in DuckDB (one correctly-rounded
  // sqrt + one division). Training corpora now screen for watermarked
  // model output; human text sits at |z| ≈ O(1), watermarked text at
  // z ≫ 4. Strictly row-local (the q96/q145 class); docs with < 2 tokens
  // surface with n = 0, z = 0.
  // ---------------------------------------------------------------------
  private def q197(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .select(col("doc_id"), split(trim(coalesce(col("text"), lit(""))), "\\s+").as("toks"))
      .withColumn("n", greatest(size(col("toks")) - 1, lit(0)).cast("long"))
      .withColumn("g", expr(
        """CASE WHEN size(toks) >= 2 THEN size(filter(sequence(1, size(toks) - 1),
          |  i -> cast(conv(substring(md5(concat(element_at(toks, i), '|',
          |    element_at(toks, i + 1))), 1, 15), 16, 10) as bigint) % 2 = 0))
          |ELSE 0 END""".stripMargin).cast("long"))
      .withColumn("green_frac", when(col("n") > 0,
        col("g").cast("double") / col("n").cast("double")).otherwise(lit(0.0)))
      .withColumn("z", when(col("n") > 0,
        (col("g") * 2 - col("n")).cast("double") / sqrt(col("n").cast("double")))
        .otherwise(lit(0.0)))
      .select(col("doc_id"), col("n").as("n_transitions"), col("g").as("n_green"),
        col("green_frac"), col("z"), (col("z") >= 4.0).as("watermark_flag"))
      .orderBy("doc_id")
  }
  private val q197Sql =
    """WITH t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    CAST(GREATEST(len(toks) - 1, 0) AS BIGINT) AS n,
      |    CAST(CASE WHEN len(toks) >= 2 THEN len(list_filter(range(1, len(toks)),
      |      i -> ('0x' || substr(md5(toks[i] || '|' || toks[i + 1]), 1, 15))::BIGINT % 2 = 0))
      |    ELSE 0 END AS BIGINT) AS g
      |  FROM t)
      |SELECT doc_id, n AS n_transitions, g AS n_green,
      |  CASE WHEN n > 0 THEN CAST(g AS DOUBLE) / CAST(n AS DOUBLE) ELSE 0e0 END
      |    AS green_frac,
      |  CASE WHEN n > 0 THEN CAST(g * 2 - n AS DOUBLE) / sqrt(CAST(n AS DOUBLE))
      |    ELSE 0e0 END AS z,
      |  (CASE WHEN n > 0 THEN CAST(g * 2 - n AS DOUBLE) / sqrt(CAST(n AS DOUBLE))
      |    ELSE 0e0 END) >= 4e0 AS watermark_flag
      |FROM g ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q198 — per-source common-prefix boilerplate probe: the longest prefix
  // shared by EVERY document of a source (scraper headers, injected
  // banners). Computed exactly in ONE aggregation pass via the
  // lexicographic min/max trick: the common prefix of all strings in a
  // set equals the common prefix of its lexicographic min and max — so
  // the corpus contributes min/max/count per source and the O(len) prefix
  // scan runs on |sources| rows. Both engines compare strings bytewise,
  // the q99 min/max parity.
  // ---------------------------------------------------------------------
  private def q198(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .select(col("source"), coalesce(col("text"), lit("")).as("txt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), min(col("txt")).as("lo"), max(col("txt")).as("hi"))
      .withColumn("m", least(length(col("lo")), length(col("hi"))))
      .withColumn("lcp_len", expr(
        """CASE WHEN m < 1 THEN 0L ELSE cast(coalesce(array_min(filter(
          |  sequence(1, m), i -> substring(lo, i, 1) <> substring(hi, i, 1))),
          |  m + 1) - 1 as bigint) END""".stripMargin))
      .select(col("source"), col("n_docs"), col("lcp_len"),
        expr("substring(lo, 1, cast(lcp_len as int))").as("lcp_text"))
      .orderBy("source")
  }
  private val q198Sql =
    """WITH g AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    MIN(COALESCE(text, '')) AS lo, MAX(COALESCE(text, '')) AS hi
      |  FROM documents GROUP BY source),
      |m AS (SELECT *, LEAST(length(lo), length(hi)) AS m FROM g),
      |l AS (
      |  SELECT *, CASE WHEN m < 1 THEN 0 ELSE COALESCE(list_min(list_filter(
      |    range(1, CAST(m AS INTEGER) + 1),
      |    i -> substr(lo, i, 1) <> substr(hi, i, 1))), m + 1) - 1 END AS lcp_len
      |  FROM m)
      |SELECT source, n_docs, CAST(lcp_len AS BIGINT) AS lcp_len,
      |  substr(lo, 1, CAST(lcp_len AS INTEGER)) AS lcp_text
      |FROM l ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q199 — training-shard manifest: per interleaved shard (q177's
  // assignment, shared via [[shardAssignments]]), the doc/token totals,
  // source count, and the source-mix entropy H = ln T − (Σ c·ln c)/T over
  // per-source doc counts — the manifest a dataloader publishes so every
  // rank can assert it reads the same mix (near-equal entropy across
  // shards IS the interleaving guarantee, stated as data). Both ln
  // instances take integers → PortableLn bit-parity; the per-shard fold
  // is source-ordered and |sources|-bounded. Oracle states the one-level
  // per-source rank (hash equality again proving the two-level
  // decomposition) plus the same staged-ln arithmetic.
  // ---------------------------------------------------------------------
  private def q199(s: SparkSession, d: String): DataFrame = {
    val docTok = t(s, d, "documents").select(col("doc_id"), wsTokens.as("tok"))
    val bySrc = shardAssignments(s, d)
      .join(docTok, "doc_id")
      .groupBy(col("shard"), col("source"))
      .agg(count(lit(1)).as("c"), sum(col("tok")).as("src_tokens"))
    val lnc = LmOps.PortableLn.steps("c", "m", spark = true)
      .foldLeft(bySrc) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
    val perShard = lnc.groupBy(col("shard"))
      .agg(sum(col("c")).as("t"),
        sum(col("src_tokens")).as("n_tokens"),
        count(lit(1)).as("n_sources"),
        expr("aggregate(array_sort(collect_list(struct(source, c, lnm)))," +
          " cast(0 as double), (a, x) -> a + cast(x.c as double) * x.lnm)").as("clnc"))
    LmOps.PortableLn.steps("t", "t", spark = true)
      .foldLeft(perShard) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .select(col("shard"), col("t").as("n_docs"), col("n_tokens"), col("n_sources"),
        expr("lnt - clnc / cast(t as double)").as("mix_entropy"))
      .orderBy("shard")
  }
  private def q199Sql: String = {
    val (cLast, cCtes) = LmOps.lnCtes("bs", "sm", Seq("c" -> "m"))
    val (tLast, tCtes) = LmOps.lnCtes("ps", "nt", Seq("t" -> "t"))
    s"""WITH params AS (
       |  SELECT GREATEST(4, 1 << (LENGTH(BIN(CAST(FLOOR(SQRT(CAST(
       |    GREATEST(COUNT(*), 4) AS DOUBLE))) AS BIGINT))) - 1)) AS s
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY md5(COALESCE(source, '') || '|' || CAST(doc_id AS VARCHAR)),
       |        doc_id) AS rnk
       |  FROM documents),
       |a AS (
       |  SELECT r.doc_id, r.source, (rnk - 1) % (SELECT s FROM params) AS shard
       |  FROM r),
       |dt AS (
       |  SELECT doc_id, CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS tok
       |  FROM documents),
       |bs AS (
       |  SELECT shard, a.source, CAST(COUNT(*) AS BIGINT) AS c,
       |    CAST(SUM(tok) AS BIGINT) AS src_tokens
       |  FROM a JOIN dt USING (doc_id) GROUP BY shard, a.source),
       |${cCtes.mkString(",\n")},
       |ps AS (
       |  SELECT shard, CAST(SUM(c) AS BIGINT) AS t,
       |    CAST(SUM(src_tokens) AS BIGINT) AS n_tokens,
       |    CAST(COUNT(*) AS BIGINT) AS n_sources,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(CAST(c AS DOUBLE) * lnm ORDER BY source)), (a, x) -> a + x) AS clnc
       |  FROM $cLast GROUP BY shard),
       |${tCtes.mkString(",\n")}
       |SELECT shard, t AS n_docs, n_tokens, n_sources,
       |  lnt - clnc / CAST(t AS DOUBLE) AS mix_entropy
       |FROM $tLast ORDER BY shard""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q200 — release datasheet: the "datasheet for the dataset" (Gebru et
  // al. 2021) a corpus release ships — one (section, metric, value)
  // table spanning scale (corpus totals), the quality funnel (q95),
  // dedup audit (q150), all three contamination modalities (q169),
  // watermark screening (q197) and the license mix (q181). Every number
  // is a reshaped read of an independently hash-verified sibling through
  // the public registry, and the oracle embeds those siblings' published
  // SQL — the repo's largest composition proof: six modules must agree
  // after reshaping, or the hash breaks.
  //
  // Scale shape: nothing new — each section is its sibling's audited
  // plan plus a ≤6-row reshape; the memoized artifacts (gateFlags,
  // verifiedPairs) mean the expensive passes are shared, not repeated.
  // ---------------------------------------------------------------------
  private def q200(s: SparkSession, d: String): DataFrame = {
    val q = graft.SparkEntry.queries
    val corpus = t(s, d, "documents")
      .agg(count(lit(1)).cast("double").as("nd"),
        sum(wsTokens).cast("double").as("nt"),
        countDistinct(col("source")).cast("double").as("ns"))
      .select(explode(expr(
        "array(named_struct('section', 'corpus', 'metric', 'n_docs', 'value', nd)," +
          " named_struct('section', 'corpus', 'metric', 'n_tokens', 'value', nt)," +
          " named_struct('section', 'corpus', 'metric', 'n_sources', 'value', ns))"))
        .as("x"))
      .select(col("x.section").as("section"), col("x.metric").as("metric"),
        col("x.value").as("value"))
    val funnel = q("q95_quality_funnel")(s, d)
      .select(lit("quality_funnel").as("section"),
        concat(lit("s"), col("stage").cast("string"), lit("_"), col("stage_name"))
          .as("metric"),
        col("docs_surviving").cast("double").as("value"))
    val dedup = q("q150_dedup_audit")(s, d)
      .agg(sum(col("exact_dup_docs")).cast("double").as("ed"),
        sum(col("dup_lines_removed")).cast("double").as("dl"),
        sum(col("total_lines")).cast("double").as("tl"))
      .select(explode(expr(
        "array(named_struct('section', 'dedup', 'metric', 'exact_dup_docs', 'value', ed)," +
          " named_struct('section', 'dedup', 'metric', 'dup_lines_removed', 'value', dl)," +
          " named_struct('section', 'dedup', 'metric', 'total_lines', 'value', tl))"))
        .as("x"))
      .select(col("x.section").as("section"), col("x.metric").as("metric"),
        col("x.value").as("value"))
    val contam = q("q169_contamination_card")(s, d)
      .select(lit("contamination").as("section"),
        concat(col("method"), lit("_rate")).as("metric"),
        col("flag_rate").as("value"))
    val wm = q("q197_watermark_detect")(s, d)
      .agg(count(when(col("watermark_flag"), 1)).cast("double").as("v"))
      .select(lit("watermark").as("section"), lit("flagged_docs").as("metric"),
        col("v").as("value"))
    val lic = q("q181_license_mix")(s, d)
      .agg((sum(when(col("is_permissive"), col("n_docs")).otherwise(0L)).cast("double")
        / nullif(sum(col("n_docs")), lit(0)).cast("double")).as("v"))
      .select(lit("license").as("section"), lit("permissive_share").as("metric"),
        col("v").as("value"))
    corpus.unionAll(funnel).unionAll(dedup).unionAll(contam).unionAll(wm).unionAll(lic)
      .orderBy("section", "metric")
  }
  private def q200Sql: String = {
    val f = PipelineOps.oracleSql("q95_quality_funnel")
    val dd = CorpusOps.oracleSql("q150_dedup_audit")
    val cc = CorpusOps.oracleSql("q169_contamination_card")
    // Direct vals, not this.oracleSql(...): the map materializes `all`,
    // whose q200 entry evaluates this method — infinite recursion.
    val wm = q197Sql
    val lm = q181Sql
    s"""WITH f AS ($f), dd AS ($dd), cc AS ($cc), wmq AS ($wm), lmq AS ($lm)
       |SELECT * FROM (
       |  SELECT 'corpus' AS section, 'n_docs' AS metric,
       |    CAST(COUNT(*) AS DOUBLE) AS value FROM documents
       |  UNION ALL
       |  SELECT 'corpus', 'n_tokens',
       |    CAST(SUM(len(string_split(COALESCE(text, ''), ' '))) AS DOUBLE)
       |  FROM documents
       |  UNION ALL
       |  SELECT 'corpus', 'n_sources', CAST(COUNT(DISTINCT source) AS DOUBLE)
       |  FROM documents
       |  UNION ALL
       |  SELECT 'quality_funnel',
       |    's' || CAST(stage AS VARCHAR) || '_' || stage_name,
       |    CAST(docs_surviving AS DOUBLE) FROM f
       |  UNION ALL
       |  SELECT 'dedup', 'exact_dup_docs', CAST(SUM(exact_dup_docs) AS DOUBLE) FROM dd
       |  UNION ALL
       |  SELECT 'dedup', 'dup_lines_removed', CAST(SUM(dup_lines_removed) AS DOUBLE) FROM dd
       |  UNION ALL
       |  SELECT 'dedup', 'total_lines', CAST(SUM(total_lines) AS DOUBLE) FROM dd
       |  UNION ALL
       |  SELECT 'contamination', method || '_rate', flag_rate FROM cc
       |  UNION ALL
       |  SELECT 'watermark', 'flagged_docs',
       |    CAST(COUNT(*) FILTER (WHERE watermark_flag) AS DOUBLE) FROM wmq
       |  UNION ALL
       |  SELECT 'license', 'permissive_share',
       |    CAST(SUM(CASE WHEN is_permissive THEN n_docs ELSE 0 END) AS DOUBLE)
       |      / CAST(nullif(SUM(n_docs), 0) AS DOUBLE) FROM lmq)
       |ORDER BY section, metric""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q201 — PSI drift between corpus snapshots: the Population Stability
  // Index over the document-length distribution, v1 = the corpus, v2 =
  // q130's deterministically-derived next crawl (md5-nibble removal). PSI
  // = Σ (p1 − p2)·ln(p1/p2) over 8 fixed log-spaced length bins, the
  // monitoring statistic release pipelines alert on (> 0.2 = major
  // shift) — beside q167's per-day χ² (event mix) and q153's KL (word
  // mix), this is the SNAPSHOT-to-snapshot distribution check.
  //
  // Exactness: Laplace-smoothed proportions keep every ln argument a
  // positive INTEGER product — ln(p1/p2) = ln((c1+1)(T2+B)) −
  // ln((c2+1)(T1+B)) — so PortableLn carries bit parity; products stay
  // under 2^63 while c·T < 9e18 (DECIMAL promotion documented at the
  // cliff, the q154 class). One corpus pass (bin id row-local, counts
  // hash-agg); everything after is 8-row arithmetic with a bin-ordered
  // fold; dense bins come from the literal bin table (the q173 LEFT-join
  // idiom), so empty bins participate with c = 0.
  // ---------------------------------------------------------------------
  private def q201(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val binExpr =
      "CASE WHEN tk < 16 THEN 0 WHEN tk < 32 THEN 1 WHEN tk < 64 THEN 2" +
        " WHEN tk < 128 THEN 3 WHEN tk < 256 THEN 4 WHEN tk < 512 THEN 5" +
        " WHEN tk < 1024 THEN 6 ELSE 7 END"
    val counts = t(s, d, "documents")
      .select(wsTokens.as("tk"),
        (substring(md5(concat(lit("v2|"), col("doc_id").cast("string"))), 1, 1) =!= "0")
          .as("in_v2"))
      .selectExpr(s"$binExpr AS bin", "in_v2")
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("c1"), count(when(col("in_v2"), 1)).as("c2"))
    val dense = (0 to 7).toDF("bin")
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("c1"), lit(0L)).as("c1"), coalesce(col("c2"), lit(0L)).as("c2"))
    val tots = dense.agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
    val staged = (LmOps.PortableLn.steps("((c1 + 1) * (t2 + 8))", "pa", spark = true) ++
      LmOps.PortableLn.steps("((c2 + 1) * (t1 + 8))", "pb", spark = true))
      .foldLeft(Scalars.withScalar(dense, tots)) { case (df, (n, e)) =>
        df.withColumn(n, expr(e))
      }
      .withColumn("p1", expr("cast(c1 + 1 as double) / cast(t1 + 8 as double)"))
      .withColumn("p2", expr("cast(c2 + 1 as double) / cast(t2 + 8 as double)"))
      .withColumn("term", expr("(p1 - p2) * (lnpa - lnpb)"))
      .localCheckpoint(true) // consumers: psi fold + final select
    val psi = staged.agg(
      expr("aggregate(array_sort(collect_list(struct(bin, term)))," +
        " cast(0 as double), (a, x) -> a + x.term)").as("psi"))
    Scalars.withScalar(staged, psi)
      .select(col("bin"), col("c1"), col("c2"), col("p1"), col("p2"), col("term"),
        col("psi"), (col("psi") > 0.2).as("major_drift"))
      .orderBy("bin")
  }
  private def q201Sql: String = {
    val (aLast, aCtes) = LmOps.lnCtes("j", "da", Seq("((c1 + 1) * (t2 + 8))" -> "pa"))
    val (bLast, bCtes) = LmOps.lnCtes(aLast, "db", Seq("((c2 + 1) * (t1 + 8))" -> "pb"))
    s"""WITH base AS (
       |  SELECT CASE WHEN tk < 16 THEN 0 WHEN tk < 32 THEN 1 WHEN tk < 64 THEN 2
       |      WHEN tk < 128 THEN 3 WHEN tk < 256 THEN 4 WHEN tk < 512 THEN 5
       |      WHEN tk < 1024 THEN 6 ELSE 7 END AS bin,
       |    substr(md5('v2|' || CAST(doc_id AS VARCHAR)), 1, 1) <> '0' AS in_v2
       |  FROM (SELECT doc_id,
       |          CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS tk
       |        FROM documents)),
       |cnt AS (
       |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS c1,
       |    CAST(COUNT(*) FILTER (WHERE in_v2) AS BIGINT) AS c2
       |  FROM base GROUP BY bin),
       |dense AS (
       |  SELECT CAST(r.i AS INTEGER) AS bin, COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
       |  FROM range(0, 8) r(i) LEFT JOIN cnt ON cnt.bin = r.i),
       |tt AS (SELECT CAST(SUM(c1) AS BIGINT) AS t1, CAST(SUM(c2) AS BIGINT) AS t2
       |       FROM dense),
       |j AS (SELECT dense.*, tt.t1, tt.t2 FROM dense CROSS JOIN tt),
       |${aCtes.mkString(",\n")},
       |${bCtes.mkString(",\n")},
       |terms AS (
       |  SELECT bin, c1, c2,
       |    CAST(c1 + 1 AS DOUBLE) / CAST(t1 + 8 AS DOUBLE) AS p1,
       |    CAST(c2 + 1 AS DOUBLE) / CAST(t2 + 8 AS DOUBLE) AS p2,
       |    (CAST(c1 + 1 AS DOUBLE) / CAST(t1 + 8 AS DOUBLE)
       |      - CAST(c2 + 1 AS DOUBLE) / CAST(t2 + 8 AS DOUBLE)) * (lnpa - lnpb) AS term
       |  FROM $bLast),
       |psi AS (
       |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE), list(term ORDER BY bin)),
       |    (a, x) -> a + x) AS psi
       |  FROM terms)
       |SELECT bin, c1, c2, p1, p2, term,
       |  (SELECT psi FROM psi) AS psi,
       |  (SELECT psi FROM psi) > 0.2 AS major_drift
       |FROM terms ORDER BY bin""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q202 — source-imbalance Gini coefficient: the single-number summary
  // of how concentrated the corpus is across sources (0 = perfectly
  // even, → 1 = one source dominates), computed over per-source token
  // masses with the sorted-rank formula G = Σ (2i − n − 1)·x_i / (n·Σx).
  // The mixture planners (q120/q171) reweight; this is the before/after
  // number their reports quote. One corpus hash agg to |sources| rows;
  // the rank-weighted sum is an ordered fold over the sorted
  // (mass, source) array inside one row (the q171 boundedness argument);
  // numerator/denominator stay INTEGERS until one final division.
  // ---------------------------------------------------------------------
  private def q202(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .select(col("source"), wsTokens.as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("mass"))
      .agg(sort_array(collect_list(struct(col("mass"),
          coalesce(col("source"), lit("")).as("source")))).as("xs"),
        count(lit(1)).as("n"), sum(col("mass")).as("total"))
      .select(col("n").as("n_sources"), col("total").as("total_tokens"),
        expr(
          """aggregate(xs, named_struct('i', 0L, 'num', 0L),
            |  (a, x) -> named_struct('i', a.i + 1,
            |    'num', a.num + (2 * (a.i + 1) - n - 1) * x.mass)).num""".stripMargin)
          .as("gini_num"))
      .select(col("n_sources"), col("total_tokens"),
        when(col("total_tokens") > 0,
          col("gini_num").cast("double")
            / (col("n_sources") * col("total_tokens")).cast("double"))
          .otherwise(lit(0.0)).as("gini"))
  }
  private val q202Sql =
    """WITH m AS (
      |  SELECT source, CAST(SUM(len(string_split(COALESCE(text, ''), ' '))) AS BIGINT)
      |    AS mass
      |  FROM documents GROUP BY source),
      |r AS (
      |  SELECT mass, CAST(ROW_NUMBER() OVER (ORDER BY mass, COALESCE(source, '')) AS BIGINT) AS i
      |  FROM m),
      |st AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
      |    CAST(SUM(mass) AS BIGINT) AS total_tokens,
      |    CAST(SUM((2 * i - (SELECT COUNT(*) FROM m) - 1) * mass) AS BIGINT) AS gnum
      |  FROM r)
      |SELECT n_sources, total_tokens,
      |  CASE WHEN total_tokens > 0
      |    THEN CAST(gnum AS DOUBLE) / CAST(n_sources * total_tokens AS DOUBLE)
      |    ELSE 0e0 END AS gini
      |FROM st""".stripMargin

  // ---------------------------------------------------------------------
  // q203 — BM25 ranked retrieval (Robertson/Spärck Jones; k1 = 1.2,
  // b = 0.75, Lucene's non-negative idf): top-10 documents per query for
  // a fixed literal query set — the retrieval baseline every
  // RAG/dedup-by-retrieval pipeline starts from. The idf keeps bit
  // parity by rationalizing to integers: ln((N + 1)/(df + 0.5)) =
  // ln(2N + 2) − ln(2df + 1), both PortableLn on positive BIGINTs; the
  // tf saturation term divides the same operands in the same order in
  // both engines.
  //
  // Scale shape: query terms are a broadcast literal; the corpus
  // contributes the (doc, term) count probe (token-keyed, semi-joined to
  // the 9-term set BEFORE aggregation) and the per-doc length table; df
  // aggregates over the probe output. The per-query top-10 is a rank
  // window partitioned by query_id — Spark 4 plants WindowGroupLimit on
  // both sides of its shuffle (the audited q07 plan), so the exchange
  // carries O(10·queries·partitions) rows, never the corpus.
  // ---------------------------------------------------------------------
  private val Bm25Queries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("fast", "scan"),
    2L -> Seq("hash", "join", "merge"),
    3L -> Seq("window", "agg"),
    4L -> Seq("slow", "stream"))

  private def q203Scored(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val qt = Bm25Queries.flatMap { case (q, ts) => ts.map(q -> _) }
      .toDF("query_id", "term")
    val toks = t(s, d, "documents")
      .select(col("doc_id"), explode(split(coalesce(col("text"), lit("")), " "))
        .as("term"))
    val dl = t(s, d, "documents")
      .select(col("doc_id"), wsTokens.as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("total_dl"))
    // (doc, term) tf over query terms only — the semi-join prunes before
    // the aggregation so the probe is 9-term-bounded, not vocabulary-wide.
    val tf = toks.join(broadcast(qt.select(col("term")).distinct()), "term")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // consumers: df aggregation + scoring join
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scoredTerms = (
      LmOps.PortableLn.steps("(2 * n + 2)", "bn", spark = true) ++
        LmOps.PortableLn.steps("(2 * df + 1)", "bd", spark = true))
      .foldLeft(
        Scalars.withScalar(
          broadcast(qt).join(tf, "term").join(broadcast(df), "term")
            .join(dl, "doc_id"),
          stats)) { case (acc, (nm, e)) => acc.withColumn(nm, expr(e)) }
      .withColumn("idf", expr("lnbn - lnbd"))
      .withColumn("tfterm", expr(
        "cast(tf as double) * (1.2e0 + 1e0) / (cast(tf as double)" +
          " + 1.2e0 * ((1e0 - 75e-2) + 75e-2 * (cast(dl as double)" +
          " * cast(n as double) / cast(total_dl as double))))"))
      .withColumn("tscore", expr("idf * tfterm"))
    val scored = scoredTerms
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        expr("aggregate(array_sort(collect_list(struct(term, tscore)))," +
          " cast(0 as double), (a, x) -> a + x.tscore)").as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", rank().over(w).cast("long"))
      .filter(col("rank") <= 10)
  }

  private def q203(s: SparkSession, d: String): DataFrame =
    q203Scored(s, d)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms_hit"),
        col("score"))
      .orderBy("query_id", "rank", "doc_id")

  private def bm25Ctes: String = {
    val qvals = Bm25Queries.flatMap { case (q, ts) =>
      ts.map(t0 => s"($q, '$t0')")
    }.mkString(", ")
    val (nLast, nC) = LmOps.lnCtes("sj", "bn", Seq("(2 * n + 2)" -> "bn"))
    val (dLast, dC) = LmOps.lnCtes(nLast, "bd", Seq("(2 * df + 1)" -> "bd"))
    s"""qt AS (SELECT CAST(query_id AS BIGINT) AS query_id, term
       |       FROM (VALUES $qvals) v(query_id, term)),
       |tk AS (
       |  SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS term
       |  FROM documents),
       |dl AS (
       |  SELECT doc_id, CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS dl
       |  FROM documents),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS total_dl
       |       FROM dl),
       |tf AS (
       |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM tk WHERE term IN (SELECT DISTINCT term FROM qt)
       |  GROUP BY doc_id, term),
       |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |sj AS (
       |  SELECT qt.query_id, tf.doc_id, qt.term, tf.tf, dfq.df, dl.dl,
       |    st.n, st.total_dl
       |  FROM qt JOIN tf USING (term) JOIN dfq USING (term)
       |    JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN st),
       |${nC.mkString(",\n")},
       |${dC.mkString(",\n")},
       |ts AS (
       |  SELECT query_id, doc_id, term,
       |    (lnbn - lnbd) * (CAST(tf AS DOUBLE) * (1.2e0 + 1e0) / (CAST(tf AS DOUBLE)
       |      + 1.2e0 * ((1e0 - 75e-2) + 75e-2 * (CAST(dl AS DOUBLE)
       |      * CAST(n AS DOUBLE) / CAST(total_dl AS DOUBLE))))) AS tscore
       |  FROM $dLast),
       |sc AS (
       |  SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(tscore ORDER BY term)),
       |      (a, x) -> a + x) AS score
       |  FROM ts GROUP BY query_id, doc_id),
       |rk AS (
       |  SELECT query_id, doc_id, n_terms_hit, score,
       |    CAST(RANK() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id)
       |      AS BIGINT) AS rank
       |  FROM sc)""".stripMargin
  }
  private def q203Sql: String =
    s"""WITH $bm25Ctes
       |SELECT query_id, rank, doc_id, n_terms_hit, score
       |FROM rk WHERE rank <= 10
       |ORDER BY query_id, rank, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q204 — NDCG@10 over the q203 ranking: graded relevance is the
  // deterministic ticket rel = h60(query|doc) % 4 (the q93 membership
  // discipline — an eval harness would join real labels through the same
  // doc_id-keyed shape), gain 2^rel − 1, discount log2(i + 1) =
  // ln(i + 1)/ln 2 with ln on integers via PortableLn. IDCG re-ranks the
  // SAME retrieved set by relevance (standard retrieved-set NDCG), so
  // everything after q203's ranking is a ≤10-row-per-query fold. The
  // oracle re-states the whole chain — q203's CTEs plus the metric.
  // ---------------------------------------------------------------------
  private def q204(s: SparkSession, d: String): DataFrame = {
    val ln2 = 6.931471805599453e-1
    val ranked = q203Scored(s, d)
      .withColumn("rel", expr(
        "cast(conv(substring(md5(concat(cast(query_id as string), '|'," +
          " cast(doc_id as string))), 1, 15), 16, 10) as bigint) % 4"))
      .withColumn("gain", expr("cast(shiftleft(cast(1 as bigint), cast(rel as int)) - 1 as double)"))
    val perQuery = ranked.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_retrieved"),
        sort_array(collect_list(struct(col("rank"), col("doc_id"), col("gain"))))
          .as("byRank"),
        sort_array(collect_list(struct((-col("gain")).as("ng"), col("doc_id"))))
          .as("byRel"))
    val discounted = perQuery
      .select(col("query_id"), col("n_retrieved"),
        posexplode(col("byRank")).as(Seq("i0", "x")),
        col("byRel"))
      .withColumn("pos", col("i0").cast("long") + 1)
      .withColumn("gain_at_rank", col("x.gain"))
      .withColumn("ideal_gain", expr("-element_at(byRel, cast(i0 as int) + 1).ng"))
    val lnStaged = LmOps.PortableLn.steps("(pos + 1)", "dg", spark = true)
      .foldLeft(discounted) { case (acc2, (nm, e)) => acc2.withColumn(nm, expr(e)) }
      .withColumn("discount", expr(s"lndg / ${ln2}"))
      .withColumn("dterm", expr("gain_at_rank / discount"))
      .withColumn("iterm", expr("ideal_gain / discount"))
    lnStaged.groupBy(col("query_id"), col("n_retrieved"))
      .agg(
        expr("aggregate(array_sort(collect_list(struct(pos, dterm)))," +
          " cast(0 as double), (a, x) -> a + x.dterm)").as("dcg"),
        expr("aggregate(array_sort(collect_list(struct(pos, iterm)))," +
          " cast(0 as double), (a, x) -> a + x.iterm)").as("idcg"))
      .select(col("query_id"), col("n_retrieved"), col("dcg"), col("idcg"),
        when(col("idcg") > 0, col("dcg") / col("idcg")).otherwise(lit(0.0))
          .as("ndcg"))
      .orderBy("query_id")
  }
  private def q204Sql: String = {
    val (dgLast, dgC) = LmOps.lnCtes("ex", "dg", Seq("(pos + 1)" -> "dg"))
    s"""WITH $bm25Ctes,
       |top AS (
       |  SELECT query_id, doc_id, rank,
       |    ('0x' || substr(md5(CAST(query_id AS VARCHAR) || '|'
       |      || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 4 AS rel
       |  FROM rk WHERE rank <= 10),
       |g AS (
       |  SELECT query_id, doc_id, rank,
       |    CAST((CAST(1 AS BIGINT) << CAST(rel AS INTEGER)) - 1 AS DOUBLE) AS gain
       |  FROM top),
       |byq AS (
       |  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_retrieved,
       |    list(gain ORDER BY rank, doc_id) AS by_rank,
       |    list(gain ORDER BY gain DESC, doc_id) AS by_rel
       |  FROM g GROUP BY query_id),
       |ex AS (
       |  SELECT query_id, n_retrieved, CAST(i AS BIGINT) AS pos,
       |    by_rank[i] AS gain_at_rank, by_rel[i] AS ideal_gain
       |  FROM byq, unnest(generate_series(1, len(by_rank))) t(i)),
       |${dgC.mkString(",\n")},
       |terms AS (
       |  SELECT query_id, n_retrieved, pos,
       |    gain_at_rank / (lndg / 6.931471805599453e-1) AS dterm,
       |    ideal_gain / (lndg / 6.931471805599453e-1) AS iterm
       |  FROM $dgLast)
       |SELECT query_id, n_retrieved,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list(dterm ORDER BY pos)),
       |    (a, x) -> a + x) AS dcg,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list(iterm ORDER BY pos)),
       |    (a, x) -> a + x) AS idcg,
       |  CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list(iterm ORDER BY pos)),
       |      (a, x) -> a + x) > 0
       |    THEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list(dterm ORDER BY pos)),
       |        (a, x) -> a + x)
       |      / list_reduce(list_prepend(CAST(0 AS DOUBLE), list(iterm ORDER BY pos)),
       |        (a, x) -> a + x)
       |    ELSE 0e0 END AS ndcg
       |FROM terms GROUP BY query_id, n_retrieved
       |ORDER BY query_id""".stripMargin
  }

  override def all: Seq[Q] = Seq(
    Q("q171_unimax_alloc", q171, Some(q171Sql)),
    Q("q172_truncation_waste", q172, Some(q172Sql)),
    Q("q173_dedup_sweep", q173, Some(q173Sql)),
    Q("q174_code_switch", q174, Some(q174Sql)),
    Q("q175_nfc_dedup", q175, Some(q175Sql)),
    Q("q176_boilerplate_lines", q176, Some(q176Sql)),
    Q("q177_interleaved_shards", q177, Some(q177Sql)),
    Q("q178_cluster_quality", q178, Some(q178Sql)),
    Q("q179_importance_ratio", q179, Some(q179Sql)),
    Q("q180_cell_quota_sample", q180, Some(q180Sql)),
    Q("q181_license_mix", q181, Some(q181Sql)),
    Q("q182_vocab_prune", q182, Some(q182Sql)),
    Q("q183_cluster_size_hist", q183, Some(q183Sql)),
    Q("q184_otsu_threshold", q184, Some(q184Sql)),
    Q("q186_cdc_chunking", q186, Some(q186Sql)),
    Q("q187_dup_graph_degree", q187, Some(q187Sql)),
    Q("q188_char_entropy", q188, Some(q188Sql)),
    Q("q189_span_corruption", q189, Some(q189Sql)),
    Q("q190_bucket_collisions", q190, Some(q190Sql)),
    Q("q191_source_length_quantiles", q191, Some(q191Sql)),
    Q("q193_dedup_cost_model", q193, Some(q193Sql)),
    Q("q194_negative_sampling", q194, Some(q194Sql)),
    Q("q195_repetition_loops", q195, Some(q195Sql)),
    Q("q196_dedup_aware_folds", q196, Some(q196Sql)),
    Q("q197_watermark_detect", q197, Some(q197Sql)),
    Q("q198_source_prefix", q198, Some(q198Sql)),
    Q("q199_shard_manifest", q199, Some(q199Sql)),
    Q("q200_release_datasheet", q200, Some(q200Sql)),
    Q("q201_psi_drift", q201, Some(q201Sql)),
    Q("q202_source_gini", q202, Some(q202Sql)),
    Q("q203_bm25_retrieval", q203, Some(q203Sql)),
    Q("q204_ndcg_eval", q204, Some(q204Sql)),
    Q("q236_zipf_fit", q236, Some(q236Sql)),
    Q("q238_heaps_fit", q238, Some(q238Sql)))

  // ---------------------------------------------------------------------
  // q236 — Zipf rank-frequency fit: the corpus-linguistics health check
  // (Zipf 1949; Piantadosi 2014's review) — OLS slope of ln(count) on
  // ln(rank) over the full vocabulary, reported as the Zipf exponent
  // s = −slope with intercept and R². Natural text sits near s ≈ 1;
  // a corpus drifting far off (template floods flatten the curve,
  // boilerplate dedup failures steepen the head) fails the release gate
  // before any model sees it. Beside q202's Gini (source concentration)
  // and q201's PSI (snapshot drift), this is the SHAPE-of-language check.
  //
  // Exactness: ranks come from [[graft.operators.GlobalRank.withRank]]
  // (the two-pass bucketed construction — no single-partition window),
  // ordered (count DESC, word ASC) so the rank assignment is a pure
  // function of the data and DuckDB's ROW_NUMBER reproduces it exactly.
  // Both ln arguments are positive integers → PortableLn; every
  // cross-row sum is dyadic fixed-point (floor(·2^26) into BIGINT —
  // the q220 discipline), so Σx, Σy, Σxy, Σx², Σy² are EXACT integers
  // and the five closed-form OLS doubles are identical in both engines.
  // Term magnitude note: |ln r · ln c| ≤ ~2 000 at any real corpus, so
  // the scaled sum stays under 2^63 to ~6·10^13 vocabulary types.
  //
  // Scale shape: one token-explode hash agg to the vocabulary-bounded
  // count table, GlobalRank's two bounded passes + per-bucket window
  // over it, one groupless dyadic aggregate. Nothing driver-side beyond
  // GlobalRank's boundary values and one 1-row collect-free card.
  //
  // Fixture honesty: the synthetic corpus's vocabulary is ~31 types
  // (the q227 note), so the shipped card reads s ≈ 0.16, R² ≈ 0.05 —
  // correctly reporting that generator text is NOT Zipfian. On natural
  // text the same card is the s ≈ 1 release gate.
  // ---------------------------------------------------------------------
  private def q236(s: SparkSession, d: String): DataFrame = {
    val vc = t(s, d, "documents")
      .select(explode(split(trim(coalesce(col("text"), lit(""))), "\\s+")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // consumers: GlobalRank's three evaluations
    val ranked = graft.operators.GlobalRank.withRank(
      vc, col("c"), descending = true, tieBreakers = Seq(col("w")), rnName = "rn")
    val dy = "67108864e0"
    val staged = (LmOps.PortableLn.steps("rn", "r", spark = true) ++
      LmOps.PortableLn.steps("c", "q", spark = true))
      .foldLeft(ranked) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
    staged.agg(
        count(lit(1)).as("n_types"),
        sum(col("c")).as("total_tokens"),
        sum(expr(s"CAST(FLOOR(lnr * $dy) AS BIGINT)")).as("sx"),
        sum(expr(s"CAST(FLOOR(lnq * $dy) AS BIGINT)")).as("sy"),
        sum(expr(s"CAST(FLOOR((lnr * lnq) * $dy) AS BIGINT)")).as("sxy"),
        sum(expr(s"CAST(FLOOR((lnr * lnr) * $dy) AS BIGINT)")).as("sxx"),
        sum(expr(s"CAST(FLOOR((lnq * lnq) * $dy) AS BIGINT)")).as("syy"))
      .withColumn("nd", col("n_types").cast("double"))
      .withColumn("fx", expr(s"CAST(sx AS DOUBLE) / $dy"))
      .withColumn("fy", expr(s"CAST(sy AS DOUBLE) / $dy"))
      .withColumn("fxy", expr(s"CAST(sxy AS DOUBLE) / $dy"))
      .withColumn("fxx", expr(s"CAST(sxx AS DOUBLE) / $dy"))
      .withColumn("fyy", expr(s"CAST(syy AS DOUBLE) / $dy"))
      .withColumn("slope",
        expr("((nd * fxy) - (fx * fy)) / ((nd * fxx) - (fx * fx))"))
      .select(col("n_types"), col("total_tokens"),
        expr("0e0 - slope").as("zipf_exponent"),
        expr("((fy - (slope * fx)) / nd)").as("intercept"),
        expr("(((nd * fxy) - (fx * fy)) * ((nd * fxy) - (fx * fy)))" +
          " / (((nd * fxx) - (fx * fx)) * ((nd * fyy) - (fy * fy)))").as("r2"))
  }
  private def q236Sql: String = {
    val dy = "67108864e0"
    val (last, ctes) = LmOps.lnCtes("rk", "zl", Seq("rn" -> "r", "c" -> "q"))
    s"""WITH tok AS (
       |  SELECT unnest(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS w
       |  FROM documents),
       |vc AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
       |rk AS MATERIALIZED (
       |  SELECT w, c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS BIGINT) AS rn
       |  FROM vc),
       |${ctes.mkString(",\n")},
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
       |    CAST(SUM(c) AS BIGINT) AS total_tokens,
       |    CAST(SUM(CAST(FLOOR(lnr * $dy) AS BIGINT)) AS BIGINT) AS sx,
       |    CAST(SUM(CAST(FLOOR(lnq * $dy) AS BIGINT)) AS BIGINT) AS sy,
       |    CAST(SUM(CAST(FLOOR((lnr * lnq) * $dy) AS BIGINT)) AS BIGINT) AS sxy,
       |    CAST(SUM(CAST(FLOOR((lnr * lnr) * $dy) AS BIGINT)) AS BIGINT) AS sxx,
       |    CAST(SUM(CAST(FLOOR((lnq * lnq) * $dy) AS BIGINT)) AS BIGINT) AS syy
       |  FROM $last),
       |fs AS (
       |  SELECT n_types, total_tokens,
       |    CAST(n_types AS DOUBLE) AS nd,
       |    CAST(sx AS DOUBLE) / $dy AS fx, CAST(sy AS DOUBLE) / $dy AS fy,
       |    CAST(sxy AS DOUBLE) / $dy AS fxy, CAST(sxx AS DOUBLE) / $dy AS fxx,
       |    CAST(syy AS DOUBLE) / $dy AS fyy
       |  FROM agg),
       |sl AS (
       |  SELECT *, ((nd * fxy) - (fx * fy)) / ((nd * fxx) - (fx * fx)) AS slope
       |  FROM fs)
       |SELECT n_types, total_tokens,
       |  0e0 - slope AS zipf_exponent,
       |  ((fy - (slope * fx)) / nd) AS intercept,
       |  (((nd * fxy) - (fx * fy)) * ((nd * fxy) - (fx * fy)))
       |    / (((nd * fxx) - (fx * fx)) * ((nd * fyy) - (fy * fy))) AS r2
       |FROM sl""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q238 — Heaps' law vocabulary-growth fit (Heaps 1978; the V(n) = K·n^β
  // companion to q236's Zipf): 10 corpus prefixes cut at doc_id deciles,
  // each with its exact token mass n_g and exact type count V_g (words
  // whose FIRST containing doc falls inside the prefix), then the log-log
  // OLS slope β with intercept ln K and R². Release use: β drifting
  // toward 1 means the corpus keeps minting new types (OCR noise, id
  // floods) — the dedup/quality gates upstream are leaking; β near 0
  // means template saturation.
  //
  // Exactness: prefix membership is the integer compare
  // doc_id ≤ (g·max_id) div 10; both stats come from ONE conditional
  // aggregate each (10 CASE sums over the doc table, 10 CASE counts over
  // the first-occurrence table — no per-prefix corpus passes); the fit is
  // q236's machinery verbatim (PortableLn on integer stats, dyadic sums,
  // closed form), guarded so a degenerate grid (<2 usable points, zero
  // x-variance) yields NULL fit columns identically in both engines.
  //
  // Scale shape: two corpus passes (token sums; explode→min first-doc
  // hash agg, vocabulary-bounded output) + 10-row arithmetic.
  // ---------------------------------------------------------------------
  private def q238(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dy = "67108864e0"
    val dt = t(s, d, "documents")
      .select(col("doc_id"),
        size(split(trim(coalesce(col("text"), lit(""))), "\\s+"))
          .cast("long").as("ntok"))
    val mx = dt.agg(max(col("doc_id")).as("mx"))
    val ntAgg = Scalars.withScalar(dt, mx).agg(
      coalesce(sum(when(expr("doc_id <= ((1 * mx) div 10)"), col("ntok"))), lit(0L)).as("nt1"),
      (2 to 10).map(g =>
        coalesce(sum(when(expr(s"doc_id <= (($g * mx) div 10)"), col("ntok"))), lit(0L))
          .as(s"nt$g")): _*)
    val vw = t(s, d, "documents")
      .select(col("doc_id"),
        explode(split(trim(coalesce(col("text"), lit(""))), "\\s+")).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
    val vtAgg = Scalars.withScalar(vw, mx).agg(
      count(when(expr("fd <= ((1 * mx) div 10)"), 1)).as("v1"),
      (2 to 10).map(g =>
        count(when(expr(s"fd <= (($g * mx) div 10)"), 1)).as(s"v$g")): _*)
    val ntCase = (1 to 10).map(g => s"WHEN $g THEN nt$g").mkString("CASE g ", " ", " END")
    val vtCase = (1 to 10).map(g => s"WHEN $g THEN v$g").mkString("CASE g ", " ", " END")
    val pts = Seq(mx, ntAgg, vtAgg)
      .foldLeft((1 to 10).toDF("g"))(Scalars.withScalar)
      .withColumn("cutoff_doc", expr("(g * mx) div 10"))
      .withColumn("n_tokens", expr(ntCase))
      .withColumn("n_types", expr(vtCase))
      .filter(col("n_tokens") >= 1 && col("n_types") >= 1)
      .select(col("g"), col("cutoff_doc"), col("n_tokens"), col("n_types"))
      .localCheckpoint(true) // consumers: fit aggregate + final card
    val staged = (LmOps.PortableLn.steps("n_tokens", "h", spark = true) ++
      LmOps.PortableLn.steps("n_types", "t", spark = true))
      .foldLeft(pts) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
    val fit = staged.agg(
        count(lit(1)).as("npts"),
        sum(expr(s"CAST(FLOOR(lnh * $dy) AS BIGINT)")).as("sx"),
        sum(expr(s"CAST(FLOOR(lnt * $dy) AS BIGINT)")).as("sy"),
        sum(expr(s"CAST(FLOOR((lnh * lnt) * $dy) AS BIGINT)")).as("sxy"),
        sum(expr(s"CAST(FLOOR((lnh * lnh) * $dy) AS BIGINT)")).as("sxx"),
        sum(expr(s"CAST(FLOOR((lnt * lnt) * $dy) AS BIGINT)")).as("syy"))
      .withColumn("nd", col("npts").cast("double"))
      .withColumn("fx", expr(s"CAST(sx AS DOUBLE) / $dy"))
      .withColumn("fy", expr(s"CAST(sy AS DOUBLE) / $dy"))
      .withColumn("fxy", expr(s"CAST(sxy AS DOUBLE) / $dy"))
      .withColumn("fxx", expr(s"CAST(sxx AS DOUBLE) / $dy"))
      .withColumn("fyy", expr(s"CAST(syy AS DOUBLE) / $dy"))
      .withColumn("dn", expr("(nd * fxx) - (fx * fx)"))
      .withColumn("beta", expr(
        "CASE WHEN npts >= 2 AND dn <> 0e0 THEN ((nd * fxy) - (fx * fy)) / dn END"))
      .withColumn("ln_k", expr(
        "CASE WHEN npts >= 2 AND dn <> 0e0 THEN (fy - (beta * fx)) / nd END"))
      .withColumn("r2", expr(
        "CASE WHEN npts >= 2 AND dn <> 0e0 AND ((nd * fyy) - (fy * fy)) <> 0e0" +
          " THEN (((nd * fxy) - (fx * fy)) * ((nd * fxy) - (fx * fy)))" +
          " / (dn * ((nd * fyy) - (fy * fy))) END"))
      .select(col("beta"), col("ln_k"), col("r2"))
    Scalars.withScalar(pts, fit)
      .select(col("g"), col("cutoff_doc"), col("n_tokens"), col("n_types"),
        col("beta"), col("ln_k"), col("r2"))
      .orderBy("g")
  }
  private def q238Sql: String = {
    val dy = "67108864e0"
    val ntCols = (1 to 10).map(g =>
      s"CAST(COALESCE(SUM(CASE WHEN d.doc_id <= (($g * m.mx) // 10) THEN d.ntok END), 0) AS BIGINT) AS nt$g")
      .mkString(",\n    ")
    val vtCols = (1 to 10).map(g =>
      s"CAST(COUNT(CASE WHEN v.fd <= (($g * m.mx) // 10) THEN 1 END) AS BIGINT) AS v$g")
      .mkString(",\n    ")
    val ntCase = (1 to 10).map(g => s"WHEN $g THEN nt$g").mkString("CASE g ", " ", " END")
    val vtCase = (1 to 10).map(g => s"WHEN $g THEN v$g").mkString("CASE g ", " ", " END")
    val (last, ctes) = LmOps.lnCtes("pts", "hl",
      Seq("n_tokens" -> "h", "n_types" -> "t"))
    s"""WITH dt AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS BIGINT) AS ntok
       |  FROM documents),
       |mx AS (SELECT CAST(MAX(doc_id) AS BIGINT) AS mx FROM dt),
       |nt AS (SELECT $ntCols FROM dt d CROSS JOIN mx m),
       |vw AS MATERIALIZED (
       |  SELECT w, CAST(MIN(doc_id) AS BIGINT) AS fd
       |  FROM (SELECT doc_id,
       |          unnest(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS w
       |        FROM documents)
       |  GROUP BY w),
       |vt AS (SELECT $vtCols FROM vw v CROSS JOIN mx m),
       |grid AS (SELECT unnest(generate_series(1, 10)) AS g),
       |pts0 AS (
       |  SELECT g, ((g * m.mx) // 10) AS cutoff_doc,
       |    $ntCase AS n_tokens, $vtCase AS n_types
       |  FROM grid CROSS JOIN mx m CROSS JOIN nt CROSS JOIN vt),
       |pts AS MATERIALIZED (
       |  SELECT * FROM pts0 WHERE n_tokens >= 1 AND n_types >= 1),
       |${ctes.mkString(",\n")},
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS npts,
       |    CAST(SUM(CAST(FLOOR(lnh * $dy) AS BIGINT)) AS BIGINT) AS sx,
       |    CAST(SUM(CAST(FLOOR(lnt * $dy) AS BIGINT)) AS BIGINT) AS sy,
       |    CAST(SUM(CAST(FLOOR((lnh * lnt) * $dy) AS BIGINT)) AS BIGINT) AS sxy,
       |    CAST(SUM(CAST(FLOOR((lnh * lnh) * $dy) AS BIGINT)) AS BIGINT) AS sxx,
       |    CAST(SUM(CAST(FLOOR((lnt * lnt) * $dy) AS BIGINT)) AS BIGINT) AS syy
       |  FROM $last),
       |fs AS (
       |  SELECT CAST(npts AS DOUBLE) AS nd, npts,
       |    CAST(sx AS DOUBLE) / $dy AS fx, CAST(sy AS DOUBLE) / $dy AS fy,
       |    CAST(sxy AS DOUBLE) / $dy AS fxy, CAST(sxx AS DOUBLE) / $dy AS fxx,
       |    CAST(syy AS DOUBLE) / $dy AS fyy
       |  FROM agg),
       |dn0 AS (SELECT *, ((nd * fxx) - (fx * fx)) AS dn FROM fs),
       |bt AS (SELECT *,
       |    CASE WHEN npts >= 2 AND dn <> 0e0
       |      THEN ((nd * fxy) - (fx * fy)) / dn END AS beta
       |  FROM dn0),
       |fit AS (
       |  SELECT beta,
       |    CASE WHEN npts >= 2 AND dn <> 0e0 THEN (fy - (beta * fx)) / nd END AS ln_k,
       |    CASE WHEN npts >= 2 AND dn <> 0e0 AND ((nd * fyy) - (fy * fy)) <> 0e0
       |      THEN (((nd * fxy) - (fx * fy)) * ((nd * fxy) - (fx * fy)))
       |        / (dn * ((nd * fyy) - (fy * fy))) END AS r2
       |  FROM bt)
       |SELECT p.g, p.cutoff_doc, p.n_tokens, p.n_types, f.beta, f.ln_k, f.r2
       |FROM pts p CROSS JOIN fit f
       |ORDER BY p.g""".stripMargin
  }
}
