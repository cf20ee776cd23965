package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-analysis / diagnostics operators — the statistics a data team
  * computes ABOUT a training corpus (rather than transforms OF it):
  *
  *  - q143: Zipf-law exponent fit (OLS on log rank / log frequency) —
  *    the standard first-order sanity check of a scraped corpus's token
  *    distribution (Zipf 1949; a slope far from −1 flags boilerplate or
  *    template contamination).
  *  - q144: CCNet-style per-language perplexity buckets (Wenzek et al.
  *    2020 §4.3 tags every doc head/middle/tail WITHIN its language by
  *    LM perplexity terciles — the exact artifact this query emits).
  *  - q145: RedPajama-V2 / Dolma-style per-document quality-signal table
  *    (one row per doc, ~12 row-local signals; downstream filters consume
  *    the signals, they don't recompute them).
  *  - q146: TF-IDF keyword extraction (top-3 terms per doc) — corpus
  *    indexing / topical-drift dashboards.
  *  - q147: cross-source duplicate-overlap matrix (shared 8-token lines
  *    per source pair + Jaccard) — the "how much does source A leak into
  *    source B" contamination audit run before mixing weights are set.
  *  - q148: Heaps'-law vocabulary-growth curve over a deterministic
  *    corpus shuffle — vocabulary saturation tells you whether more of
  *    the same source still adds new types.
  *  - q149: gate-vs-perplexity calibration — per perplexity decile, the
  *    pass rate of the five-gate funnel: the diagnostic that tells you
  *    whether rule-based gates and the model-based score agree.
  *  - q150: per-source dedup audit card — exact-dup docs and duplicate
  *    line mass rolled up by source (the report a dedup run publishes).
  *
  * Portability discipline as fleet-wide: integer counts until the last
  * step, [[LmOps.PortableLn]] for logs, single correctly-rounded double
  * ops, ordered IEEE folds for double sums, e-notation double literals.
  */
object CorpusOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** q143 — Zipf exponent via OLS over the top-100 words: regress
    * y = ln(freq) on x = ln(rank); slope ≈ −1 for natural text. The
    * rank assignment deliberately avoids a window: the top-100 rows
    * (TakeOrderedAndProject — partial per-partition top-k, no global
    * sort) collapse into ONE bounded array whose sorted position IS the
    * rank (the q148 prefix idiom). All five OLS sums are rank-ordered IEEE
    * folds, so every double is bit-reproducible in DuckDB.
    *
    * Scale shape: one corpus-proportional word-count hash aggregation
    * (map-side combine absorbs the zipf head — the very head being
    * measured); everything after operates on 100 rows. */
  private def q143(s: SparkSession, d: String): DataFrame = {
    val top = t(s, d, "documents")
      .select(explode(split(trim(coalesce(col("text"), lit(""))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(100)
    val ranked = top
      .agg(expr("array_sort(collect_list(struct(-freq as nf, w)))").as("arr"))
      .select(posexplode(col("arr")).as(Seq("i", "x")))
      .select((col("i") + 1).cast("long").as("rnk"), (-col("x.nf")).as("freq"))
    val lnCols = LmOps.PortableLn.steps("rnk", "r", spark = true) ++
      LmOps.PortableLn.steps("freq", "f", spark = true)
    val xy = lnCols.foldLeft(ranked) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .select(col("rnk"), col("lnr").as("x"), col("lnf").as("y"),
        expr("lnr * lnf").as("xy"), expr("lnr * lnr").as("x2"),
        expr("lnf * lnf").as("y2"))
    def fold(c: String) =
      expr(s"aggregate(array_sort(collect_list(struct(rnk, $c)))," +
        s" cast(0 as double), (a, t) -> a + t.$c)").as(s"s$c")
    val sums = xy.agg(count(lit(1)).as("np"),
      fold("x"), fold("y"), fold("xy"), fold("x2"), fold("y2"))
    Seq(
      "nn" -> "cast(np as double)",
      "num" -> "(nn * sxy) - (sx * sy)",
      "denx" -> "(nn * sx2) - (sx * sx)",
      "deny" -> "(nn * sy2) - (sy * sy)",
      "slope" -> "num / denx",
      "intercept" -> "(sy - (slope * sx)) / nn",
      "r2" -> "(num * num) / (denx * deny)")
      .foldLeft(sums) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .select(col("np").as("n_points"), col("slope"), col("intercept"), col("r2"))
  }
  private def q143Sql: String = {
    val (last, ctes) = LmOps.lnCtes("r", "l", Seq("rnk" -> "r", "freq" -> "f"))
    def fold(c: String) =
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list($c ORDER BY rnk)), (a, b) -> a + b) AS s$c"
    s"""WITH wt AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS w
       |        FROM documents)
       |  WHERE w <> '' GROUP BY w),
       |top AS (SELECT w, freq FROM wt ORDER BY freq DESC, w LIMIT 100),
       |r AS (SELECT freq,
       |        CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, w) AS BIGINT) AS rnk
       |      FROM top),
       |${ctes.mkString(",\n")},
       |p AS (SELECT rnk, lnr AS x, lnf AS y, lnr * lnf AS xy,
       |        lnr * lnr AS x2, lnf * lnf AS y2 FROM $last),
       |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS np,
       |        ${fold("x")}, ${fold("y")}, ${fold("xy")},
       |        ${fold("x2")}, ${fold("y2")}
       |      FROM p),
       |c1 AS (SELECT *, CAST(np AS DOUBLE) AS nn FROM s),
       |c2 AS (SELECT *, (nn * sxy) - (sx * sy) AS num,
       |         (nn * sx2) - (sx * sx) AS denx,
       |         (nn * sy2) - (sy * sy) AS deny FROM c1),
       |c3 AS (SELECT *, num / denx AS slope FROM c2)
       |SELECT np AS n_points, slope,
       |  (sy - (slope * sx)) / nn AS intercept,
       |  (num * num) / (denx * deny) AS r2
       |FROM c3""".stripMargin
  }

  /** q144 — CCNet per-language perplexity buckets (Wenzek et al. 2020
    * §4.3): within each language, rank docs by the q106 LM score
    * (higher avg log-prob = lower perplexity = better) and cut exact
    * terciles: head / middle / tail. Output is the per-doc tag table
    * CCNet ships alongside the corpus.
    *
    * Scale shape — the per-language rank is TWO-LEVEL (the q93
    * discipline): per-language boundary arrays (approx_percentile by
    * lang, localCheckpoint'ed to |langs| rows so both consumers see ONE
    * evaluation — exactness does not depend on the boundary values,
    * only on both branches seeing the SAME values), row-local bucket
    * assignment, a per-(lang, bucket) local row_number, and bucket
    * offsets from a summary-level window over per-bucket counts. No
    * window partition ever holds more than ~corpus/(|langs|·B) rows;
    * the oracle states the one-level per-language ROW_NUMBER and hash
    * equality proves the decomposition. Terciles are arithmetic NTILE
    * ([[graft.operators.GlobalRank.ntileFromRank]]), not the window
    * builtin. */
  private def q144(s: SparkSession, d: String): DataFrame = {
    val scoredLang = LmOps.lmScores(s, d).select(col("doc_id"), col("avg_logprob"))
      .join(t(s, d, "documents").select(col("doc_id"), col("lang")), Seq("doc_id"))
    val B = 16
    val fracs = (1 until B).map(i => s"${i.toDouble / B}").mkString(",")
    val bstats = scoredLang.groupBy(col("lang"))
      .agg(expr(s"approx_percentile(avg_logprob, array($fracs), 10000)").as("bs"))
      .localCheckpoint(true) // |langs| rows; MUST be single-evaluation (see scaladoc)
    val bucketed = scoredLang.join(broadcast(bstats), Seq("lang"))
      .withColumn("bkt", expr(
        "aggregate(bs, 0, (a, b) -> a + (CASE WHEN b > avg_logprob THEN 1 ELSE 0 END))"))
      .drop("bs")
    val offs = bucketed.groupBy(col("lang"), col("bkt")).agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum(col("bc")).over(
        Window.partitionBy(col("lang")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("bkt"), col("off"))
    val nl = bucketed.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val w = Window.partitionBy(col("lang"), col("bkt"))
      .orderBy(col("avg_logprob").desc, col("doc_id"))
    bucketed.join(broadcast(offs), Seq("lang", "bkt"))
      .withColumn("lang_rank", col("off") + row_number().over(w))
      .join(broadcast(nl), Seq("lang"))
      .withColumn("tercile",
        graft.operators.GlobalRank.ntileFromRank(3, "lang_rank", "n_lang").cast("int"))
      .withColumn("ppl_bucket",
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle").otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("avg_logprob"),
        col("lang_rank"), col("n_lang"), col("tercile"), col("ppl_bucket"))
      .orderBy("doc_id")
  }
  private def q144Sql: String = {
    val pq = LmOps.oracleSql("q106_lm_perplexity")
    s"""WITH pq AS ($pq),
       |sl AS (
       |  SELECT pq.doc_id, pq.avg_logprob, d.lang
       |  FROM pq JOIN documents d ON d.doc_id = pq.doc_id),
       |r AS (
       |  SELECT doc_id, lang, avg_logprob,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY avg_logprob DESC, doc_id) AS BIGINT) AS lang_rank,
       |    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n_lang
       |  FROM sl),
       |tc AS (
       |  SELECT *, CAST(
       |    CASE WHEN lang_rank <= (n_lang // 3 + 1) * (n_lang % 3)
       |         THEN (lang_rank - 1) // (n_lang // 3 + 1) + 1
       |         ELSE n_lang % 3 + (lang_rank - (n_lang % 3) * (n_lang // 3 + 1) - 1)
       |              // (n_lang // 3) + 1
       |    END AS INTEGER) AS tercile
       |  FROM r)
       |SELECT doc_id, lang, avg_logprob, lang_rank, n_lang, tercile,
       |  CASE WHEN tercile = 1 THEN 'head'
       |       WHEN tercile = 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
       |FROM tc ORDER BY doc_id""".stripMargin
  }

  /** q145 — per-document quality-signal table (RedPajama-V2 / Dolma
    * "signals" artifact): ~12 row-local signals computed in ONE
    * projection and published beside the corpus, so every downstream
    * filter reads signals instead of re-tokenizing text. Every signal
    * is integer counting plus at most one double division.
    *
    * Scale shape: strictly row-local — the whole table pipelines inside
    * the scan stage (the q96/q97 class); signal throughput scales with
    * scan parallelism and nothing else. */
  private def q145(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .withColumn("txt", coalesce(col("text"), lit("")))
      .withColumn("toks", split(trim(col("txt")), "\\s+"))
      .withColumn("n_chars_text", length(col("txt")).cast("long"))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("word_chars",
        expr("cast(length(regexp_replace(txt, '\\\\s+', '')) as bigint)"))
      .withColumn("n_unique_words",
        expr("cast(size(array_distinct(toks)) as bigint)"))
      .withColumn("n_stop_words", expr(
        "cast(size(filter(toks, x -> array_contains(" +
          "array('the','a','is','and','of','to','in'), x))) as bigint)"))
      .withColumn("n_digit_chars",
        expr("cast(regexp_count(txt, '[0-9]') as bigint)"))
      .withColumn("n_punct_chars",
        expr("cast(regexp_count(txt, '[.,;:!?]') as bigint)"))
      .withColumn("max_word_len",
        expr("cast(aggregate(toks, 0, (a, x) -> greatest(a, length(x))) as bigint)"))
      .select(col("doc_id"), col("n_chars_text"), col("n_words"),
        col("word_chars"), col("n_unique_words"), col("n_stop_words"),
        col("max_word_len"),
        expr("cast(word_chars as double) / cast(n_words as double)").as("mean_word_len"),
        expr("cast(n_unique_words as double) / cast(n_words as double)").as("frac_unique_words"),
        expr("cast(n_stop_words as double) / cast(n_words as double)").as("frac_stop_words"),
        expr("CASE WHEN n_chars_text > 0 THEN cast(n_digit_chars as double)" +
          " / cast(n_chars_text as double) ELSE 0e0 END").as("frac_digit_chars"),
        expr("CASE WHEN n_chars_text > 0 THEN cast(n_punct_chars as double)" +
          " / cast(n_chars_text as double) ELSE 0e0 END").as("frac_punct_chars"),
        expr("contains(txt, '{')").as("has_curly_brace"),
        expr("contains(lower(txt), 'lorem ipsum')").as("has_lorem_ipsum"))
      .orderBy("doc_id")
  }
  private val q145Sql =
    """WITH b AS (
      |  SELECT doc_id, COALESCE(text, '') AS txt,
      |    regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS toks
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, txt, toks,
      |    CAST(length(txt) AS BIGINT) AS n_chars_text,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(length(regexp_replace(txt, '\s+', '', 'g')) AS BIGINT) AS word_chars,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_words,
      |    CAST(len(list_filter(toks, x -> list_contains(
      |      ['the','a','is','and','of','to','in'], x))) AS BIGINT) AS n_stop_words,
      |    CAST(len(regexp_extract_all(txt, '[0-9]')) AS BIGINT) AS n_digit_chars,
      |    CAST(len(regexp_extract_all(txt, '[.,;:!?]')) AS BIGINT) AS n_punct_chars,
      |    CAST(list_reduce(list_prepend(0, list_transform(toks, x -> length(x))),
      |      (a, b) -> greatest(a, b)) AS BIGINT) AS max_word_len
      |  FROM b)
      |SELECT doc_id, n_chars_text, n_words, word_chars, n_unique_words,
      |  n_stop_words, max_word_len,
      |  CAST(word_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_word_len,
      |  CAST(n_unique_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS frac_unique_words,
      |  CAST(n_stop_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS frac_stop_words,
      |  CASE WHEN n_chars_text > 0 THEN CAST(n_digit_chars AS DOUBLE)
      |    / CAST(n_chars_text AS DOUBLE) ELSE 0e0 END AS frac_digit_chars,
      |  CASE WHEN n_chars_text > 0 THEN CAST(n_punct_chars AS DOUBLE)
      |    / CAST(n_chars_text AS DOUBLE) ELSE 0e0 END AS frac_punct_chars,
      |  contains(txt, '{') AS has_curly_brace,
      |  contains(lower(txt), 'lorem ipsum') AS has_lorem_ipsum
      |FROM c ORDER BY doc_id""".stripMargin

  /** q146 — TF-IDF keyword extraction: top-3 terms per document by
    * `tf · (ln N − ln df)`, ties broken lexically. Docs with no tokens
    * have no keywords and are absent (consistent in both engines).
    *
    * Portability: tf/df/N stay integers; the two logs go through
    * [[LmOps.PortableLn]]; the score is ONE double multiply of the
    * integer tf against the log difference.
    *
    * Scale shape: the (doc, word) count is the one corpus-proportional
    * aggregation (map-side combine); df derives from IT (vocabulary-
    * sized), not from a second corpus pass — the table is
    * localCheckpoint'ed for its two consumers. The top-3 window
    * partitions by doc_id: per-task rows = per-doc vocabulary, bounded
    * by doc length at any corpus size. */
  private def q146(s: SparkSession, d: String): DataFrame = {
    val tf = t(s, d, "documents")
      .select(col("doc_id"),
        explode(split(trim(coalesce(col("text"), lit(""))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // consumers: df aggregation + score join
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val nd = t(s, d, "documents").agg(count(lit(1)).as("nd"))
    val lnCols = LmOps.PortableLn.steps("nd", "n", spark = true) ++
      LmOps.PortableLn.steps("df", "d", spark = true)
    val scored = lnCols.foldLeft(
      graft.Scalars.withScalar(tf.join(dfreq, Seq("w")), nd)) {
      case (df, (n, e)) => df.withColumn(n, expr(e))
    }.withColumn("tfidf", expr("cast(tf as double) * (lnn - lnd)"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("w"))
    scored.withColumn("kw_rank", row_number().over(w).cast("int"))
      .filter(col("kw_rank") <= 3)
      .select(col("doc_id"), col("w").as("keyword"), col("tf"),
        col("df"), col("tfidf"), col("kw_rank"))
      .orderBy(col("doc_id"), col("kw_rank"))
  }
  private def q146Sql: String = {
    val (last, ctes) = LmOps.lnCtes("j0", "l", Seq("nd" -> "n", "df" -> "d"))
    s"""WITH tf AS (
       |  SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id,
       |          unnest(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS w
       |        FROM documents)
       |  WHERE w <> '' GROUP BY doc_id, w),
       |dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
       |j0 AS (
       |  SELECT tf.doc_id, tf.w, tf.tf, dfq.df,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS nd
       |  FROM tf JOIN dfq USING (w)),
       |${ctes.mkString(",\n")},
       |sc AS (
       |  SELECT doc_id, w, tf, df,
       |    CAST(tf AS DOUBLE) * (lnn - lnd) AS tfidf
       |  FROM $last),
       |rk AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
       |    ORDER BY tfidf DESC, w) AS INTEGER) AS kw_rank
       |  FROM sc)
       |SELECT doc_id, w AS keyword, tf, df, tfidf, kw_rank
       |FROM rk WHERE kw_rank <= 3
       |ORDER BY doc_id, kw_rank""".stripMargin
  }

  /** q147 — cross-source duplicate-overlap matrix: for every source
    * pair (a < b), the number of distinct 8-token lines (q98's line
    * definition, so the three dedup views agree on what a "line" is)
    * present in BOTH, plus per-source distinct-line counts and the
    * Jaccard overlap. This is the contamination audit a data team runs
    * BEFORE setting mixture weights — two sources sharing half their
    * lines should not both be upsampled. Pairs with zero shared lines
    * are absent (inner-join semantics, consistent in both engines).
    *
    * Scale shape: the corpus-proportional work is the distinct
    * (source, md5-line) aggregation (map-side partial distinct; the
    * 32-char digest bounds shuffle width — q94's index idiom). The
    * pair join is keyed on the line hash; per-hash fan-out is bounded
    * by |sources|², and the output aggregation is |sources|²-sized.
    * Never all-pairs over docs or lines. */
  private def q147(s: SparkSession, d: String): DataFrame = {
    val sl = t(s, d, "documents")
      .select(col("source"), split(coalesce(col("text"), lit("")), " ").as("toks"))
      .select(col("source"), explode(expr(
        "transform(sequence(0, (size(toks) - 1) div 8)," +
          " i -> array_join(slice(toks, i * 8 + 1, 8), ' '))")).as("line"))
      .select(col("source"), md5(col("line")).as("h"))
      .distinct()
      .localCheckpoint(true) // consumers: per-source counts + both join sides
    val perSrc = sl.groupBy(col("source")).agg(count(lit(1)).as("nl"))
    val pairs = sl.select(col("source").as("s1"), col("h"))
      .join(sl.select(col("source").as("s2"), col("h")), Seq("h"))
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("shared_lines"))
    pairs
      .join(broadcast(perSrc.select(col("source").as("s1"), col("nl").as("n_lines_a"))),
        Seq("s1"))
      .join(broadcast(perSrc.select(col("source").as("s2"), col("nl").as("n_lines_b"))),
        Seq("s2"))
      .select(col("s1"), col("s2"), col("shared_lines"),
        col("n_lines_a"), col("n_lines_b"),
        expr("cast(shared_lines as double)" +
          " / cast((n_lines_a + n_lines_b) - shared_lines as double)").as("jaccard"))
      .orderBy("s1", "s2")
  }
  private val q147Sql =
    """WITH tk AS (
      |  SELECT source, string_split(COALESCE(text, ''), ' ') AS toks
      |  FROM documents),
      |sl AS (
      |  SELECT DISTINCT source, md5(line) AS h
      |  FROM (SELECT source,
      |          array_to_string(toks[idx * 8 + 1 : idx * 8 + 8], ' ') AS line
      |        FROM (SELECT source, toks,
      |                unnest(range(0, (len(toks) - 1) // 8 + 1)) AS idx
      |              FROM tk))),
      |ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nl FROM sl GROUP BY source),
      |pr AS (
      |  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS shared_lines
      |  FROM sl a JOIN sl b ON a.h = b.h AND a.source < b.source
      |  GROUP BY a.source, b.source)
      |SELECT s1, s2, shared_lines, pa.nl AS n_lines_a, pb.nl AS n_lines_b,
      |  CAST(shared_lines AS DOUBLE)
      |    / CAST((pa.nl + pb.nl) - shared_lines AS DOUBLE) AS jaccard
      |FROM pr JOIN ps pa ON pa.source = pr.s1 JOIN ps pb ON pb.source = pr.s2
      |ORDER BY s1, s2""".stripMargin

  /** q148 — Heaps'-law vocabulary-growth curve: order the corpus by a
    * deterministic md5 ticket (the q100 shuffle idiom — growth curves
    * are only meaningful over a RANDOM order; insertion order confounds
    * them with source grouping), cut it into 10 equal checkpoints, and
    * report cumulative docs / tokens / distinct vocabulary at each. A
    * flattening curve says more of the corpus adds few new types — the
    * published decision signal for "collect more vs dedup harder"
    * (Heaps 1978).
    *
    * Scale shape: the rank is [[graft.operators.GlobalRank]]'s two-pass
    * bucket construction (no single-partition window); first occurrence
    * per word is `min(rank)` in ONE hash aggregation (never a window
    * over the corpus); checkpoints are integer arithmetic; the running
    * totals fold over the 10-row checkpoint table inside a bounded
    * array (no window at all — the oracle states SUM() OVER and hash
    * equality proves the fold). The ranked table is localCheckpoint'ed:
    * its two consumers would otherwise each re-run GlobalRank's
    * bucket-window shuffle. */
  private def q148(s: SparkSession, d: String): DataFrame = {
    val t0 = t(s, d, "documents").select(col("doc_id"),
      md5(concat_ws("|", lit("growth"), col("doc_id"))).as("tkt"),
      split(trim(coalesce(col("text"), lit(""))), "\\s+").as("toks"))
    val ranked = graft.operators.GlobalRank.withRank(t0,
        expr("cast(conv(substring(tkt, 1, 15), 16, 10) as bigint)"),
        descending = false, tieBreakers = Seq(col("tkt"), col("doc_id")),
        rnName = "rnk", totalName = Some("n"))
      .select(col("rnk"), col("n"), col("toks"),
        size(col("toks")).cast("long").as("n_toks"))
      .withColumn("cp", expr("((10 * rnk) + (n - 1)) div n"))
      .localCheckpoint(true) // consumers: doc-level rollup + word explode
    val docLevel = ranked.groupBy(col("cp")).agg(
      count(lit(1)).as("docs_added"), sum(col("n_toks")).as("tokens_added"))
    val words = ranked.select(col("rnk"), col("n"), explode(col("toks")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(min(col("rnk")).as("mr"), max(col("n")).as("nn"))
      .select(expr("((10 * mr) + (nn - 1)) div nn").as("cp"))
      .groupBy(col("cp")).agg(count(lit(1)).as("words_added"))
    val joined = docLevel.join(words, Seq("cp"), "left")
      .select(col("cp"), col("docs_added"), col("tokens_added"),
        coalesce(col("words_added"), lit(0L)).as("words_added"))
    joined
      .agg(expr("array_sort(collect_list(" +
        "struct(cp, docs_added, tokens_added, words_added)))").as("arr"))
      .select(explode(expr(
        "transform(arr, (x, i) -> struct(" +
          " x.cp as checkpoint_decile," +
          " aggregate(slice(arr, 1, i + 1), cast(0 as bigint)," +
          "   (a, y) -> a + y.docs_added) as docs_seen," +
          " aggregate(slice(arr, 1, i + 1), cast(0 as bigint)," +
          "   (a, y) -> a + y.tokens_added) as tokens_seen," +
          " aggregate(slice(arr, 1, i + 1), cast(0 as bigint)," +
          "   (a, y) -> a + y.words_added) as vocab_size," +
          " x.words_added as new_words))")).as("r"))
      .select(col("r.checkpoint_decile").as("checkpoint_decile"),
        col("r.docs_seen").as("docs_seen"),
        col("r.tokens_seen").as("tokens_seen"),
        col("r.vocab_size").as("vocab_size"),
        col("r.new_words").as("new_words"))
      .withColumn("heaps_ratio",
        expr("cast(vocab_size as double) / cast(tokens_seen as double)"))
      .orderBy("checkpoint_decile")
  }
  private val q148Sql =
    """WITH t0 AS (
      |  SELECT doc_id, md5('growth' || '|' || CAST(doc_id AS VARCHAR)) AS tkt,
      |    regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS toks
      |  FROM documents),
      |r AS (
      |  SELECT toks, CAST(len(toks) AS BIGINT) AS n_toks,
      |    CAST(ROW_NUMBER() OVER (ORDER BY tkt, doc_id) AS BIGINT) AS rnk,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n
      |  FROM t0),
      |rc AS (SELECT *, ((10 * rnk) + (n - 1)) // n AS cp FROM r),
      |dl AS (
      |  SELECT cp, CAST(COUNT(*) AS BIGINT) AS docs_added,
      |    CAST(SUM(n_toks) AS BIGINT) AS tokens_added
      |  FROM rc GROUP BY cp),
      |wf AS (
      |  SELECT w, MIN(rnk) AS mr, MAX(n) AS nn
      |  FROM (SELECT rnk, n, unnest(toks) AS w FROM rc)
      |  WHERE w <> '' GROUP BY w),
      |wc AS (
      |  SELECT cp, CAST(COUNT(*) AS BIGINT) AS words_added
      |  FROM (SELECT ((10 * mr) + (nn - 1)) // nn AS cp FROM wf) GROUP BY cp),
      |j AS (
      |  SELECT dl.cp, dl.docs_added, dl.tokens_added,
      |    COALESCE(wc.words_added, CAST(0 AS BIGINT)) AS words_added
      |  FROM dl LEFT JOIN wc ON wc.cp = dl.cp),
      |cum AS (
      |  SELECT cp AS checkpoint_decile,
      |    CAST(SUM(docs_added) OVER (ORDER BY cp) AS BIGINT) AS docs_seen,
      |    CAST(SUM(tokens_added) OVER (ORDER BY cp) AS BIGINT) AS tokens_seen,
      |    CAST(SUM(words_added) OVER (ORDER BY cp) AS BIGINT) AS vocab_size,
      |    words_added AS new_words
      |  FROM j)
      |SELECT *, CAST(vocab_size AS DOUBLE) / CAST(tokens_seen AS DOUBLE)
      |  AS heaps_ratio
      |FROM cum ORDER BY checkpoint_decile""".stripMargin

  /** q149 — gate-vs-perplexity calibration: cut the corpus into exact
    * perplexity deciles (decile 1 = lowest avg log-prob = worst) and
    * report the five-gate funnel's pass rate per decile. Rule gates and
    * model scores measuring quality independently SHOULD correlate —
    * this is the reliability diagram that says whether they do, and
    * where to move thresholds (the CCNet paper's fig. 3 analysis).
    * Composes two memoized artifacts: [[LmOps.lmScores]] and
    * [[PipelineOps.gateFlags]] — the production cost structure (scores
    * and verdicts are frozen tables, the calibration is one join).
    *
    * Scale shape: GlobalRank's two-pass decile (no single-partition
    * window), one doc_id-keyed join, one 10-row aggregation; min/max
    * of doubles are order-independent, so no fold discipline needed. */
  private def q149(s: SparkSession, d: String): DataFrame = {
    val scored = LmOps.lmScores(s, d).select(col("doc_id"), col("avg_logprob"))
    val dec = graft.operators.GlobalRank.withRank(scored, col("avg_logprob"),
        descending = false, tieBreakers = Seq(col("doc_id")),
        rnName = "rnk", totalName = Some("n"))
      .withColumn("ppl_decile",
        graft.operators.GlobalRank.ntileFromRank(10, "rnk", "n").cast("int"))
    dec.join(PipelineOps.gateFlags(s, d), Seq("doc_id"))
      .groupBy(col("ppl_decile"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("l") && col("g") && col("r") && col("c") && col("u"), 1))
          .as("n_pass_all"),
        min(col("avg_logprob")).as("min_logprob"),
        max(col("avg_logprob")).as("max_logprob"))
      .withColumn("pass_rate",
        expr("cast(n_pass_all as double) / cast(n_docs as double)"))
      .orderBy("ppl_decile")
  }
  private def q149Sql: String = {
    val pq = LmOps.oracleSql("q106_lm_perplexity")
    s"""WITH pq AS ($pq),
       |${PipelineOps.gateCtesSql},
       |rr AS (
       |  SELECT doc_id, avg_logprob,
       |    CAST(ROW_NUMBER() OVER (ORDER BY avg_logprob, doc_id) AS BIGINT) AS rnk,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS n
       |  FROM pq),
       |dcl AS (
       |  SELECT doc_id, avg_logprob, CAST(
       |    CASE WHEN rnk <= (n // 10 + 1) * (n % 10)
       |         THEN (rnk - 1) // (n // 10 + 1) + 1
       |         ELSE n % 10 + (rnk - (n % 10) * (n // 10 + 1) - 1)
       |              // (n // 10) + 1
       |    END AS INTEGER) AS ppl_decile
       |  FROM rr),
       |fl AS (
       |  SELECT d.doc_id,
       |    (${PipelineOps.gateConjunctionSql}) AS pass
       |  FROM documents d
       |  ${PipelineOps.gateJoinsSql}),
       |gg AS (
       |  SELECT ppl_decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(COUNT(*) FILTER (WHERE pass) AS BIGINT) AS n_pass_all,
       |    MIN(avg_logprob) AS min_logprob, MAX(avg_logprob) AS max_logprob
       |  FROM dcl JOIN fl USING (doc_id) GROUP BY ppl_decile)
       |SELECT ppl_decile, n_docs, n_pass_all, min_logprob, max_logprob,
       |  CAST(n_pass_all AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pass_rate
       |FROM gg ORDER BY ppl_decile""".stripMargin
  }

  /** q150 — per-source dedup audit card: the report a dedup run
    * publishes — per source, how many docs are exact duplicates
    * (q26's keep-first semantics) and what fraction of its 8-token
    * lines a corpus-wide line dedup (q98) removes. Sources with high
    * shares are template-heavy; mixture weights get set AFTER this
    * table, not before. The oracle embeds the siblings' published SQL
    * as CTEs (the q95 composition-proof pattern).
    *
    * Scale shape: both inputs are already-audited corpus passes
    * (q26's norm-keyed window, q98's md5-line aggregation); this adds
    * two doc_id-keyed joins and one |sources|-row aggregation. */
  private def q150(s: SparkSession, d: String): DataFrame = {
    val q = graft.SparkEntry.queries
    val exact = q("q26_dedup_exact")(s, d).select(col("doc_id"), col("is_dup"))
    val lines = q("q98_line_dedup")(s, d)
      .select(col("doc_id"), col("n_lines"), col("n_removed"))
    t(s, d, "documents").select(col("doc_id"), col("source"))
      .join(exact, Seq("doc_id"), "left")
      .join(lines, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(coalesce(col("is_dup"), lit(false)), 1)).as("exact_dup_docs"),
        sum(coalesce(col("n_lines"), lit(0L))).as("total_lines"),
        sum(coalesce(col("n_removed"), lit(0L))).as("dup_lines_removed"))
      .withColumn("exact_dup_share",
        expr("cast(exact_dup_docs as double) / cast(n_docs as double)"))
      .withColumn("line_dup_share", expr(
        "CASE WHEN total_lines > 0 THEN cast(dup_lines_removed as double)" +
          " / cast(total_lines as double) ELSE 0e0 END"))
      .orderBy("source")
  }
  private def q150Sql: String = {
    val eq = DedupOps.oracleSql("q26_dedup_exact")
    val lq = LineOps.oracleSql("q98_line_dedup")
    s"""WITH eq AS ($eq), lnq AS ($lq),
       |b AS (
       |  SELECT d.source, eq.is_dup, lnq.n_lines, lnq.n_removed
       |  FROM documents d
       |  LEFT JOIN eq ON eq.doc_id = d.doc_id
       |  LEFT JOIN lnq ON lnq.doc_id = d.doc_id),
       |g AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(COUNT(*) FILTER (WHERE COALESCE(is_dup, false)) AS BIGINT)
       |      AS exact_dup_docs,
       |    CAST(SUM(COALESCE(n_lines, 0)) AS BIGINT) AS total_lines,
       |    CAST(SUM(COALESCE(n_removed, 0)) AS BIGINT) AS dup_lines_removed
       |  FROM b GROUP BY source)
       |SELECT source, n_docs, exact_dup_docs, total_lines, dup_lines_removed,
       |  CAST(exact_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS exact_dup_share,
       |  CASE WHEN total_lines > 0 THEN CAST(dup_lines_removed AS DOUBLE)
       |    / CAST(total_lines AS DOUBLE) ELSE 0e0 END AS line_dup_share
       |FROM g ORDER BY source""".stripMargin
  }

  /** q151 — PII span scan over document text (the Dolma/Presidio-style
    * detect-and-redact pass, beside q41's events-payload scrubbing):
    * per-doc counts of four pattern families (emails, IPv4, phone-like
    * digit runs, ≥9-digit identifiers) plus the redacted text with
    * typed placeholders. Replacement ORDER is fixed (email → ip →
    * phone → long-id) and identical in both engines, so overlapping
    * matches resolve identically.
    *
    * The patterns use only the regex subset Java and RE2 agree on
    * (explicit classes, `\d`, `\b`, bounded quantifiers — no lookaround,
    * no backreferences). Scale shape: strictly row-local, the q96/q145
    * class — zero shuffles beyond the output sort. */
  private def q151(s: SparkSession, d: String): DataFrame = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\+?\\d[\\d -]{7,}\\d"
    val longId = "\\b\\d{9,}\\b"
    t(s, d, "documents")
      .withColumn("txt", coalesce(col("text"), lit("")))
      .select(col("doc_id"),
        regexp_count(col("txt"), lit(email)).cast("long").as("n_emails"),
        regexp_count(col("txt"), lit(ipv4)).cast("long").as("n_ipv4"),
        regexp_count(col("txt"), lit(phone)).cast("long").as("n_phones"),
        regexp_count(col("txt"), lit(longId)).cast("long").as("n_long_ids"),
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(col("txt"),
          email, "<EMAIL>"), ipv4, "<IP>"), phone, "<PHONE>"), longId, "<ID>")
          .as("text_redacted"))
      .withColumn("pii_total",
        expr("((n_emails + n_ipv4) + n_phones) + n_long_ids"))
      .orderBy("doc_id")
  }
  private val q151Sql =
    """WITH b AS (SELECT doc_id, COALESCE(text, '') AS txt FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(txt,
      |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(txt,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
      |  CAST(len(regexp_extract_all(txt, '\+?\d[\d -]{7,}\d')) AS BIGINT) AS n_phones,
      |  CAST(len(regexp_extract_all(txt, '\b\d{9,}\b')) AS BIGINT) AS n_long_ids,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(txt,
      |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
      |    '\+?\d[\d -]{7,}\d', '<PHONE>', 'g'),
      |    '\b\d{9,}\b', '<ID>', 'g') AS text_redacted,
      |  CAST(((len(regexp_extract_all(txt,
      |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
      |    + len(regexp_extract_all(txt, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')))
      |    + len(regexp_extract_all(txt, '\+?\d[\d -]{7,}\d')))
      |    + len(regexp_extract_all(txt, '\b\d{9,}\b')) AS BIGINT) AS pii_total
      |FROM b ORDER BY doc_id""".stripMargin

  /** q152 — encoding-health signals (the mojibake/corruption gate a web
    * pipeline runs before any text analysis — Dolma drops docs with
    * replacement characters; CCNet's cleaning assumes valid UTF-8):
    * per-doc counts of U+FFFD replacement chars, C0/C1-range control
    * chars, the printable-ASCII fraction, non-ASCII count, and a BOM
    * flag. Character classes use explicit hex ranges (the Java/RE2
    * common subset); counts are UTF-16-unit vs codepoint identical
    * because the corpus (and the fuzz gate) stays inside the BMP.
    *
    * Scale shape: strictly row-local, zero shuffles. */
  private def q152(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .withColumn("txt", coalesce(col("text"), lit("")))
      .withColumn("n_chars_text", length(col("txt")).cast("long"))
      .select(col("doc_id"), col("n_chars_text"),
        regexp_count(col("txt"), lit("�")).cast("long").as("n_replacement"),
        regexp_count(col("txt"), lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"))
          .cast("long").as("n_control"),
        regexp_count(col("txt"), lit("[^\\x00-\\x7F]")).cast("long").as("n_non_ascii"),
        regexp_count(col("txt"), lit("[ -~]")).cast("long").as("n_printable_ascii"),
        expr("startswith(txt, '﻿')").as("has_bom"))
      .withColumn("frac_printable_ascii", expr(
        "CASE WHEN n_chars_text > 0 THEN cast(n_printable_ascii as double)" +
          " / cast(n_chars_text as double) ELSE 1e0 END"))
      .withColumn("is_clean", expr(
        "n_replacement = 0 AND n_control = 0 AND NOT has_bom"))
      .orderBy("doc_id")
  }
  private val q152Sql =
    s"""WITH b AS (SELECT doc_id, COALESCE(text, '') AS txt FROM documents),
       |c AS (
       |  SELECT doc_id, CAST(length(txt) AS BIGINT) AS n_chars_text,
       |    CAST(len(regexp_extract_all(txt, '�')) AS BIGINT) AS n_replacement,
       |    CAST(len(regexp_extract_all(txt,
       |      '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]')) AS BIGINT) AS n_control,
       |    CAST(len(regexp_extract_all(txt, '[^\\x00-\\x7F]')) AS BIGINT) AS n_non_ascii,
       |    CAST(len(regexp_extract_all(txt, '[ -~]')) AS BIGINT) AS n_printable_ascii,
       |    starts_with(txt, '﻿') AS has_bom
       |  FROM b)
       |SELECT doc_id, n_chars_text, n_replacement, n_control, n_non_ascii,
       |  n_printable_ascii, has_bom,
       |  CASE WHEN n_chars_text > 0 THEN CAST(n_printable_ascii AS DOUBLE)
       |    / CAST(n_chars_text AS DOUBLE) ELSE 1e0 END AS frac_printable_ascii,
       |  n_replacement = 0 AND n_control = 0 AND NOT has_bom AS is_clean
       |FROM c ORDER BY doc_id""".stripMargin

  /** q153 — per-source KL divergence from the corpus word distribution:
    * `D(src ‖ corpus) = Σ_{w∈src} (c_sw/c_s)·(ln c_sw − ln c_s − ln c_w
    * + ln c)` over the source's own vocabulary (p and q are both
    * positive there, so no smoothing is needed and Σp = 1 exactly).
    * This is the domain-distinctiveness diagnostic mixture designers
    * read next to q120's share report and q147's overlap matrix: a
    * source with near-zero KL is "more of the same corpus"; a high-KL
    * source carries distribution mass the mixture doesn't have yet
    * (DoReMi and the Pile report exactly this per-domain divergence).
    *
    * Portability: all four ln arguments are integer counts
    * ([[LmOps.PortableLn]]); each term is one division and one multiply;
    * the per-source sum is a w-ordered IEEE fold.
    *
    * Scale shape: ONE corpus-proportional (source, word) hash
    * aggregation (checkpointed for its three consumers); source totals
    * and corpus word counts aggregate over IT (vocabulary-sized). The
    * fold buffers one term per source-vocabulary entry — the documented
    * wide-buffer boundary (q103's percentile class); swap in a two-level
    * chunked fold if source vocabularies outgrow an aggregation buffer
    * at 100 TB. */
  private def q153(s: SparkSession, d: String): DataFrame = {
    val wc = t(s, d, "documents")
      .select(col("source"),
        explode(split(trim(coalesce(col("text"), lit(""))), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // consumers: source totals + corpus word counts + terms
    val srcTot = wc.groupBy(col("source")).agg(sum(col("cnt")).as("st"),
      count(lit(1)).as("src_vocab"))
    val corpusW = wc.groupBy(col("w")).agg(sum(col("cnt")).as("cw"))
    val corpusTot = wc.agg(sum(col("cnt")).as("ct"))
    val joined = graft.Scalars.withScalar(
      wc.join(srcTot, Seq("source")).join(corpusW, Seq("w")), corpusTot)
    val lnCols = LmOps.PortableLn.steps("cnt", "a", spark = true) ++
      LmOps.PortableLn.steps("st", "b", spark = true) ++
      LmOps.PortableLn.steps("cw", "c", spark = true) ++
      LmOps.PortableLn.steps("ct", "d", spark = true)
    lnCols.foldLeft(joined) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .withColumn("term", expr(
        "(cast(cnt as double) / cast(st as double))" +
          " * (((lna - lnb) - lnc) + lnd)"))
      .groupBy(col("source"))
      .agg(max(col("st")).as("n_words"), max(col("src_vocab")).as("src_vocab"),
        expr("aggregate(array_sort(collect_list(struct(w, term)))," +
          " cast(0 as double), (a, x) -> a + x.term)").as("kl_from_corpus"))
      .orderBy("source")
  }
  private def q153Sql: String = {
    val (last, ctes) = LmOps.lnCtes("j0", "l",
      Seq("cnt" -> "a", "st" -> "b", "cw" -> "c", "ct" -> "d"))
    s"""WITH wc AS (
       |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT source,
       |          unnest(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS w
       |        FROM documents)
       |  WHERE w <> '' GROUP BY source, w),
       |stt AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS st,
       |          CAST(COUNT(*) AS BIGINT) AS src_vocab
       |        FROM wc GROUP BY source),
       |cwt AS (SELECT w, CAST(SUM(cnt) AS BIGINT) AS cw FROM wc GROUP BY w),
       |ctt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS ct FROM wc),
       |j0 AS (
       |  SELECT wc.source, wc.w, wc.cnt, stt.st, stt.src_vocab, cwt.cw,
       |    (SELECT ct FROM ctt) AS ct
       |  FROM wc JOIN stt USING (source) JOIN cwt USING (w)),
       |${ctes.mkString(",\n")},
       |tm AS (
       |  SELECT source, w, st, src_vocab,
       |    (CAST(cnt AS DOUBLE) / CAST(st AS DOUBLE))
       |      * (((lna - lnb) - lnc) + lnd) AS term
       |  FROM $last)
       |SELECT source, CAST(MAX(st) AS BIGINT) AS n_words,
       |  CAST(MAX(src_vocab) AS BIGINT) AS src_vocab,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE), list(term ORDER BY w)),
       |    (a, b) -> a + b) AS kl_from_corpus
       |FROM tm GROUP BY source ORDER BY source""".stripMargin
  }

  /** q154 — exact correlation matrix over the INTEGER quality signals
    * (six pairs from q145's count columns): Pearson r from integer
    * second moments — Σx, Σy, Σxy, Σx², Σy² accumulate as BIGINTs, so
    * they are EXACT and order-independent (no fold discipline needed;
    * the q79 decimal-moments move, integer edition), and the final
    * r = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)) is four
    * correctly-rounded double ops + two IEEE sqrts, bit-identical in
    * both engines. Highly-correlated signal pairs are redundant gates —
    * this is q132's overlap diagnostic at the signal level.
    *
    * Scale shape: ONE row-local projection + ONE groupless aggregation
    * (30 integer sums); the 6-row matrix is built by exploding a
    * literal-bounded array. Moment magnitude: Σx² ≤ n·max², ~1e13 at
    * sf0.1 — promote to DECIMAL(38,0) (Num.scala) at trillion-doc
    * scale. */
  private def q154(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "documents")
      .withColumn("txt", coalesce(col("text"), lit("")))
      .withColumn("toks", split(trim(col("txt")), "\\s+"))
      .select(
        length(col("txt")).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_words"),
        expr("cast(size(array_distinct(toks)) as bigint)").as("n_unique"),
        expr("cast(size(filter(toks, x -> array_contains(" +
          "array('the','a','is','and','of','to','in'), x))) as bigint)").as("n_stop"))
    val pairs = Seq(("n_words", "n_unique"), ("n_words", "n_stop"),
      ("n_words", "n_chars"), ("n_unique", "n_stop"),
      ("n_unique", "n_chars"), ("n_stop", "n_chars"))
    val moments = base.agg(count(lit(1)).as("n"),
      pairs.zipWithIndex.flatMap { case ((x, y), i) =>
        Seq(sum(col(x)).as(s"sx$i"), sum(col(y)).as(s"sy$i"),
          sum(col(x) * col(y)).as(s"sxy$i"),
          sum(col(x) * col(x)).as(s"sx2$i"),
          sum(col(y) * col(y)).as(s"sy2$i"))
      }: _*)
    // nullif guard: a zero-variance signal (possible on degenerate
    // corpora — every doc identical) makes Pearson r 0/0; it is
    // UNDEFINED there, so both engines emit NULL instead of ANSI-erroring
    // (Spark) vs inf-ing (DuckDB). Tiny-corpus gate regression.
    val rows = pairs.zipWithIndex.map { case ((x, y), i) =>
      s"struct('$x' as sig_a, '$y' as sig_b, n as n_docs," +
        s" (cast(n as double) * cast(sxy$i as double)" +
        s"   - (cast(sx$i as double) * cast(sy$i as double)))" +
        s" / nullif(sqrt(cast(n as double) * cast(sx2$i as double)" +
        s"      - (cast(sx$i as double) * cast(sx$i as double)))" +
        s"    * sqrt(cast(n as double) * cast(sy2$i as double)" +
        s"      - (cast(sy$i as double) * cast(sy$i as double))), 0e0) as pearson_r)"
    }.mkString(", ")
    moments.select(explode(expr(s"array($rows)")).as("r"))
      .select(col("r.sig_a"), col("r.sig_b"), col("r.n_docs"), col("r.pearson_r"))
      .orderBy("sig_a", "sig_b")
  }
  private def q154Sql: String = {
    val pairs = Seq(("n_words", "n_unique"), ("n_words", "n_stop"),
      ("n_words", "n_chars"), ("n_unique", "n_stop"),
      ("n_unique", "n_chars"), ("n_stop", "n_chars"))
    val moments = pairs.zipWithIndex.map { case ((x, y), i) =>
      s"CAST(SUM($x) AS BIGINT) AS sx$i, CAST(SUM($y) AS BIGINT) AS sy$i," +
        s" CAST(SUM($x * $y) AS BIGINT) AS sxy$i," +
        s" CAST(SUM($x * $x) AS BIGINT) AS sx2$i," +
        s" CAST(SUM($y * $y) AS BIGINT) AS sy2$i"
    }.mkString(",\n    ")
    val rows = pairs.zipWithIndex.map { case ((x, y), i) =>
      s"""SELECT '$x' AS sig_a, '$y' AS sig_b, n AS n_docs,
         |  (CAST(n AS DOUBLE) * CAST(sxy$i AS DOUBLE)
         |    - (CAST(sx$i AS DOUBLE) * CAST(sy$i AS DOUBLE)))
         |  / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sx2$i AS DOUBLE)
         |      - (CAST(sx$i AS DOUBLE) * CAST(sx$i AS DOUBLE)))
         |    * sqrt(CAST(n AS DOUBLE) * CAST(sy2$i AS DOUBLE)
         |      - (CAST(sy$i AS DOUBLE) * CAST(sy$i AS DOUBLE))), 0e0) AS pearson_r
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH b AS (
       |  SELECT CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars,
       |    CAST(len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+'))
       |      AS BIGINT) AS n_words,
       |    CAST(len(list_distinct(regexp_split_to_array(trim(COALESCE(text, '')),
       |      '\\s+'))) AS BIGINT) AS n_unique,
       |    CAST(len(list_filter(regexp_split_to_array(trim(COALESCE(text, '')),
       |      '\\s+'), x -> list_contains(['the','a','is','and','of','to','in'], x)))
       |      AS BIGINT) AS n_stop
       |  FROM documents),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    $moments
       |  FROM b)
       |SELECT * FROM ($rows) ORDER BY sig_a, sig_b""".stripMargin
  }

  /** q155 — contrastive view generation (Contriever / SimCSE-style
    * independent cropping, Izacard et al. 2022 §3.1: two random crops
    * of the same document form a positive pair for contrastive
    * embedding pretraining). Crop length L = ⌈n/2⌉; each view's start
    * comes from an independent md5 ticket mod (n − L + 1) — the q136
    * deterministic-augmentation idiom, so both engines and every rerun
    * produce identical pairs. `overlap_tokens` (intersection of the two
    * crop ranges) rides along: curricula sort pairs by overlap
    * (low-overlap pairs are the hard positives). Docs with < 2 tokens
    * are passed over (no pair exists).
    *
    * Scale shape: strictly row-local — ticket arithmetic + two slices
    * per row, zero shuffles. */
  private def q155(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .select(col("doc_id"), split(trim(coalesce(col("text"), lit(""))), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")).cast("bigint"))
      .filter(col("n") >= 2)
      .withColumn("len_crop", expr("(n + 1) div 2"))
      .withColumn("t1", expr(
        "cast(conv(substring(md5(concat_ws('|', 'view1', doc_id)), 1, 15), 16, 10) as bigint)"))
      .withColumn("t2", expr(
        "cast(conv(substring(md5(concat_ws('|', 'view2', doc_id)), 1, 15), 16, 10) as bigint)"))
      .withColumn("start_a", expr("t1 % ((n - len_crop) + 1)"))
      .withColumn("start_b", expr("t2 % ((n - len_crop) + 1)"))
      .select(col("doc_id"), col("n").as("n_tokens"), col("len_crop"),
        col("start_a"), col("start_b"),
        expr("array_join(slice(toks, cast(start_a as int) + 1, cast(len_crop as int)), ' ')")
          .as("view_a"),
        expr("array_join(slice(toks, cast(start_b as int) + 1, cast(len_crop as int)), ' ')")
          .as("view_b"),
        expr("greatest(cast(0 as bigint)," +
          " (least(start_a, start_b) + len_crop) - greatest(start_a, start_b))")
          .as("overlap_tokens"))
      .orderBy("doc_id")
  }
  private val q155Sql =
    """WITH b AS (
      |  SELECT doc_id, regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS toks,
      |    CAST(len(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) AS BIGINT) AS n
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks, n, (n + 1) // 2 AS len_crop,
      |    CAST('0x' || substr(md5('view1|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS t1,
      |    CAST('0x' || substr(md5('view2|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS t2
      |  FROM b WHERE n >= 2),
      |e AS (
      |  SELECT doc_id, toks, n, len_crop,
      |    t1 % ((n - len_crop) + 1) AS start_a,
      |    t2 % ((n - len_crop) + 1) AS start_b
      |  FROM c)
      |SELECT doc_id, n AS n_tokens, len_crop, start_a, start_b,
      |  array_to_string(toks[CAST(start_a AS BIGINT) + 1
      |    : CAST(start_a + len_crop AS BIGINT)], ' ') AS view_a,
      |  array_to_string(toks[CAST(start_b AS BIGINT) + 1
      |    : CAST(start_b + len_crop AS BIGINT)], ' ') AS view_b,
      |  greatest(CAST(0 AS BIGINT),
      |    (least(start_a, start_b) + len_crop) - greatest(start_a, start_b)) AS overlap_tokens
      |FROM e ORDER BY doc_id""".stripMargin

  /** q156 — memorization extraction probes: turn q94's duplicated spans
    * into the (prompt, continuation) eval pairs of the Carlini et al.
    * 2021/2022 extraction attack — duplicated sequences are the ones
    * models memorize, so the probe set is exactly "prefix of a
    * duplicated span → does the model complete it verbatim". Spans of
    * ≥ 16 tokens split at the midpoint (mid = span_tokens div 2).
    * Composes q94's published span output (shared xxhash64 gram index);
    * the oracle embeds q94's SQL as a CTE — the q95/q150 composition
    * proof.
    *
    * Scale shape: q94's audited plan + one doc_id-keyed join back to
    * the token arrays + row-local slicing. Probe volume ∝ duplicated
    * spans, not the corpus. */
  private def q156(s: SparkSession, d: String): DataFrame = {
    val spans = graft.SparkEntry.queries("q94_substring_dedup_spans")(s, d)
      .filter(col("span_tokens") >= 16)
    val toks = t(s, d, "documents")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    spans.join(toks, Seq("doc_id"))
      .withColumn("mid", expr("span_tokens div 2"))
      .select(col("doc_id"), col("span_start"), col("span_tokens"), col("mid"),
        expr("array_join(slice(toks, cast(span_start as int), cast(mid as int)), ' ')")
          .as("prompt"),
        expr("array_join(slice(toks, cast(span_start + mid as int)," +
          " cast(span_tokens - mid as int)), ' ')").as("continuation"))
      .orderBy("doc_id", "span_start")
  }
  private def q156Sql: String = {
    val sp = DedupOps.oracleSql("q94_substring_dedup_spans")
    s"""WITH sp AS ($sp),
       |tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
       |       FROM documents),
       |j AS (
       |  SELECT sp.doc_id, sp.span_start, sp.span_tokens,
       |    sp.span_tokens // 2 AS mid, tk.toks
       |  FROM sp JOIN tk ON tk.doc_id = sp.doc_id
       |  WHERE sp.span_tokens >= 16)
       |SELECT doc_id, span_start, span_tokens, mid,
       |  array_to_string(toks[CAST(span_start AS BIGINT)
       |    : CAST(span_start + mid - 1 AS BIGINT)], ' ') AS prompt,
       |  array_to_string(toks[CAST(span_start + mid AS BIGINT)
       |    : CAST(span_start + span_tokens - 1 AS BIGINT)], ' ') AS continuation
       |FROM j ORDER BY doc_id, span_start""".stripMargin
  }

  /** q157 — MinHash-LSH S-curve: the detection-probability table
    * `P(candidate | s) = 1 − (1 − s^r)^b` for the fleet's band config
    * (q28: b = 4 bands × r = 4 rows) over s ∈ {0.05 … 0.95} — the
    * published diagnostic (Leskovec/Rajaraman/Ullman ch. 3) a pipeline
    * stamps next to its near-dup pass so consumers know what "caught"
    * means (s where P crosses ½ sits near (1/b)^(1/r) ≈ 0.71 here).
    * Powers expand to repeated multiplies — every double op is one
    * correctly-rounded step, identical in both engines.
    *
    * Scale shape: 19 literal rows; data-independent. */
  private def q157(s: SparkSession, d: String): DataFrame = {
    // data-independent, but read through the registry contract anyway
    // (the table parameterizes the q28 pass over THIS corpus's config)
    t(s, d, "documents").limit(0) // touch the dir so a bad path still fails fast
    s.range(1, 20).toDF("i")
      .withColumn("s", expr("cast(i as double) * 5e-2"))
      .withColumn("s4", expr("(s * s) * (s * s)"))
      .withColumn("q1", expr("1e0 - s4"))
      .withColumn("p_candidate", expr("1e0 - ((q1 * q1) * (q1 * q1))"))
      .select(col("i"), col("s"), col("p_candidate"))
      .orderBy("i")
  }
  private val q157Sql =
    """WITH g AS (SELECT unnest(range(1, 20)) AS i),
      |c AS (SELECT i, CAST(i AS DOUBLE) * 5e-2 AS s FROM g),
      |p AS (SELECT i, s, (s * s) * (s * s) AS s4 FROM c),
      |q AS (SELECT i, s, 1e0 - s4 AS q1 FROM p)
      |SELECT i, s, 1e0 - ((q1 * q1) * (q1 * q1)) AS p_candidate
      |FROM q ORDER BY i""".stripMargin

  /** q158 — phrase-blocklist statistics: per phrase, how many docs hit
    * and how many total occurrences — the tuning table a team reads
    * BEFORE enabling a blocklist gate (q121 applies one; this measures
    * each phrase's blast radius first, the C4 §2.2 "curly brace /
    * lorem ipsum / blocklist" accounting). Occurrences are counted by
    * literal substring arithmetic `(len(txt) − len(replace(txt, p)))
    * / len(p)` — no regex, so phrases need no escaping and both
    * engines agree by construction.
    *
    * Scale shape: the phrase list is a plan-time literal exploded per
    * row (|phrases|·n row-local work, one |phrases|-row aggregate);
    * a million-phrase list would flip to the q108 broadcast-join
    * shape. */
  private def q158(s: SparkSession, d: String): DataFrame = {
    val phrases = Seq("slow", "big", "lorem ipsum", "click here",
      "subscribe now", "all rights reserved", "terms of service", "drop")
    val arr = phrases.map(p => s"'${p}'").mkString(", ")
    t(s, d, "documents")
      .withColumn("txt", coalesce(col("text"), lit("")))
      .select(col("doc_id"), col("txt"), explode(expr(s"array($arr)")).as("phrase"))
      .withColumn("occ", expr(
        "(length(txt) - length(replace(txt, phrase, ''))) div length(phrase)"))
      .groupBy(col("phrase"))
      .agg(count(when(col("occ") > 0, 1)).as("docs_hit"),
        sum(col("occ")).cast("long").as("total_hits"),
        count(lit(1)).as("n_docs"))
      .withColumn("doc_hit_rate",
        expr("cast(docs_hit as double) / cast(n_docs as double)"))
      .orderBy("phrase")
  }
  private def q158Sql: String = {
    val phrases = Seq("slow", "big", "lorem ipsum", "click here",
      "subscribe now", "all rights reserved", "terms of service", "drop")
    val arr = phrases.map(p => s"'${p}'").mkString(", ")
    s"""WITH b AS (SELECT doc_id, COALESCE(text, '') AS txt FROM documents),
       |e AS (
       |  SELECT doc_id, txt, unnest([$arr]) AS phrase FROM b),
       |o AS (
       |  SELECT doc_id, phrase,
       |    (length(txt) - length(replace(txt, phrase, ''))) // length(phrase) AS occ
       |  FROM e),
       |g AS (
       |  SELECT phrase,
       |    CAST(COUNT(*) FILTER (WHERE occ > 0) AS BIGINT) AS docs_hit,
       |    CAST(SUM(occ) AS BIGINT) AS total_hits,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM o GROUP BY phrase)
       |SELECT phrase, docs_hit, total_hits, n_docs,
       |  CAST(docs_hit AS DOUBLE) / CAST(n_docs AS DOUBLE) AS doc_hit_rate
       |FROM g ORDER BY phrase""".stripMargin
  }

  /** q159 — SFT loss-mask spans: for each q128-style conversation, the
    * character offsets of every turn segment in the rendered transcript
    * and whether training loss applies there (assistant turns only —
    * the prompt-masking convention of instruction tuning: user turns
    * are context, not targets). A trainer consumes exactly this table
    * to build its attention/loss masks without re-parsing the
    * transcript. Offsets are 1-based and `seg_start + seg_len` of turn
    * k equals `seg_start` of turn k+1 — the spans tile the transcript
    * exactly (spec-pinned).
    *
    * Scale shape: one user-keyed window pair (row_number + running
    * char-length sum) — per-partition rows = conversation length, the
    * q128 boundedness argument; timestamps compare on epoch-µs (q128's
    * nanos-truncation parity note). */
  private def q159(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    t(s, d, "events")
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        col("event_id"), coalesce(col("event_type"), lit("")).as("event_type"))
      .withColumn("turn_idx", row_number().over(w).cast("long"))
      .withColumn("role",
        when((col("turn_idx") % 2) === 1, "user").otherwise("assistant"))
      .withColumn("seg",
        concat(lit("<|"), col("role"), lit("|>"), col("event_type")))
      .withColumn("seg_len", length(col("seg")).cast("long"))
      .withColumn("seg_start",
        lit(1L) + coalesce(sum(col("seg_len")).over(wPrev), lit(0L)))
      .withColumn("loss_applied", col("role") === "assistant")
      .select(col("user_id"), col("turn_idx"), col("role"),
        col("seg_start"), col("seg_len"), col("loss_applied"))
      .orderBy("user_id", "turn_idx")
  }
  private val q159Sql =
    """WITH e AS (
      |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_id,
      |    COALESCE(event_type, '') AS event_type,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS BIGINT) AS turn_idx
      |  FROM events),
      |r AS (
      |  SELECT user_id, turn_idx,
      |    CASE WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
      |    '<|' || CASE WHEN turn_idx % 2 = 1 THEN 'user' ELSE 'assistant' END
      |      || '|>' || event_type AS seg
      |  FROM e),
      |o AS (
      |  SELECT user_id, turn_idx, role,
      |    CAST(length(seg) AS BIGINT) AS seg_len,
      |    1 + COALESCE(SUM(CAST(length(seg) AS BIGINT)) OVER (
      |      PARTITION BY user_id ORDER BY turn_idx
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg_start
      |  FROM r)
      |SELECT user_id, turn_idx, role, CAST(seg_start AS BIGINT) AS seg_start,
      |  seg_len, role = 'assistant' AS loss_applied
      |FROM o ORDER BY user_id, turn_idx""".stripMargin

  /** q160 — sequence-packing utilization report: per source, how well
    * q92's greedy 2048-token bins fill — bin count, mean fill, and the
    * under/overflow split (a doc starting in a bin can straddle past
    * it). The packing-efficiency number every pretraining-data report
    * quotes ("x% of context window wasted"); composes q92's published
    * output, and the oracle embeds q92's SQL as a CTE (the q95/q156
    * composition proof).
    *
    * Scale shape: q92's audited two-level plan + one (source, bin)
    * aggregate + one |sources|-row rollup. */
  private def q160(s: SparkSession, d: String): DataFrame = {
    val binSize = 2048L
    val bins = graft.SparkEntry.queries("q92_sequence_packing")(s, d)
      .groupBy(col("source"), col("pack_bin"))
      .agg(count(lit(1)).as("docs_in_bin"), sum(col("n_tokens")).as("bin_tokens"))
    bins.groupBy(col("source"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("bin_tokens")).cast("long").as("total_tokens"),
        count(when(col("bin_tokens") < binSize, 1)).as("n_underfull"),
        count(when(col("bin_tokens") > binSize, 1)).as("n_overflow"),
        max(col("docs_in_bin")).as("max_docs_per_bin"))
      .withColumn("mean_fill", expr(
        s"cast(total_tokens as double) / (cast(n_bins as double) * ${binSize}e0)"))
      .orderBy("source")
  }
  private def q160Sql: String = {
    val pk = PipelineOps.oracleSql("q92_sequence_packing")
    s"""WITH pk AS ($pk),
       |b AS (
       |  SELECT source, pack_bin, CAST(COUNT(*) AS BIGINT) AS docs_in_bin,
       |    CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
       |  FROM pk GROUP BY source, pack_bin),
       |g AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bins,
       |    CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
       |    CAST(COUNT(*) FILTER (WHERE bin_tokens < 2048) AS BIGINT) AS n_underfull,
       |    CAST(COUNT(*) FILTER (WHERE bin_tokens > 2048) AS BIGINT) AS n_overflow,
       |    CAST(MAX(docs_in_bin) AS BIGINT) AS max_docs_per_bin
       |  FROM b GROUP BY source)
       |SELECT source, n_bins, total_tokens, n_underfull, n_overflow,
       |  max_docs_per_bin,
       |  CAST(total_tokens AS DOUBLE) / (CAST(n_bins AS DOUBLE) * 2048e0)
       |    AS mean_fill
       |FROM g ORDER BY source""".stripMargin
  }

  /** q161 — directional copy matrix ("who copies whom"): for every
    * duplicated 8-token line occurrence that is NOT the first
    * occurrence (q98's keep-first order: min (doc_id, idx) per line
    * hash), attribute it source-of-first → source-of-copy and count per
    * directed pair. q147 says two sources overlap; this says which way
    * the text flowed (doc_id standing in for crawl time — with real
    * timestamps the order key swaps in directly). Self-pairs (a→a) are
    * within-source duplication, reported too — the q150 per-source
    * number, directionalized.
    *
    * Scale shape: the q98 shuffle (one md5-line-keyed aggregation +
    * same-key join back) plus two broadcast-sized source lookups and a
    * ≤|sources|²-row aggregate. */
  private def q161(s: SparkSession, d: String): DataFrame = {
    val lines = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        split(coalesce(col("text"), lit("")), " ").as("toks"))
      .select(col("doc_id"), col("source"), posexplode(expr(
        "transform(sequence(0, (size(toks) - 1) div 8)," +
          " i -> array_join(slice(toks, i * 8 + 1, 8), ' '))"))
        .as(Seq("idx", "line")))
      .select(col("doc_id"), col("source"), col("idx").cast("long").as("idx"),
        md5(col("line")).as("h"))
      .localCheckpoint(true) // consumers: first-occurrence agg + probe
    val firsts = lines.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("idx"))).as("first"))
      .filter(col("cnt") > 1)
    val firstSrc = lines
      .join(firsts, Seq("h"))
      .filter(col("doc_id") === col("first.doc_id") && col("idx") === col("first.idx"))
      .select(col("h"), col("source").as("src_from"))
    lines.join(firsts, Seq("h"))
      .filter(!(col("doc_id") === col("first.doc_id") && col("idx") === col("first.idx")))
      .join(firstSrc, Seq("h"))
      .groupBy(col("src_from"), col("source").as("src_to"))
      .agg(count(lit(1)).as("copied_lines"),
        countDistinct(col("h")).as("distinct_lines"))
      .orderBy("src_from", "src_to")
  }
  private val q161Sql =
    """WITH tk AS (
      |  SELECT doc_id, source, string_split(COALESCE(text, ''), ' ') AS toks
      |  FROM documents),
      |ln AS (
      |  SELECT doc_id, source, idx, md5(
      |    array_to_string(toks[idx * 8 + 1 : idx * 8 + 8], ' ')) AS h
      |  FROM (SELECT doc_id, source, toks,
      |          unnest(range(0, (len(toks) - 1) // 8 + 1)) AS idx
      |        FROM tk)),
      |mk AS (
      |  SELECT doc_id, source, idx, h,
      |    COUNT(*) OVER (PARTITION BY h) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn
      |  FROM ln),
      |fs AS (SELECT h, source AS src_from FROM mk WHERE cnt > 1 AND rn = 1)
      |SELECT fs.src_from, mk.source AS src_to,
      |  CAST(COUNT(*) AS BIGINT) AS copied_lines,
      |  CAST(COUNT(DISTINCT mk.h) AS BIGINT) AS distinct_lines
      |FROM mk JOIN fs ON fs.h = mk.h
      |WHERE mk.cnt > 1 AND mk.rn > 1
      |GROUP BY fs.src_from, mk.source
      |ORDER BY src_from, src_to""".stripMargin

  /** q162 — repeated-data value accounting (Muennighoff et al. 2023,
    * "Scaling Data-Constrained Language Models": the value of repeated
    * tokens decays exponentially with epoch count, R* ≈ 15.39 fitted):
    * per source, unique tokens U, the q111 repetition factor
    * r = min(4, √(max_docs/n_docs)), total trained tokens r·U, and
    * effective tokens `U·(1 + R*·(1 − e^(−R/R*)))` with R = r − 1
    * extra epochs — the number that says whether another epoch of a
    * small source still buys anything. e^(−x) is computed as
    * 1/e^x through [[LmOps.PortableExp]] (x ≥ 0 by construction), so
    * every double matches DuckDB bit-for-bit; √ is a correctly-rounded
    * IEEE op in both engines.
    *
    * Scale shape: one corpus-proportional per-source token-count hash
    * agg; everything else is |sources|-row arithmetic behind the
    * enforced ≤1-row max-docs scalar. */
  private def q162(s: SparkSession, d: String): DataFrame = {
    val rstar = "1.539e1"
    val stats = t(s, d, "documents").groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(coalesce(col("text"), lit(""))), "\\s+")).cast("long"))
          .as("unique_tokens"))
    val m = stats.agg(max(col("n_docs")).as("m_docs"))
    val base = graft.Scalars.withScalar(stats, m)
      .withColumn("rep_factor", least(lit(4.0),
        sqrt(col("m_docs").cast("double") / col("n_docs").cast("double"))))
      .withColumn("x", expr(s"(rep_factor - 1e0) / $rstar"))
    LmOps.PortableExp.steps("x", "v", spark = true)
      .foldLeft(base) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .withColumn("effective_tokens", expr(
        s"cast(unique_tokens as double)" +
          s" * (1e0 + ($rstar * (1e0 - (1e0 / expv))))"))
      .select(col("source"), col("n_docs"), col("unique_tokens"),
        col("rep_factor"),
        expr("rep_factor * cast(unique_tokens as double)").as("trained_tokens"),
        col("effective_tokens"),
        expr("effective_tokens / (rep_factor * cast(unique_tokens as double))")
          .as("efficiency"))
      .orderBy("source")
  }
  private def q162Sql: String = {
    val (last, ctes) = LmOps.expCtes("b2", "x", Seq("x" -> "v"))
    s"""WITH st AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')))
       |      AS BIGINT) AS unique_tokens
       |  FROM documents GROUP BY source),
       |mx AS (SELECT CAST(MAX(n_docs) AS BIGINT) AS m_docs FROM st),
       |b1 AS (
       |  SELECT st.*, least(CAST(4.0 AS DOUBLE),
       |    sqrt(CAST(m_docs AS DOUBLE) / CAST(n_docs AS DOUBLE))) AS rep_factor
       |  FROM st, mx),
       |b2 AS (SELECT *, (rep_factor - 1e0) / 1.539e1 AS x FROM b1),
       |${ctes.mkString(",\n")},
       |f AS (
       |  SELECT source, n_docs, unique_tokens, rep_factor,
       |    CAST(unique_tokens AS DOUBLE)
       |      * (1e0 + (1.539e1 * (1e0 - (1e0 / expv)))) AS effective_tokens
       |  FROM $last)
       |SELECT source, n_docs, unique_tokens, rep_factor,
       |  rep_factor * CAST(unique_tokens AS DOUBLE) AS trained_tokens,
       |  effective_tokens,
       |  effective_tokens / (rep_factor * CAST(unique_tokens AS DOUBLE))
       |    AS efficiency
       |FROM f ORDER BY source""".stripMargin
  }

  /** q163 — character-level near-dup verification (RETSim/edit-distance
    * family): re-score q28's MinHash-verified pairs with normalized
    * Levenshtein similarity `1 − lev/max(|a|,|b|)` and flag pairs over
    * 0.8 — the second opinion a dedup pipeline takes before destructive
    * removal (shingle Jaccard is word-order-blind; edit distance is
    * not). Texts are ASCII-folded first (`[^\x00-\x7F] → '_'`, one
    * codepoint each in both engines) because Spark's levenshtein counts
    * codepoints while DuckDB's counts BYTES — folding makes
    * byte = codepoint and the integer distances identical.
    *
    * Scale shape: q28's audited band plan + two doc_id-keyed text
    * fetches + one row-local levenshtein per CANDIDATE PAIR (never
    * all-pairs); lev cost is |a|·|b| per pair — the documented price of
    * exact character verification, paid only on sketch survivors. */
  private def q163(s: SparkSession, d: String): DataFrame = {
    val pairs = graft.SparkEntry.queries("q28_dedup_minhash_lsh")(s, d)
    val txt = t(s, d, "documents").select(col("doc_id"),
      expr("regexp_replace(coalesce(text, ''), '[^\\x00-\\x7F]', '_')").as("ftxt"))
    pairs
      .join(txt.select(col("doc_id").as("doc_a"), col("ftxt").as("ta")), Seq("doc_a"))
      .join(txt.select(col("doc_id").as("doc_b"), col("ftxt").as("tb")), Seq("doc_b"))
      .withColumn("lev", levenshtein(col("ta"), col("tb")).cast("long"))
      .withColumn("max_len",
        greatest(length(col("ta")), length(col("tb"))).cast("long"))
      .withColumn("char_sim", expr(
        "1e0 - (cast(lev as double) / cast(max_len as double))"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("lev"),
        col("max_len"), col("char_sim"),
        (col("char_sim") >= 0.8).as("char_near_dup"))
      .orderBy("doc_a", "doc_b")
  }
  private def q163Sql: String = {
    val mh = DedupOps.oracleSql("q28_dedup_minhash_lsh")
    s"""WITH mh AS ($mh),
       |tx AS (SELECT doc_id,
       |         regexp_replace(COALESCE(text, ''), '[^\\x00-\\x7F]', '_', 'g') AS ftxt
       |       FROM documents),
       |j AS (
       |  SELECT mh.doc_a, mh.doc_b, mh.jaccard,
       |    CAST(levenshtein(ta.ftxt, tb.ftxt) AS BIGINT) AS lev,
       |    CAST(greatest(length(ta.ftxt), length(tb.ftxt)) AS BIGINT) AS max_len
       |  FROM mh JOIN tx ta ON ta.doc_id = mh.doc_a
       |        JOIN tx tb ON tb.doc_id = mh.doc_b)
       |SELECT doc_a, doc_b, jaccard, lev, max_len,
       |  1e0 - (CAST(lev AS DOUBLE) / CAST(max_len AS DOUBLE)) AS char_sim,
       |  (1e0 - (CAST(lev AS DOUBLE) / CAST(max_len AS DOUBLE))) >= 0.8
       |    AS char_near_dup
       |FROM j ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q164 — URL canonicalization + canonical dedup: the Common-Crawl
    * pre-dedup normalization pass (lowercase host, strip the default
    * :443 port, drop tracking parameters (utm_ prefix, fbclid, ref),
    * collapse separator debris, strip the trailing slash) then q26-style
    * keep-first over the canonical form. The synthesized URL shell (the
    * q107 idiom, noised further with case, default ports, tracking
    * params and trailing slashes by doc_id residues) exercises every
    * rule; dedup groups are the doc_id%100 path collisions the shell
    * plants. Canonicalization is a fixed regexp_replace chain in the
    * Java∩RE2 subset, applied in the same order in both engines.
    *
    * Scale shape: canonicalization row-local in the scan span; the
    * keep-first window partitions by canonical URL (group size =
    * collision count, bounded). */
  private def q164(s: SparkSession, d: String): DataFrame = {
    val raw =
      "concat('https://'," +
        " CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'www.' END, source," +
        " CASE CAST((doc_id div 20) % 2 AS INT) WHEN 0 THEN '.com' ELSE '.org' END," +
        " CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END," +
        " '/p/', CAST(doc_id % 100 AS STRING)," +
        " CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END," +
        " CASE WHEN doc_id % 5 = 0 THEN concat('?utm_source=news&id=', CAST(doc_id % 10 AS STRING))" +
        "      WHEN doc_id % 3 = 0 THEN '?fbclid=xyz' ELSE '' END)"
    val w = Window.partitionBy(col("url_canonical"))
    t(s, d, "documents").select(col("doc_id"), col("source"))
      .withColumn("url_raw", expr(raw))
      .withColumn("c1", expr("regexp_replace(url_raw, '://WWW\\\\.', '://www.')"))
      .withColumn("c2", expr("regexp_replace(c1, ':443/', '/')"))
      .withColumn("c3", expr(
        "regexp_replace(c2, '(utm_[a-z]+|fbclid|ref)=[^&]*&?', '')"))
      .withColumn("c4", expr("regexp_replace(c3, '[?&]+$', '')"))
      .withColumn("c5", expr("regexp_replace(c4, '\\\\?&', '?')"))
      .withColumn("url_canonical", expr("regexp_replace(c5, '/$', '')"))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("url_raw"), col("url_canonical"),
        (col("url_raw") =!= col("url_canonical")).as("canon_changed"),
        col("canonical_id"), col("group_size"),
        (col("doc_id") =!= col("canonical_id")).as("is_url_dup"))
      .orderBy("doc_id")
  }
  private val q164Sql =
    """WITH u AS (
      |  SELECT doc_id, 'https://'
      |    || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'www.' END || source
      |    || CASE CAST((doc_id // 20) % 2 AS INTEGER) WHEN 0 THEN '.com' ELSE '.org' END
      |    || CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END
      |    || '/p/' || CAST(doc_id % 100 AS VARCHAR)
      |    || CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0 THEN '?utm_source=news&id=' || CAST(doc_id % 10 AS VARCHAR)
      |            WHEN doc_id % 3 = 0 THEN '?fbclid=xyz' ELSE '' END AS url_raw
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, url_raw,
      |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      |      url_raw, '://WWW\.', '://www.', 'g'), ':443/', '/', 'g'),
      |      '(utm_[a-z]+|fbclid|ref)=[^&]*&?', '', 'g'), '[?&]+$', '', 'g'),
      |      '\?&', '?', 'g') AS c5
      |  FROM u),
      |k AS (
      |  SELECT doc_id, url_raw,
      |    regexp_replace(c5, '/$', '', 'g') AS url_canonical
      |  FROM c)
      |SELECT doc_id, url_raw, url_canonical,
      |  url_raw <> url_canonical AS canon_changed,
      |  MIN(doc_id) OVER w AS canonical_id,
      |  COUNT(*) OVER w AS group_size,
      |  doc_id <> MIN(doc_id) OVER w AS is_url_dup
      |FROM k
      |WINDOW w AS (PARTITION BY url_canonical)
      |ORDER BY doc_id""".stripMargin

  /** q165 — label-centroid embedding pooling: element-wise mean of all
    * vectors per label — the mean-pooling every chunk→document /
    * cluster→centroid embedding step performs (and the statistic
    * SemDeDup/q114-style codebooks are built from). Floats widen to
    * double EXACTLY; per-(label, position) sums are vec_id-ordered IEEE
    * folds, so every mean is bit-identical in DuckDB. Output is
    * (label, pos, mean) rows, not arrays — position-keyed rows are the
    * shuffle-friendly layout at scale anyway.
    *
    * Scale shape: one posexplode (corpus × dim rows) into a
    * (label, pos)-keyed aggregation — the fold buffers one value per
    * group member (vectors per label), the documented wide-buffer
    * boundary; two-level chunked folds are the swap-in at 100 TB. */
  private def q165(s: SparkSession, d: String): DataFrame = {
    t(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("label"), col("pos").cast("long").as("pos"),
        col("vec_id"), col("v").cast("double").as("v"))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).as("n_vectors"),
        expr("aggregate(array_sort(collect_list(struct(vec_id, v)))," +
          " cast(0 as double), (a, x) -> a + x.v)").as("vsum"))
      .withColumn("mean_v", expr("vsum / cast(n_vectors as double)"))
      .select(col("label"), col("pos"), col("n_vectors"), col("mean_v"))
      .orderBy("label", "pos")
  }
  private val q165Sql =
    """WITH e AS (
      |  SELECT vec_id, label, pos, CAST(v AS DOUBLE) AS v
      |  FROM (SELECT vec_id, label,
      |          unnest(range(len(embedding))) AS pos,
      |          unnest(embedding) AS v
      |        FROM embeddings)),
      |g AS (
      |  SELECT label, CAST(pos AS BIGINT) AS pos,
      |    CAST(COUNT(*) AS BIGINT) AS n_vectors,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(v ORDER BY vec_id)),
      |      (a, b) -> a + b) AS vsum
      |  FROM e GROUP BY label, pos)
      |SELECT label, pos, n_vectors, vsum / CAST(n_vectors AS DOUBLE) AS mean_v
      |FROM g ORDER BY label, pos""".stripMargin

  /** q166 — per-source perplexity outliers: z-score each doc's q106 LM
    * score against ITS SOURCE's mean/σ and flag |z| > 2 — the
    * per-domain normalization CCNet applies per language, done per
    * source: a "bad" score in a noisy source is normal, the same score
    * in a clean source is an outlier. Mean and variance come from
    * doc_id-ordered folds of v and v² (σ² = Σv²/n − mean², staged
    * identically in both engines); z is three correctly-rounded ops.
    *
    * Scale shape: the memoized lmScores artifact + ONE per-source
    * fold aggregation (wide-buffer boundary, q153's class) broadcast
    * back over a source-keyed join; flag output ∝ outliers. */
  private def q166(s: SparkSession, d: String): DataFrame = {
    val scored = LmOps.lmScores(s, d).select(col("doc_id"), col("avg_logprob"))
      .join(t(s, d, "documents").select(col("doc_id"), col("source")), Seq("doc_id"))
      .localCheckpoint(true) // consumers: per-source stats + z-score join
    val stats = scored.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("aggregate(array_sort(collect_list(struct(doc_id, avg_logprob)))," +
          " cast(0 as double), (a, x) -> a + x.avg_logprob)").as("s1"),
        expr("aggregate(array_sort(collect_list(struct(doc_id," +
          " avg_logprob * avg_logprob as v2))), cast(0 as double)," +
          " (a, x) -> a + x.v2)").as("s2"))
      .withColumn("src_mean", expr("s1 / cast(n_docs as double)"))
      .withColumn("src_std", expr(
        "sqrt((s2 / cast(n_docs as double)) - (src_mean * src_mean))"))
      .select(col("source"), col("src_mean"), col("src_std"))
    scored.join(broadcast(stats), Seq("source"))
      // nullif: a single-doc (or constant-score) source has zero std —
      // z is undefined there and the NULL falls out of the |z| filter in
      // both engines. Tiny-corpus gate regression.
      .withColumn("z", expr("(avg_logprob - src_mean) / nullif(src_std, 0e0)"))
      .filter(expr("abs(z) > 2e0"))
      .select(col("doc_id"), col("source"), col("avg_logprob"),
        col("src_mean"), col("src_std"), col("z"))
      .orderBy("doc_id")
  }
  private def q166Sql: String = {
    val pq = LmOps.oracleSql("q106_lm_perplexity")
    s"""WITH pq AS ($pq),
       |sl AS (
       |  SELECT pq.doc_id, pq.avg_logprob, d.source
       |  FROM pq JOIN documents d ON d.doc_id = pq.doc_id),
       |st AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(avg_logprob ORDER BY doc_id)), (a, b) -> a + b) AS s1,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(avg_logprob * avg_logprob ORDER BY doc_id)), (a, b) -> a + b) AS s2
       |  FROM sl GROUP BY source),
       |ms AS (
       |  SELECT source, s1 / CAST(n_docs AS DOUBLE) AS src_mean,
       |    s2, n_docs
       |  FROM st),
       |sd AS (
       |  SELECT source, src_mean,
       |    sqrt((s2 / CAST(n_docs AS DOUBLE)) - (src_mean * src_mean)) AS src_std
       |  FROM ms),
       |z AS (
       |  SELECT sl.doc_id, sl.source, sl.avg_logprob, sd.src_mean, sd.src_std,
       |    (sl.avg_logprob - sd.src_mean) / nullif(sd.src_std, 0e0) AS z
       |  FROM sl JOIN sd USING (source))
       |SELECT doc_id, source, avg_logprob, src_mean, src_std, z
       |FROM z WHERE abs(z) > 2e0 ORDER BY doc_id""".stripMargin
  }

  /** q167 — ingest drift detection: per UTC day, the χ² statistic of
    * the day's event-type distribution against the whole stream's — the
    * monitoring gate a data-ingest pipeline alarms on (a feed that
    * suddenly ships 80% errors drifts long before volume moves). Days
    * come from integer epoch-µs arithmetic (`div 86400000000` — no
    * timezone semantics to disagree on); the day×type grid is an
    * explicit constant-key join of two SMALL aggregates (days × 5
    * types) so zero-observed cells still contribute their expectation;
    * the per-day χ² sum is a type-ordered fold. Flag at the 95% χ²
    * quantile for df = |types|−1 = 4 (9.488).
    *
    * Scale shape: one corpus-proportional (day, type) count hash agg;
    * everything after is |days|·|types|-sized. */
  private def q167(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"),
        coalesce(col("event_type"), lit("")).as("event_type"))
      .localCheckpoint(true) // consumers: day×type counts, day totals, type totals
    val dt = ev.groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("o"))
    val dayTot = ev.groupBy(col("day")).agg(count(lit(1)).as("day_total"))
    // the day×type grid: the |types|-row side rides in as ONE array
    // scalar (groupless agg → the enforced ≤1-row withScalar shape) and
    // explodes per day — a constant-key equi-join of the two aggregates
    // plans as a BNLJ over data-proportional sides, which the
    // PlanHygieneSpec loop-join gate rightly rejects
    val typeArr = ev.groupBy(col("event_type")).agg(count(lit(1)).as("type_total"))
      .agg(expr("array_sort(collect_list(struct(event_type, type_total)))").as("tt"))
    val total = ev.agg(count(lit(1)).as("total"))
    val grid = graft.Scalars.withScalar(dayTot, typeArr)
      .select(col("day"), col("day_total"), explode(col("tt")).as("x"))
      .select(col("day"), col("day_total"),
        col("x.event_type").as("event_type"), col("x.type_total").as("type_total"))
    graft.Scalars.withScalar(
      grid.join(dt, Seq("day", "event_type"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L))), total)
      .withColumn("e", expr(
        "(cast(day_total as double) * cast(type_total as double)) / cast(total as double)"))
      .withColumn("term", expr("((cast(o as double) - e) * (cast(o as double) - e)) / e"))
      .groupBy(col("day"))
      .agg(max(col("day_total")).as("n_events"),
        expr("aggregate(array_sort(collect_list(struct(event_type, term)))," +
          " cast(0 as double), (a, x) -> a + x.term)").as("chi2"))
      .withColumn("drift_flag", expr("chi2 > 9.488e0"))
      .orderBy("day")
  }
  private val q167Sql =
    """WITH ev AS (
      |  SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
      |    COALESCE(event_type, '') AS event_type
      |  FROM events),
      |dt AS (SELECT day, event_type, CAST(COUNT(*) AS BIGINT) AS o
      |       FROM ev GROUP BY day, event_type),
      |dd AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS day_total FROM ev GROUP BY day),
      |tt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_total
      |       FROM ev GROUP BY event_type),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM ev),
      |g AS (
      |  SELECT dd.day, dd.day_total, tt.event_type, tt.type_total,
      |    COALESCE(dt.o, CAST(0 AS BIGINT)) AS o, (SELECT total FROM tot) AS total
      |  FROM dd CROSS JOIN tt
      |  LEFT JOIN dt ON dt.day = dd.day AND dt.event_type = tt.event_type),
      |x AS (
      |  SELECT day, day_total, event_type,
      |    (CAST(day_total AS DOUBLE) * CAST(type_total AS DOUBLE))
      |      / CAST(total AS DOUBLE) AS e, o
      |  FROM g),
      |c AS (
      |  SELECT day, CAST(MAX(day_total) AS BIGINT) AS n_events,
      |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list(((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)) / e
      |           ORDER BY event_type)), (a, b) -> a + b) AS chi2
      |  FROM x GROUP BY day)
      |SELECT day, n_events, chi2, chi2 > 9.488e0 AS drift_flag
      |FROM c ORDER BY day""".stripMargin

  /** q168 — Jelinek–Mercer interpolation-weight search (deleted
    * interpolation, Jelinek & Mercer 1980; the λ grid is how n-gram LM
    * toolkits actually tune the bigram/unigram mix): train counts on
    * doc_id % 5 ≠ 0, score the held-out fifth under
    * `p = λ·p_bi + (1−λ)·p_uni` for λ ∈ {0.1 … 0.9}, report each λ's
    * total held-out log-likelihood and mark the argmax. With λ = l/10
    * the mixture rationalizes to a BIGINT ratio —
    * `A = l·c_bi·N + (10−l)·c_u(cur)·c_prev`, `B = 10·c_prev·N` — so
    * [[LmOps.PortableLn]] keeps every score bit-identical (the q123
    * rationalization move; A,B < 1e14 here, DECIMAL(38,0) at the
    * documented cliff). Held-out transitions whose prev or cur is
    * unseen in training are excluded (inner joins) — the λ choice is a
    * diagnostic over the shared-support set, stated in `n_scored`.
    *
    * Scale shape: the q106/q123 aggregation family (train bigram/
    * unigram hash aggs); the held-out probe join explodes ×9 λ rows
    * (bounded multiplier); the per-λ sum is a two-level fold: per
    * (λ, doc) position-ordered, then per λ doc_id-ordered — the q153
    * wide-buffer class. */
  private def q168(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "documents")
      .select(col("doc_id"), split(trim(coalesce(col("text"), lit(""))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 2)
      .localCheckpoint(true)
    val trans = base.select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(toks) - 1)," +
        " i -> struct(i as pos, toks[i-1] as prev, toks[i] as cur))")).as("x"))
      .select(col("doc_id"), col("x.pos").as("pos"),
        col("x.prev").as("prev"), col("x.cur").as("cur"))
    val train = trans.filter(col("doc_id") % 5 =!= 0)
    val held = trans.filter(col("doc_id") % 5 === 0)
    val bc = train.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("cbi"))
      .localCheckpoint(true) // consumers: prev totals + probe
    val prevTot = bc.groupBy(col("prev")).agg(sum(col("cbi")).as("cprev"))
    val uni = train.select(col("cur").as("w"))
      .union(train.filter(col("pos") === 1).select(col("prev").as("w")))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      .localCheckpoint(true) // consumers: N scalar + probe
    val nTok = uni.agg(sum(col("cu")).as("ntok"))
    val probe = graft.Scalars.withScalar(
      held.join(bc, Seq("prev", "cur"))
        .join(prevTot, Seq("prev"))
        .join(uni.withColumnRenamed("w", "cur"), Seq("cur")),
      nTok)
      .select(col("doc_id"), col("pos"), col("cbi"), col("cprev"),
        col("cu"), col("ntok"), explode(expr("sequence(1, 9)")).as("l"))
    val lnCols = LmOps.PortableLn.steps(
      "((l * cbi) * ntok) + (((10 - l) * cu) * cprev)", "a", spark = true) ++
      LmOps.PortableLn.steps("(10 * cprev) * ntok", "b", spark = true)
    val scored = lnCols.foldLeft(probe) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .withColumn("lp", expr("lna - lnb"))
    val perDoc = scored.groupBy(col("l"), col("doc_id"))
      .agg(count(lit(1)).as("n_tr"),
        expr("aggregate(array_sort(collect_list(struct(pos, lp)))," +
          " cast(0 as double), (a, x) -> a + x.lp)").as("doc_lp"))
    val perLam = perDoc.groupBy(col("l"))
      .agg(sum(col("n_tr")).cast("long").as("n_scored"),
        expr("aggregate(array_sort(collect_list(struct(doc_id, doc_lp)))," +
          " cast(0 as double), (a, x) -> a + x.doc_lp)").as("total_logprob"))
    val best = perLam.agg(max(col("total_logprob")).as("best_lp"))
    graft.Scalars.withScalar(perLam, best)
      .select((col("l").cast("double") * lit(0.1)).as("lam"),
        col("n_scored"), col("total_logprob"),
        (col("total_logprob") === col("best_lp")).as("is_best"))
      .orderBy("lam")
  }
  private def q168Sql: String = {
    val (last, ctes) = LmOps.lnCtes("p0", "s", Seq(
      "((l * cbi) * ntok) + (((10 - l) * cu) * cprev)" -> "a",
      "(10 * cprev) * ntok" -> "b"))
    s"""WITH base AS (
       |  SELECT doc_id, regexp_split_to_array(trim(COALESCE(text, '')), '\\s+') AS toks
       |  FROM documents
       |  WHERE len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) >= 2),
       |tr AS (
       |  SELECT doc_id, i AS pos, toks[i] AS prev, toks[i + 1] AS cur
       |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
       |        FROM base)),
       |train AS (SELECT * FROM tr WHERE doc_id % 5 <> 0),
       |held AS (SELECT * FROM tr WHERE doc_id % 5 = 0),
       |bc AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS cbi
       |       FROM train GROUP BY prev, cur),
       |pt AS (SELECT prev, CAST(SUM(cbi) AS BIGINT) AS cprev FROM bc GROUP BY prev),
       |uni AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cu
       |  FROM (SELECT cur AS w FROM train
       |        UNION ALL SELECT prev AS w FROM train WHERE pos = 1)
       |  GROUP BY w),
       |nt AS (SELECT CAST(SUM(cu) AS BIGINT) AS ntok FROM uni),
       |p0 AS (
       |  SELECT h.doc_id, h.pos, bc.cbi, pt.cprev, u.cu,
       |    (SELECT ntok FROM nt) AS ntok, l
       |  FROM held h
       |  JOIN bc USING (prev, cur) JOIN pt USING (prev)
       |  JOIN uni u ON u.w = h.cur
       |  CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS l)),
       |${ctes.mkString(",\n")},
       |sc AS (SELECT doc_id, pos, l, lna - lnb AS lp FROM $last),
       |pd AS (
       |  SELECT l, doc_id, CAST(COUNT(*) AS BIGINT) AS n_tr,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(lp ORDER BY pos)),
       |      (a, b) -> a + b) AS doc_lp
       |  FROM sc GROUP BY l, doc_id),
       |pl AS (
       |  SELECT l, CAST(SUM(n_tr) AS BIGINT) AS n_scored,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list(doc_lp ORDER BY doc_id)),
       |      (a, b) -> a + b) AS total_logprob
       |  FROM pd GROUP BY l),
       |bst AS (SELECT MAX(total_logprob) AS best_lp FROM pl)
       |SELECT CAST(l AS DOUBLE) * 0.1 AS lam, n_scored, total_logprob,
       |  total_logprob = (SELECT best_lp FROM bst) AS is_best
       |FROM pl ORDER BY lam""".stripMargin
  }

  /** q169 — contamination report card: the one-table summary of all
    * three decontamination modalities the engine runs — lexical n-gram
    * overlap (q89), embedding-cosine paraphrase (q138), and train/val
    * split leakage (q134) — with checked/flagged counts and rates per
    * method. The audit artifact an eval-integrity review reads first;
    * each method's oracle SQL is embedded as a CTE (the q95/q150
    * composition proof, now across three modules).
    *
    * Scale shape: three already-audited sibling passes + three ≤1-row
    * aggregates unioned into a 3-row card. */
  private def q169(s: SparkSession, d: String): DataFrame = {
    val q = graft.SparkEntry.queries
    def card(method: String, df: DataFrame, flag: String) =
      df.agg(count(lit(1)).as("n_checked"),
        count(when(col(flag), 1)).as("n_flagged"))
        .select(lit(method).as("method"), col("n_checked"), col("n_flagged"))
    card("lexical_ngram", q("q89_contamination")(s, d), "contaminated")
      .unionAll(card("semantic_cosine", q("q138_semantic_decontam")(s, d), "contaminated"))
      .unionAll(card("split_leakage", q("q134_split_decontam")(s, d), "leaked"))
      .withColumn("flag_rate",
        // nullif: a modality can have ZERO checked rows on a degenerate
        // corpus (no candidates survive its probe) — rate is undefined,
        // not an ANSI error. Tiny-corpus gate regression.
        expr("cast(n_flagged as double) / cast(nullif(n_checked, 0) as double)"))
      .orderBy("method")
  }
  private def q169Sql: String = {
    val lex = DedupOps.oracleSql("q89_contamination")
    val sem = VectorOps.oracleSql("q138_semantic_decontam")
    val spl = DedupOps.oracleSql("q134_split_decontam")
    s"""WITH lex AS ($lex), sem AS ($sem), spl AS ($spl),
       |u AS (
       |  SELECT 'lexical_ngram' AS method, CAST(COUNT(*) AS BIGINT) AS n_checked,
       |    CAST(COUNT(*) FILTER (WHERE contaminated) AS BIGINT) AS n_flagged FROM lex
       |  UNION ALL
       |  SELECT 'semantic_cosine', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(*) FILTER (WHERE contaminated) AS BIGINT) FROM sem
       |  UNION ALL
       |  SELECT 'split_leakage', CAST(COUNT(*) AS BIGINT),
       |    CAST(COUNT(*) FILTER (WHERE leaked) AS BIGINT) FROM spl)
       |SELECT method, n_checked, n_flagged,
       |  CAST(n_flagged AS DOUBLE) / CAST(nullif(n_checked, 0) AS DOUBLE) AS flag_rate
       |FROM u ORDER BY method""".stripMargin
  }

  /** q170 — containment similarity (Broder 1997's second resemblance
    * measure): for q28's near-dup pairs, `|A∩B|/|A|` and `|A∩B|/|B|`
    * over the 3-gram shingle sets — the ASYMMETRIC signal Jaccard
    * hides: a short doc quoted wholesale inside a long one has low
    * Jaccard but containment ≈ 1, and dedup policy treats
    * quote-inclusion differently from mutual near-duplication. Flags
    * `near_subset` when either direction ≥ 0.9.
    *
    * Scale shape: q28's audited plan + two doc_id-keyed shingle-set
    * fetches + row-local intersections on candidate pairs only. */
  private def q170(s: SparkSession, d: String): DataFrame = {
    val pairs = graft.SparkEntry.queries("q28_dedup_minhash_lsh")(s, d)
    // CASE guard: sequence(1, n) DESCENDS for n < 1 (sequence(1,-1) =
    // [1,0,-1] → slice(toks, 0, 3) throws), so sub-3-token docs get the
    // empty set explicitly — found by tools/fuzz_corpus.py
    val sets = t(s, d, "documents")
      .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("toks"))
      .select(col("doc_id"), array_distinct(expr(
        "CASE WHEN size(toks) >= 3 THEN transform(sequence(1, size(toks) - 2)," +
          " i -> array_join(slice(toks, i, 3), ' '))" +
          " ELSE array() END")).as("shs"))
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), Seq("doc_b"))
      .withColumn("inter", expr("size(array_intersect(sa, sb))").cast("long"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("inter"),
        expr("size(sa)").cast("long").as("n_a"),
        expr("size(sb)").cast("long").as("n_b"),
        expr("cast(inter as double) / cast(size(sa) as double)").as("containment_a"),
        expr("cast(inter as double) / cast(size(sb) as double)").as("containment_b"))
      .withColumn("near_subset",
        expr("greatest(containment_a, containment_b) >= 9e-1"))
      .orderBy("doc_a", "doc_b")
  }
  private def q170Sql: String = {
    val mh = DedupOps.oracleSql("q28_dedup_minhash_lsh")
    s"""WITH mh AS ($mh),
       |st AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(string_split(COALESCE(text, ''), ' ')) - 2),
       |    i -> array_to_string((string_split(COALESCE(text, ''), ' '))[i:i + 2], ' '))) AS shs
       |  FROM documents),
       |j AS (
       |  SELECT mh.doc_a, mh.doc_b, mh.jaccard,
       |    CAST(len(list_intersect(sa.shs, sb.shs)) AS BIGINT) AS inter,
       |    CAST(len(sa.shs) AS BIGINT) AS n_a, CAST(len(sb.shs) AS BIGINT) AS n_b
       |  FROM mh JOIN st sa ON sa.doc_id = mh.doc_a
       |        JOIN st sb ON sb.doc_id = mh.doc_b)
       |SELECT doc_a, doc_b, jaccard, inter, n_a, n_b,
       |  CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment_a,
       |  CAST(inter AS DOUBLE) / CAST(n_b AS DOUBLE) AS containment_b,
       |  greatest(CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE),
       |    CAST(inter AS DOUBLE) / CAST(n_b AS DOUBLE)) >= 9e-1 AS near_subset
       |FROM j ORDER BY doc_a, doc_b""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q143_zipf_fit", q143, Some(q143Sql)),
    Q("q144_ccnet_buckets", q144, Some(q144Sql)),
    Q("q145_quality_signals", q145, Some(q145Sql)),
    Q("q146_tfidf_keywords", q146, Some(q146Sql)),
    Q("q147_source_overlap", q147, Some(q147Sql)),
    Q("q148_vocab_growth", q148, Some(q148Sql)),
    Q("q149_gate_calibration", q149, Some(q149Sql)),
    Q("q150_dedup_audit", q150, Some(q150Sql)),
    Q("q151_pii_scan", q151, Some(q151Sql)),
    Q("q152_encoding_health", q152, Some(q152Sql)),
    Q("q153_source_kl", q153, Some(q153Sql)),
    Q("q154_signal_corr", q154, Some(q154Sql)),
    Q("q155_contrastive_views", q155, Some(q155Sql)),
    Q("q156_extraction_probes", q156, Some(q156Sql)),
    Q("q157_lsh_s_curve", q157, Some(q157Sql)),
    Q("q158_blocklist_stats", q158, Some(q158Sql)),
    Q("q159_sft_loss_mask", q159, Some(q159Sql)),
    Q("q160_packing_stats", q160, Some(q160Sql)),
    Q("q161_copy_direction", q161, Some(q161Sql)),
    Q("q162_data_value", q162, Some(q162Sql)),
    Q("q163_edit_distance_verify", q163, Some(q163Sql)),
    Q("q164_url_canonicalize", q164, Some(q164Sql)),
    Q("q165_embedding_pool", q165, Some(q165Sql)),
    Q("q166_ppl_outliers", q166, Some(q166Sql)),
    Q("q167_event_drift", q167, Some(q167Sql)),
    Q("q168_jm_interpolation", q168, Some(q168Sql)),
    Q("q169_contamination_card", q169, Some(q169Sql)),
    Q("q170_containment", q170, Some(q170Sql)))
}
