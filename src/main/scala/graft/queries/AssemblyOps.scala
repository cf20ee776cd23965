package graft.queries

import graft.{Scalars, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators — the steps BETWEEN cleaning/dedup and the
  * trainer that an actual pretraining data pipeline runs:
  *
  *  - q109: duplicate-cluster REPRESENTATIVE selection — q28/q40 find
  *    near-dup pairs, q42 labels components; this picks which member of
  *    each cluster survives (best quality, deterministic tie-break), the
  *    "keep one per cluster" action every dedup paper specifies (e.g.
  *    Lee et al. 2022 §3 keep-one; RefinedWeb §3.2).
  *  - q110: token-budget selection — pretraining mixes are budgeted in
  *    TOKENS, not documents; select docs per source in deterministic
  *    md5-ticket order until the source's token budget fills (greedy
  *    fill: the doc that crosses the boundary is kept).
  *  - q111: fractional epoch upsampling — mixture weights prescribe
  *    non-integer repetition counts (LLaMA's Wikipedia 2.45 epochs,
  *    Touvron et al. 2023 Table 1); emit floor(r) full copies plus one
  *    more for a deterministic md5-ticket fraction of docs.
  *
  * All three are oracled against the one-level/windowed DuckDB
  * restatement, so hash equality proves the scale-shaped decompositions
  * exact (the q92/q93 proof pattern).
  */
object AssemblyOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** q109 — keep-best-per-duplicate-cluster.
    *
    * Quality proxy = n_chars (longest member wins, ties to the lowest
    * doc_id); a production deployment swaps in a model score through the
    * same aggregation. The winner is an AGGREGATION-based argmax —
    * min(struct(-quality, doc_id)) per cluster — not a row_number window:
    * hash aggregation with map-side partials, no per-cluster sort, and no
    * corpus-proportional window partition anywhere.
    *
    * 100 TB shape: every per-cluster computation runs on the near-dup
    * SUBGRAPH only (docs touched by a q27 edge — sparse by construction),
    * reached from the corpus via a broadcast join; singletons never enter
    * a shuffle at all. The corpus-side plan is scan → two broadcast hash
    * joins → project; the only corpus-wide exchange is the deterministic
    * output orderBy, which a real pipeline drops. */
  private def q109(s: SparkSession, d: String): DataFrame = {
    val labels = PipelineOps.clusterLabels(s, d) // edge-touched docs only
    val docs = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
    // Scores for clustered docs: corpus ⋈ broadcast(labels) — tiny result.
    val scored = docs.join(broadcast(labels), Seq("doc_id"))
    val winners = scored.groupBy(col("cluster_id"))
      .agg(
        min(struct((-col("n_chars")).as("negq"), col("doc_id").as("doc_id")))
          .as("w"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster_id"), col("w.doc_id").as("keep_doc"),
        col("cluster_size"))
    docs
      .join(broadcast(labels), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("n_chars"))
      .join(broadcast(winners), Seq("cluster_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        col("n_chars").as("quality"),
        // Singletons (no winner row) are their own representative.
        coalesce(col("doc_id") === col("keep_doc"), lit(true)).as("keep"))
      .orderBy("doc_id")
  }
  private val q109Sql = PipelineOps.ccCte +
    """,
      |scored AS (
      |  SELECT l.doc_id, l.cluster_id, d.n_chars
      |  FROM labels l JOIN documents d ON l.doc_id = d.doc_id),
      |winners AS (
      |  SELECT cluster_id, doc_id AS keep_doc FROM (
      |    SELECT cluster_id, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY cluster_id
      |        ORDER BY n_chars DESC, doc_id) AS rn
      |    FROM scored) w WHERE rn = 1)
      |SELECT s.doc_id, s.cluster_id, z.cluster_size, s.n_chars AS quality,
      |  s.doc_id = w.keep_doc AS keep
      |FROM scored s JOIN winners w ON s.cluster_id = w.cluster_id
      |  JOIN sizes2 z ON s.cluster_id = z.cluster_id
      |ORDER BY s.doc_id""".stripMargin

  /** q110 — per-source token-budget selection (greedy ticket-order fill).
    *
    * Budget = 30% of each source's tokens, integer-exact ((3·total) div
    * 10); selection order is the deterministic smallest-md5-ticket order
    * (q53/q93 family — membership is a pure function of the data). A doc
    * is kept iff its FIRST token lands inside the budget, so the
    * boundary-crossing doc is kept (greedy fill) and the kept set is a
    * prefix of the ticket order — exactly how a token-budgeted mix is
    * cut in practice.
    *
    * Scale shape: the per-source running token sum is the q92/q93
    * TWO-LEVEL decomposition — a window partitioned by raw `source`
    * alone would sort corpus/|sources| rows in ONE task (source
    * cardinality does not grow with the corpus). Tickets' leading k hex
    * chars (ticketPrefixFor, 16^k ≈ √n uniform buckets) bucket the
    * order-by key space; bucket-local cumsum windows see ~√n rows, the
    * per-bucket summary window sees 16^k ≈ √n rows per source, and the
    * composition is integer-exact. The oracle states the ONE-level
    * running sum — hash equality proves the decomposition. */
  private def q110(s: SparkSession, d: String): DataFrame = {
    val k = PipelineOps.ticketPrefixFor(t(s, d, "documents").count())
    // Referenced twice (bucket offsets + the probe): materialize per the
    // QueryModule convention so text is tokenized and hashed once.
    val tok = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tokens"),
        md5(concat_ws("|", lit("budget"), col("doc_id"))).as("tkt"))
      .withColumn("bucket", substring(col("tkt"), 1, k))
      .localCheckpoint(true)
    val budgets = tok.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("total_tokens"))
      .select(col("source"), expr("(3 * total_tokens) div 10").as("budget"))
    val wLocal = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("tkt"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBuckets = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tok.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .select(col("source"), col("bucket"),
        coalesce(sum(col("bucket_tokens")).over(wBuckets), lit(0L))
          .as("bucket_offset"))
    tok
      .withColumn("local_cum", sum(col("n_tokens")).over(wLocal))
      .join(offsets, Seq("source", "bucket"))
      .withColumn("cum_tokens", col("bucket_offset") + col("local_cum"))
      .join(broadcast(budgets), "source")
      .filter(col("cum_tokens") - col("n_tokens") < col("budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"), col("budget"))
      .orderBy("doc_id")
  }
  private val q110Sql =
    """WITH tok AS (
      |  SELECT doc_id, source,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |    md5('budget|' || CAST(doc_id AS VARCHAR)) AS tkt
      |  FROM documents),
      |b AS (
      |  SELECT source,
      |    (3 * CAST(SUM(n_tokens) AS BIGINT)) // 10 AS budget
      |  FROM tok GROUP BY source),
      |cum AS (
      |  SELECT doc_id, source, n_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY tkt, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_tokens
      |  FROM tok)
      |SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens, b.budget
      |FROM cum c JOIN b USING (source)
      |WHERE c.cum_tokens - c.n_tokens < b.budget
      |ORDER BY c.doc_id""".stripMargin

  /** q111 — fractional epoch upsampling toward source balance.
    *
    * Repetition factor r_s = min(4, √(max_docs / n_docs_s)) — the α=0.5
    * temperature point of the p ∝ n^α family applied as EPOCH counts
    * (√ because IEEE sqrt is correctly rounded in both engines, the q93
    * precedent), capped so no source repeats more than 4×. Every doc
    * emits floor(r_s) full copies; a deterministic md5-ticket fraction
    * (r_s − floor(r_s)) of docs emits one more. The fractional test
    * compares the ticket's first 7 hex chars against the threshold
    * rendered as FIXED-WIDTH LOWERCASE HEX — fixed-length hex orders
    * like its numeric value (the q100 idiom), so neither engine parses
    * hex. r_s ≥ 1 by construction (max/n ≥ 1), so `sequence(1, n)` never
    * sees an empty/reversed range (Spark would infer step −1, not empty).
    *
    * Scale shape: per-source stats are |sources| rows (broadcast);
    * copy emission is a row-local explode — corpus-linear output, zero
    * shuffles beyond the output orderBy. The 1-row global max attaches
    * via Scalars.withScalar (enforced ≤1-row broadcast). */
  private def q111(s: SparkSession, d: String): DataFrame = {
    val stats = t(s, d, "documents").groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val m = stats.agg(max(col("n_docs")).as("m_docs"))
    val plan = Scalars.withScalar(stats, m)
      .withColumn("reps",
        least(lit(4.0), sqrt(col("m_docs").cast("double") /
          col("n_docs").cast("double"))))
      .select(col("source"),
        floor(col("reps")).cast("bigint").as("full_copies"),
        lpad(lower(hex(
          floor((col("reps") - floor(col("reps"))) * lit(268435456.0))
            .cast("bigint"))), 7, "0").as("thresh_hex"))
    t(s, d, "documents").select(col("doc_id"), col("source"))
      .join(broadcast(plan), "source")
      .withColumn("n_copies",
        col("full_copies") +
          when(substring(md5(concat_ws("|", lit("up"), col("doc_id"))), 1, 7)
            < col("thresh_hex"), 1L).otherwise(0L))
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }
  private val q111Sql =
    """WITH st AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY source),
      |m AS (SELECT MAX(n_docs) AS m_docs FROM st),
      |r AS (
      |  SELECT st.source, st.n_docs,
      |    LEAST(CAST(4.0 AS DOUBLE),
      |      SQRT(CAST(m.m_docs AS DOUBLE) / CAST(st.n_docs AS DOUBLE))) AS reps
      |  FROM st, m),
      |p AS (
      |  SELECT source,
      |    CAST(FLOOR(reps) AS BIGINT) AS full_copies,
      |    lpad(lower(hex(CAST(FLOOR((reps - FLOOR(reps)) *
      |      CAST(268435456.0 AS DOUBLE)) AS BIGINT))), 7, '0') AS thresh_hex
      |  FROM r),
      |c AS (
      |  SELECT d.doc_id, d.source,
      |    p.full_copies + CASE
      |      WHEN substr(md5('up|' || CAST(d.doc_id AS VARCHAR)), 1, 7)
      |        < p.thresh_hex THEN 1 ELSE 0 END AS n_copies
      |  FROM documents d JOIN p USING (source))
      |SELECT * FROM (
      |  SELECT doc_id, source, n_copies,
      |    unnest(generate_series(1, n_copies)) AS copy_idx
      |  FROM c) x
      |ORDER BY doc_id, copy_idx""".stripMargin

  /** q120 — the data-mixture report: the per-source table every
    * pretraining paper publishes beside its corpus (LLaMA Table 1, The
    * Pile §2, Dolma's mixture tables): document/token counts, raw
    * shares, the α=0.5 temperature share (q93's family, over TOKENS),
    * the q111 epoch factor, and the effective post-upsampling token
    * mass. One |sources|-row result.
    *
    * Portability: shares are single divisions of exact BIGINT sums; the
    * temperature normalizer Σ√tokens is an ORDERED fold over the
    * source-sorted |sources|-element list (the graft_dot discipline —
    * a hash-agg SUM of doubles would be partitioning/engine-order
    * dependent), keyed on (coalesce(source,''), weight) in both engines
    * so neither a NULL source (Spark sorts nulls first, DuckDB last —
    * the q93 lesson) nor a NULL/''-source key collision can reorder the
    * fold: Spark's array_sort tie-breaks structs by the weight field,
    * so the oracle's list() states the same secondary key (equal
    * (key, weight) elements are interchangeable under +). Scale shape: one corpus pass (token-count
    * hash agg by source), everything after runs on |sources| rows with
    * three enforced ≤1-row scalar attaches. */
  private def q120(s: SparkSession, d: String): DataFrame = {
    val st = t(s, d, "documents")
      .select(col("source"),
        size(split(trim(coalesce(col("text"), lit(""))), "\\s+"))
          .cast("bigint").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val tots = st.agg(sum(col("n_docs")).as("td"), sum(col("n_tokens")).as("tt"))
    val m = st.agg(max(col("n_docs")).as("m_docs"))
    val ws = st.agg(expr(
      "aggregate(array_sort(collect_list(struct(coalesce(source, '') as k," +
        " sqrt(cast(n_tokens as double)) as w)))," +
        " cast(0 as double), (a, x) -> a + x.w)").as("wsum"))
    Scalars.withScalar(Scalars.withScalar(Scalars.withScalar(st, tots), m), ws)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_docs").cast("double") / col("td").cast("double")).as("doc_share"),
        (col("n_tokens").cast("double") / col("tt").cast("double")).as("token_share"),
        (sqrt(col("n_tokens").cast("double")) / col("wsum")).as("temp_share"),
        least(lit(4.0), sqrt(col("m_docs").cast("double") /
          col("n_docs").cast("double"))).as("epochs"))
      .withColumn("effective_tokens",
        col("n_tokens").cast("double") * col("epochs"))
      .orderBy("source")
  }
  private val q120Sql =
    """WITH tok AS (
      |  SELECT source,
      |    CAST(len(regexp_split_to_array(trim(COALESCE(text, '')), '\s+')) AS BIGINT) AS nt
      |  FROM documents),
      |st AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(nt) AS BIGINT) AS n_tokens
      |  FROM tok GROUP BY source),
      |tots AS (
      |  SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
      |    CAST(SUM(n_tokens) AS BIGINT) AS tt FROM st),
      |m AS (SELECT MAX(n_docs) AS m_docs FROM st),
      |ws AS (
      |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list(SQRT(CAST(n_tokens AS DOUBLE))
      |      ORDER BY COALESCE(source, ''), SQRT(CAST(n_tokens AS DOUBLE)))),
      |    (a, b) -> a + b) AS wsum
      |  FROM st)
      |SELECT st.source, st.n_docs, st.n_tokens,
      |  CAST(st.n_docs AS DOUBLE) / CAST(tots.td AS DOUBLE) AS doc_share,
      |  CAST(st.n_tokens AS DOUBLE) / CAST(tots.tt AS DOUBLE) AS token_share,
      |  SQRT(CAST(st.n_tokens AS DOUBLE)) / ws.wsum AS temp_share,
      |  LEAST(CAST(4.0 AS DOUBLE),
      |    SQRT(CAST(m.m_docs AS DOUBLE) / CAST(st.n_docs AS DOUBLE))) AS epochs,
      |  CAST(st.n_tokens AS DOUBLE) * LEAST(CAST(4.0 AS DOUBLE),
      |    SQRT(CAST(m.m_docs AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))
      |    AS effective_tokens
      |FROM st, tots, m, ws ORDER BY st.source""".stripMargin

  /** q125 — deterministic weighted sampling WITHOUT replacement, per
    * source (Efraimidis & Spirakis 2006, "Weighted random sampling with
    * a reservoir"): each doc draws u ∈ (0,1] and competes on key
    * u^(1/w); the top-k keys ARE a weight-proportional sample without
    * replacement. This is the principled member of the sampling family
    * beside q53's uniform stratified sample and q110's greedy
    * token-budget fill — the op a mixture executes when a source must
    * contribute k docs chosen proportional-to-length.
    *
    * Determinism (the q53/q93 membership idiom): u comes from an md5
    * ticket — u_int = first 60 ticket bits, u = (u_int+1)/2^60 — so
    * membership is a pure function of the data, identical in both
    * engines and across reruns. Comparing on ln-keys is order-isomorphic
    * to u^(1/w): key = ln(u)/w = (PortableLn(u_int+1) − 60·ln2)/w, every
    * step an IEEE correctly-rounded op both engines compute identically
    * ([[LmOps.PortableLn]]; 60·ln2 is one double multiply of exact
    * constants).
    *
    * Scale shape: per-source top-k runs as a TWO-STAGE tournament, the
    * q93 bucket discipline — stage 1 ranks inside (source, ticket-prefix
    * bucket) partitions (16^kb ≈ √n buckets of ~√n rows, balanced
    * because md5 is uniform) and keeps each bucket's local top-k; stage
    * 2 ranks the ≤ k·16^kb per-source survivors. Global top-k ⊆ union of
    * bucket top-k, and every row outranking a survivor also survives
    * stage 1, so survivor ranks ARE global ranks: the oracle's ONE-level
    * per-source window proves the tournament exact by hash equality.
    * Both stages are √n-bounded — no corpus-proportional window
    * partition anywhere. */
  private def q125(s: SparkSession, d: String): DataFrame = {
    val k = 32
    val kb = PipelineOps.ticketPrefixFor(t(s, d, "documents").count())
    val keyed = t(s, d, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(coalesce(col("text"), lit(""))), "\\s+"))
          .cast("long").as("weight"),
        md5(concat_ws("|", lit("es"), col("doc_id"))).as("tkt"))
      .withColumn("ui", expr("cast(conv(substring(tkt, 1, 15), 16, 10) as bigint)"))
      .withColumn("bucket", substring(col("tkt"), 1, kb))
    val scored = LmOps.PortableLn.steps("(ui + 1)", "u", spark = true)
      .foldLeft(keyed) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .withColumn("es_key", expr(
        "(lnu - (6e1 * 6.931471805599453e-1)) / cast(weight as double)"))
    val wLocal = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("es_key").desc, col("doc_id"))
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(col("es_key").desc, col("doc_id"))
    scored
      .withColumn("lr", row_number().over(wLocal))
      .filter(col("lr") <= k)
      .withColumn("smp_rank", row_number().over(wSrc).cast("long"))
      .filter(col("smp_rank") <= k)
      .select(col("source"), col("smp_rank"), col("doc_id"), col("weight"),
        col("es_key"))
      .orderBy(col("source"), col("smp_rank"))
  }
  private def q125Sql: String = {
    val (last, ctes) = LmOps.lnCtes("u0", "e", Seq("(ui + 1)" -> "u"))
    s"""WITH docs AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+'))
       |      AS BIGINT) AS weight,
       |    md5('es|' || CAST(doc_id AS VARCHAR)) AS tkt
       |  FROM documents),
       |u0 AS (
       |  SELECT *, CAST('0x' || substr(tkt, 1, 15) AS BIGINT) AS ui FROM docs),
       |${ctes.mkString(",\n")},
       |scored AS (
       |  SELECT source, doc_id, weight,
       |    (lnu - (6e1 * 6.931471805599453e-1)) / CAST(weight AS DOUBLE)
       |      AS es_key
       |  FROM $last),
       |rk AS (
       |  SELECT source, doc_id, weight, es_key,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY es_key DESC, doc_id) AS BIGINT) AS smp_rank
       |  FROM scored)
       |SELECT source, smp_rank, doc_id, weight, es_key
       |FROM rk WHERE smp_rank <= 32 ORDER BY source, smp_rank""".stripMargin
  }

  /** q126 — one DoReMi domain-reweighting step (Xie et al. 2023,
    * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining"): domains whose measured loss EXCEEDS the reference
    * get their mixture weight multiplied up,
    * `α'_d ∝ α_d · exp(η · excess_d)`, normalized, then smoothed with
    * the uniform distribution — the Group-DRO update at the heart of the
    * method, run for one step with the q106 bigram LM standing in for
    * the proxy model (η = 1, smoothing c = 1/8, exact in binary).
    * Composes three published pieces: q106's per-doc scores, q120's
    * token-share initial mixture, and [[LmOps.PortableExp]] for the one
    * transcendental the update needs — every arithmetic step IEEE
    * bit-identical in both engines (excess is clamped ≥ 0, satisfying
    * PortableExp's precondition; domain and baseline losses are
    * doc_id-ordered IEEE folds, the graft_dot discipline; the
    * normalizer is the q120 (key, weight)-sorted |sources|-row fold).
    *
    * Scale shape: q106's scoring is the corpus-proportional part
    * (audited there); this adds one doc-keyed equi-join to attach
    * sources, one hash aggregation to |sources| rows, and K-row
    * arithmetic behind three enforced ≤1-row scalar attaches. The
    * per-domain/baseline ordered folds collect one double per doc —
    * q106's existing percentile-width driver note applies (at 100 TB,
    * block-wise decimal partial sums replace the fold). */
  private def q126(s: SparkSession, d: String): DataFrame = {
    val pd = LmOps.lmScores(s, d).select(col("doc_id"), col("avg_logprob"))
    val src = t(s, d, "documents").select(col("doc_id"), col("source"),
      size(split(trim(coalesce(col("text"), lit(""))), "\\s+"))
        .cast("long").as("nt"))
    val joined = pd.join(src, "doc_id")
      .localCheckpoint(true) // consumers: per-source agg + corpus baseline
    val fold = "aggregate(array_sort(collect_list(struct(doc_id, avg_logprob)))," +
      " cast(0 as double), (a, x) -> a + x.avg_logprob)"
    val per = joined.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        expr(fold).as("lp_sum"))
      .withColumn("domain_loss", expr("-(lp_sum) / cast(n_docs as double)"))
    val base = joined
      .agg(count(lit(1)).as("bn"), expr(fold).as("blp"))
      .select(expr("-(blp) / cast(bn as double)").as("baseline_loss"))
    val tots = per.agg(sum(col("n_tokens")).as("tok_total"),
      count(lit(1)).as("k_sources"))
    val ex = Scalars.withScalar(Scalars.withScalar(per, base), tots)
      .withColumn("excess_loss", expr("greatest(domain_loss - baseline_loss, 0e0)"))
      .withColumn("alpha_init",
        expr("cast(n_tokens as double) / cast(tok_total as double)"))
    val scored = LmOps.PortableExp.steps("excess_loss", "f", spark = true)
      .foldLeft(ex) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .withColumn("w_raw", expr("alpha_init * expf"))
      .localCheckpoint(true) // K rows; consumers: normalizer + output
    val norm = scored.agg(expr(
      "aggregate(array_sort(collect_list(struct(coalesce(source, '') as k," +
        " w_raw as w))), cast(0 as double), (a, x) -> a + x.w)").as("norm"))
    Scalars.withScalar(scored, norm)
      .select(col("source"), col("n_docs"), col("n_tokens"), col("domain_loss"),
        col("excess_loss"), col("alpha_init"), col("expf").as("update_factor"),
        expr("((1e0 - 1.25e-1) * (w_raw / norm))" +
          " + (1.25e-1 / cast(k_sources as double))").as("alpha_doremi"))
      .orderBy("source")
  }
  private def q126Sql: String = {
    val pq = LmOps.oracleSql("q106_lm_perplexity")
    val (last, ctes) = LmOps.expCtes("e0", "e", Seq("excess_loss" -> "f"))
    s"""WITH pq AS ($pq),
       |tok AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+'))
       |      AS BIGINT) AS nt
       |  FROM documents),
       |j AS (
       |  SELECT p.doc_id, p.avg_logprob, t.source, t.nt
       |  FROM pq p JOIN tok t USING (doc_id)),
       |per AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(nt) AS BIGINT) AS n_tokens,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(avg_logprob ORDER BY doc_id)), (a, b) -> a + b) AS lp_sum
       |  FROM j GROUP BY source),
       |per2 AS (
       |  SELECT *, -(lp_sum) / CAST(n_docs AS DOUBLE) AS domain_loss FROM per),
       |base AS (
       |  SELECT -(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list(avg_logprob ORDER BY doc_id)), (a, b) -> a + b))
       |    / CAST(COUNT(*) AS DOUBLE) AS baseline_loss
       |  FROM j),
       |tots AS (
       |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tok_total,
       |    CAST(COUNT(*) AS BIGINT) AS k_sources FROM per),
       |e0 AS (
       |  SELECT per2.*, base.baseline_loss, tots.tok_total, tots.k_sources,
       |    GREATEST(domain_loss - base.baseline_loss, 0e0) AS excess_loss,
       |    CAST(n_tokens AS DOUBLE) / CAST(tots.tok_total AS DOUBLE) AS alpha_init
       |  FROM per2, base, tots),
       |${ctes.mkString(",\n")},
       |w0 AS (SELECT *, alpha_init * expf AS w_raw FROM $last),
       |nrm AS (
       |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list(w_raw ORDER BY COALESCE(source, ''), w_raw)),
       |    (a, b) -> a + b) AS norm
       |  FROM w0)
       |SELECT source, n_docs, n_tokens, domain_loss, excess_loss, alpha_init,
       |  expf AS update_factor,
       |  ((1e0 - 1.25e-1) * (w_raw / nrm.norm))
       |    + (1.25e-1 / CAST(k_sources AS DOUBLE)) AS alpha_doremi
       |FROM w0, nrm ORDER BY source""".stripMargin
  }

  /** q140 — length-MATCHED control sampling for data ablations: for the
    * documents a gate rejects (treatment = fails the Gopher rule set,
    * q88), draw an equal-count control sample from the KEPT pool inside
    * every length stratum — the matched-covariate design a data-curation
    * ablation needs before attributing a downstream metric to the gate
    * itself rather than to the length shift it induces (matching on
    * observables is the Rubin causal-design move; data-curation studies,
    * e.g. Longpre et al. 2023's "Pretrainer's Guide", hold token counts
    * fixed across compared corpora for exactly this reason).
    *
    * Strata are fixed-width token-count buckets (`n_tokens div 50` —
    * row-local, no quantile pass); within a stratum the control draw is
    * the deterministic md5-ticket rank (the q53/q125 membership idiom),
    * capped at the stratum's treatment count k_b. Buckets with no
    * treatment docs contribute no controls; buckets with fewer kept than
    * treated docs are matched up to availability (the design's standard
    * caveat, reported by the count asymmetry in the output).
    *
    * Scale shape: the per-stratum top-k_b runs as the q125 two-stage
    * ticket-prefix tournament — stage 1 ranks inside (bucket, prefix)
    * partitions (~√n rows each), stage 2 ranks the ≤ k_b·16^kb
    * survivors per bucket; global top-k_b ⊆ union of prefix top-k_b for
    * ANY k_b, so survivor ranks are exact and the oracle's one-level
    * window proves it by hash equality. k_b attaches via a broadcast
    * join on the bounded bucket table. The gate verdict reuses q88's
    * published query (one corpus pass, hash aggregations only). */
  private def q140(s: SparkSession, d: String): DataFrame = {
    val kb = PipelineOps.ticketPrefixFor(t(s, d, "documents").count())
    val gate = graft.SparkEntry.queries("q88_gopher_quality")(s, d)
      .select(col("doc_id"), col("passes_gopher"))
    val flagged = t(s, d, "documents")
      .select(col("doc_id"),
        size(split(trim(coalesce(col("text"), lit(""))), "\\s+"))
          .cast("bigint").as("n_tokens"),
        md5(concat_ws("|", lit("ctl"), col("doc_id"))).as("tkt"))
      .join(gate, Seq("doc_id"), "left")
      .withColumn("treated", !coalesce(col("passes_gopher"), lit(false)))
      .withColumn("lbucket", expr("n_tokens div 50"))
      .localCheckpoint(true) // consumers: k_b counts + controls + treatment rows
    val kPer = flagged.filter(col("treated")).groupBy(col("lbucket"))
      .agg(count(lit(1)).as("k_b"))
    val kept = flagged.filter(!col("treated"))
      .join(broadcast(kPer), Seq("lbucket"))
      .withColumn("tpfx", substring(col("tkt"), 1, kb))
    val w1 = Window.partitionBy(col("lbucket"), col("tpfx"))
      .orderBy(col("tkt"), col("doc_id"))
    val w2 = Window.partitionBy(col("lbucket")).orderBy(col("tkt"), col("doc_id"))
    val controls = kept
      .withColumn("lr", row_number().over(w1)).filter(col("lr") <= col("k_b"))
      .withColumn("rk", row_number().over(w2)).filter(col("rk") <= col("k_b"))
      .select(lit("control").as("grp"), col("lbucket"), col("doc_id"), col("n_tokens"))
    val treats = flagged.filter(col("treated"))
      .select(lit("treatment").as("grp"), col("lbucket"), col("doc_id"), col("n_tokens"))
    treats.union(controls).orderBy("lbucket", "grp", "doc_id")
  }
  private def q140Sql: String = {
    val g = TextOps.oracleSql("q88_gopher_quality")
    s"""WITH gq AS ($g),
       |docs AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS BIGINT) AS n_tokens,
       |    md5('ctl|' || CAST(doc_id AS VARCHAR)) AS tkt
       |  FROM documents),
       |f AS (
       |  SELECT d.doc_id, d.n_tokens, d.tkt, d.n_tokens // 50 AS lbucket,
       |    NOT COALESCE(gq.passes_gopher, false) AS treated
       |  FROM docs d LEFT JOIN gq USING (doc_id)),
       |kper AS (
       |  SELECT lbucket, CAST(COUNT(*) AS BIGINT) AS k_b
       |  FROM f WHERE treated GROUP BY lbucket),
       |ctl AS (
       |  SELECT f.doc_id, f.lbucket, f.n_tokens, k.k_b,
       |    ROW_NUMBER() OVER (PARTITION BY f.lbucket ORDER BY f.tkt, f.doc_id) AS rk
       |  FROM f JOIN kper k USING (lbucket) WHERE NOT treated)
       |SELECT 'treatment' AS grp, lbucket, doc_id, n_tokens FROM f WHERE treated
       |UNION ALL
       |SELECT 'control' AS grp, lbucket, doc_id, n_tokens FROM ctl WHERE rk <= k_b
       |ORDER BY lbucket, grp, doc_id""".stripMargin
  }

  /** q207 — dedup-survivor reweighting: the step that makes keep-one
    * dedup DISTRIBUTION-PRESERVING. Dropping near-duplicates (q109)
    * changes the corpus distribution — a document that appeared 40×
    * carried 40× the sampling mass, and deleting 39 copies silently
    * down-weights whatever that document represents (the bias Lee et
    * al. 2022 §5 measure; CCNet keeps counts for exactly this reason).
    * The fix every count-preserving pipeline ships: the KEEPER inherits
    * its cluster's full token mass as a sampling weight —
    * weight = cluster_tokens / keeper_tokens (≥ 1; dropped docs 0) —
    * so downstream samplers draw the deduped corpus AS IF the
    * duplicates were still there, without storing them.
    *
    * Composition over q109 through the registry (the q196/q200
    * convention); the oracle embeds q109's published SQL. Exact BIGINT
    * token sums with ONE final division per row, so the hash gate holds
    * bit-exactly.
    *
    * Scale shape: q109's output joins the row-local token count on
    * doc_id (same key its own plan already carries); the cluster mass
    * is ONE hash aggregation keyed by cluster_id (near-dup subgraph +
    * singletons — no new corpus-wide structure); the weight is
    * row-local. No window, no driver state. */
  private def q207(s: SparkSession, d: String): DataFrame = {
    val rep = graft.SparkEntry.queries("q109_cluster_best")(s, d)
      .select(col("doc_id"), col("cluster_id"), col("keep"))
    val tok = t(s, d, "documents")
      .select(col("doc_id"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("n_tokens"))
    val j = rep.join(tok, Seq("doc_id")).localCheckpoint(true) // consumers: mass + output
    val cm = j.groupBy(col("cluster_id"))
      .agg(sum(col("n_tokens")).as("cluster_tokens"))
    j.join(cm, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("keep"), col("n_tokens"),
        col("cluster_tokens"),
        when(col("keep") && col("n_tokens") > 0,
          col("cluster_tokens").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("weight"))
      .orderBy("doc_id")
  }
  // q109Sql referenced directly, not via oracleSql(...): the registry map
  // derives from `all`, whose initializer evaluates this oracle — the
  // indirection would deadlock object init.
  private def q207Sql: String =
    s"""WITH r AS ($q109Sql),
       |tok AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |j AS (
       |  SELECT r.doc_id, r.cluster_id, r.keep, tok.n_tokens
       |  FROM r JOIN tok USING (doc_id)),
       |cm AS (
       |  SELECT cluster_id, CAST(SUM(n_tokens) AS BIGINT) AS cluster_tokens
       |  FROM j GROUP BY cluster_id)
       |SELECT j.doc_id, j.cluster_id, j.keep, j.n_tokens, cm.cluster_tokens,
       |  CASE WHEN j.keep AND j.n_tokens > 0
       |    THEN CAST(cm.cluster_tokens AS DOUBLE) / CAST(j.n_tokens AS DOUBLE)
       |    ELSE 0e0 END AS weight
       |FROM j JOIN cm USING (cluster_id)
       |ORDER BY j.doc_id""".stripMargin

  // ---------------------------------------------------------------- q225

  /** q225 — per-source token-budget apportionment: the integer table
    * [[graft.streaming.BudgetStream]] and q110's boundary rule consume.
    * Mixture weights (temperature-adjusted token shares, τ = 0.75 — the
    * q171/UniMax-family smoothing, computed through the portable
    * ln → scale → exp pipeline) say WHAT FRACTION each source deserves;
    * this op turns fractions into EXACT integer token budgets that sum
    * to the global target T — Hamilton/largest-remainder apportionment
    * (floor every share, then grant the leftover units to the largest
    * remainders). Naive per-source rounding misses T by up to |sources|
    * tokens; the whole point of the op is Σ budget_s = T exactly, which
    * the spec asserts and the oracle hash-pins.
    *
    * Determinism discipline: shares are correctly-rounded doubles from
    * the portable weight pipeline; floors exact; the weight-sum is a
    * source-ordered fold (the q215 two-level rule — no cross-row double
    * sum); remainder ranking is sort_array(collect_list) + posexplode
    * over the SOURCE-CARDINALITY table (the q171 bounded-dim precedent
    * — a |sources|-sized single-row buffer, never corpus-proportional;
    * no window, no loop join), ties broken by source name.
    *
    * Scale shape: one corpus hash aggregation (per-source token
    * totals); everything after is source-cardinality work + three 1-row
    * scalars through the enforced withScalar bridge. */
  private def q225(s: SparkSession, d: String): DataFrame = {
    import graft.queries.{LmOps => L}
    val srcTok = t(s, d, "documents")
      .select(coalesce(col("source"), lit("")).as("source"),
        size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("toks"))
      .localCheckpoint(true) // consumers: weights, target scalar
    val wgt = (L.PortableLn.steps("toks", "t", spark = true) ++
        L.PortableExp.steps("(75e-2 * lnt)", "g", spark = true))
      .foldLeft(srcTok) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
      .select(col("source"), col("toks"), col("expg").as("w"))
      .localCheckpoint(true) // consumers: wsum fold, share table
    val tgt = srcTok.agg(expr("cast(sum(toks) div 2 as bigint)").as("tgt"))
    val wsum = wgt.agg(expr(
      "aggregate(sort_array(collect_list(struct(source, w)))," +
        " cast(0 as double), (a, x) -> a + x.w)").as("wsum"))
    val b = graft.Scalars.withScalar(graft.Scalars.withScalar(wgt, tgt), wsum)
      .withColumn("share", expr("(CAST(tgt AS DOUBLE) * w) / wsum"))
      .withColumn("base", expr("CAST(FLOOR(share) AS BIGINT)"))
      .withColumn("rem", expr("share - CAST(base AS DOUBLE)"))
      .localCheckpoint(true) // consumers: leftover scalar, ranking, output
    val leftover = b.agg((max(col("tgt")) - sum(col("base"))).as("lv"))
    val ranked = b
      .agg(sort_array(collect_list(struct((-col("rem")).as("nr"),
        col("source").as("source")))).as("xs"))
      .select(posexplode(col("xs")).as(Seq("rk", "x")))
      .select(col("x.source").as("source"), col("rk").cast("long").as("rk"))
    graft.Scalars.withScalar(b.join(ranked, Seq("source")), leftover)
      .withColumn("granted", col("rk") < col("lv"))
      .withColumn("budget",
        col("base") + when(col("granted"), 1L).otherwise(0L))
      .select(col("source"), col("toks"), col("w"), col("share"),
        col("base"), col("rem"), col("rk"), col("granted"), col("budget"))
      .orderBy("source")
  }
  private def q225Sql: String = {
    val (lnLast, lnC) = graft.queries.LmOps.lnCtes("st", "al", Seq("toks" -> "t"))
    val (expLast, expC) = graft.queries.LmOps.expCtes(lnLast, "ae",
      Seq("(75e-2 * lnt)" -> "g"))
    s"""WITH st AS MATERIALIZED (
       |  SELECT COALESCE(source, '') AS source,
       |    CAST(SUM(len(string_split(COALESCE(text, ''), ' '))) AS BIGINT) AS toks
       |  FROM documents GROUP BY COALESCE(source, '')),
       |${lnC.mkString(",\n")},
       |${expC.mkString(",\n")},
       |wg AS MATERIALIZED (SELECT source, toks, expg AS w FROM $expLast),
       |tg AS (SELECT CAST(SUM(toks) AS BIGINT) // 2 AS tgt FROM st),
       |ws AS (SELECT list_reduce(list_prepend(0.0, list(w ORDER BY source)),
       |  (a, b) -> a + b) AS wsum FROM wg),
       |b AS MATERIALIZED (
       |  SELECT source, toks, w,
       |    (CAST((SELECT tgt FROM tg) AS DOUBLE) * w) / (SELECT wsum FROM ws) AS share,
       |    CAST(FLOOR((CAST((SELECT tgt FROM tg) AS DOUBLE) * w) / (SELECT wsum FROM ws)) AS BIGINT) AS base
       |  FROM wg),
       |b2 AS MATERIALIZED (
       |  SELECT *, share - CAST(base AS DOUBLE) AS rem FROM b),
       |lv AS (SELECT (SELECT tgt FROM tg) - CAST(SUM(base) AS BIGINT) AS lv FROM b2),
       |ls AS (SELECT list(source ORDER BY rem DESC, source) AS l FROM b2),
       |rk AS (
       |  SELECT l[i] AS source, CAST(i - 1 AS BIGINT) AS rk
       |  FROM (SELECT l, unnest(generate_series(1, len(l))) AS i FROM ls))
       |SELECT b2.source, b2.toks, b2.w, b2.share, b2.base, b2.rem, rk.rk,
       |  rk.rk < (SELECT lv FROM lv) AS granted,
       |  b2.base + CASE WHEN rk.rk < (SELECT lv FROM lv) THEN 1 ELSE 0 END AS budget
       |FROM b2 JOIN rk ON rk.source = b2.source
       |ORDER BY b2.source""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q225_budget_apportionment", q225, Some(q225Sql)),
    Q("q120_mixture_report", q120, Some(q120Sql)),
    Q("q109_cluster_best", q109, Some(q109Sql)),
    Q("q207_dedup_reweighting", q207, Some(q207Sql)),
    Q("q110_token_budget", q110, Some(q110Sql)),
    Q("q111_epoch_upsample", q111, Some(q111Sql)),
    Q("q125_weighted_sample", q125, Some(q125Sql)),
    Q("q126_doremi_step", q126, Some(q126Sql)),
    Q("q128_sft_conversations", q128, Some(q128Sql)),
    Q("q140_matched_controls", q140, Some(q140Sql)))

  /** q128 — SFT conversation assembly: the post-training twin of the
    * pretraining ops — turn an event log into chat-template training
    * rows (every instruction-tuning pipeline renders conversations into
    * a role-tagged template before tokenization; turn-count bounds are
    * the standard validity gate). Per user: events in (time, event_id)
    * order become alternating user/assistant turns rendered as
    * `<|role|>content`, with turn counts, time span, and the 2–64-turn
    * SFT validity flag.
    *
    * Engine-parity trap this op pins down: Spark reads the nanosecond
    * parquet timestamps truncated to MICROS ([[graft.Tables]]), DuckDB
    * reads full nanos — so both sides key turn ORDER on epoch
    * microseconds (`unix_micros` / `epoch_us`, identical floor
    * truncation), tie-broken by event_id; raw `ORDER BY ts` would let
    * sub-microsecond differences reorder turns in one engine only.
    * event_type coalesces to '' because Spark's array_join DROPS null
    * elements while string_agg skips the whole NULL string — divergent
    * transcripts the moment a type is NULL.
    *
    * Scale shape: one hash aggregation keyed by user; the per-user
    * ordered render is a conversation-bounded collect (the q19
    * sessionization boundedness argument — a conversation that doesn't
    * fit one buffer isn't a training row). The oracle restates the
    * position-parity roles with a per-user ROW_NUMBER window. */
  private def q128(s: SparkSession, d: String): DataFrame = {
    t(s, d, "events")
      // ts arrives TIMESTAMP_NTZ from the driver parquet (or TIMESTAMP
      // from Tables' nanos conversion); session tz is UTC, so the cast
      // is instant-preserving in both cases.
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        col("event_id"), coalesce(col("event_type"), lit("")).as("event_type"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_turns"),
        min(col("us")).as("first_us"), max(col("us")).as("last_us"),
        expr("array_join(transform(" +
          "array_sort(collect_list(struct(us, event_id, event_type)))," +
          " (x, i) -> concat('<|', if(i % 2 = 0, 'user', 'assistant')," +
          " '|>', x.event_type)), '')").as("transcript"))
      .withColumn("n_transcript_chars", length(col("transcript")).cast("long"))
      .withColumn("valid_sft", col("n_turns") >= 2 && col("n_turns") <= 64)
      .orderBy("user_id")
  }
  /** def, not val: referenced by `all`, which is declared above. */
  private def q128Sql =
    """WITH e AS (
      |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us, event_id,
      |    COALESCE(event_type, '') AS event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
      |  CAST(MIN(us) AS BIGINT) AS first_us,
      |  CAST(MAX(us) AS BIGINT) AS last_us,
      |  string_agg('<|' || CASE WHEN rn % 2 = 1 THEN 'user' ELSE 'assistant'
      |    END || '|>' || event_type, '' ORDER BY rn) AS transcript,
      |  CAST(length(string_agg('<|' || CASE WHEN rn % 2 = 1 THEN 'user'
      |    ELSE 'assistant' END || '|>' || event_type, '' ORDER BY rn))
      |    AS BIGINT) AS n_transcript_chars,
      |  (COUNT(*) >= 2 AND COUNT(*) <= 64) AS valid_sft
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin
}
