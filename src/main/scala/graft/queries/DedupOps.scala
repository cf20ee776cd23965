package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operator family for the training-data pipeline:
  * exact (hash groupBy), n-gram Jaccard (shingle self-join), MinHash+LSH
  * (band-bucket candidate generation), SimHash (hamming within bit-bands).
  *
  * Reference analog is only the trivial D1-D4 dedup surface
  * (run_phase2_transformation.py:70-74, stg_raw_reviews.sql:50-69); the
  * near-dup family is the 100 TB-scale extension the brief requires.
  *
  * Scale design: everything is expressed as joins/aggregations on shingle
  * or band keys — no pairwise cross-join ever materializes beyond candidate
  * buckets. At 100 TB the shingle join is the canonical MapReduce dedup
  * shape: shuffle by shingle, emit candidate pairs, verify. MinHash/SimHash
  * reduce the candidate set from O(docs²) to O(near-dups) via banding.
  */
object DedupOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Distinct (doc_id, source, shingle) rows of 3-token shingles. */
  private def shingles(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("source"),
        explode(expr("transform(sequence(1, size(toks) - 2), i -> array_join(slice(toks, i, 3), ' '))"))
          .as("shingle"))
      .distinct()

  /** Exact dedup after normalization (D1/D2 generalized): canonical id =
    * min doc_id per normalized text, via a single hash-partitioned window. */
  private def q26(s: SparkSession, d: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val w = Window.partitionBy(col("norm"))
    t(s, d, "documents")
      .withColumn("norm", norm)
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("canonical_id"), col("group_size"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"))
      .orderBy("doc_id")
  }
  private val q26Sql =
    """SELECT doc_id,
      |  MIN(doc_id) OVER w AS canonical_id,
      |  COUNT(*) OVER w AS group_size,
      |  doc_id <> MIN(doc_id) OVER w AS is_dup
      |FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
      |      FROM documents) t
      |WINDOW w AS (PARTITION BY norm)
      |ORDER BY doc_id""".stripMargin

  /** n-gram Jaccard near-dup pairs (within-source blocking): 3-shingle
    * inverted-index self-join → intersection counts → |A∩B|/|A∪B| ≥ 0.5. */
  private def q27(s: SparkSession, d: String): DataFrame = {
    val sh = shingles(s, d).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = sh.select(col("source"), col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("source").as("source_b"), col("doc_id").as("doc_b"), col("shingle").as("shingle_b"))
    val pairs = a.join(b,
        col("source") === col("source_b") && col("shingle") === col("shingle_b") &&
          col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }
  private val q27Sql =
    """WITH docs AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |idx AS (
      |  SELECT doc_id, source, toks, unnest(generate_series(1, len(toks) - 2)) AS i FROM docs),
      |sh AS (
      |  SELECT DISTINCT doc_id, source, array_to_string(toks[i:i+2], ' ') AS shingle FROM idx),
      |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      |  FROM sh a JOIN sh b
      |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b, inter,
      |  CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
      |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** MinHash + LSH near-dup detection: 16 permutations via seeded xxhash64,
    * 4 bands × 4 rows; band-bucket join yields candidates, exact Jaccard
    * verifies. Hash-based → no SQL oracle (driver rows-only check).
    *
    * At scale: candidate generation is a shuffle on (band, bandHash) — the
    * sketch is 16 longs/doc regardless of doc length, so the shuffle is tiny
    * vs the corpus; only bucket-colliding pairs are verified. */
  private def q28(s: SparkSession, d: String): DataFrame = {
    val sh = shingles(s, d).cache()
    val minhashAggs = (0 until 16).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    val sketches = sh.groupBy(col("doc_id")).agg(minhashAggs.head, minhashAggs.tail: _*)
    val bands = sketches.select(
      col("doc_id"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          xxhash64((b * 4 until b * 4 + 4).map(i => col(s"h$i")): _*).as("sig"))): _*))
        .as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.sig"))
    // cached: referenced four times below (doc lists, two verify joins,
    // final left join) — each broadcast would otherwise re-run the whole
    // sketch+band pipeline.
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .cache()
    // Verify candidates with exact Jaccard (same machinery as q27). The
    // candidate set is tiny (only band-colliding pairs), so first semi-join
    // the shingle table down to candidate docs — every verify join then
    // touches a few hundred rows instead of the full shingle index.
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val shc = sh.join(broadcast(candDocs), "doc_id")
    val inter = broadcast(cand)
      .join(shc.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(broadcast(shc.select(col("doc_id").as("doc_b2"), col("shingle").as("shingle_b"))),
        col("doc_b") === col("doc_b2") && col("shingle") === col("shingle_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    broadcast(cand).join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        coalesce(col("inter"), lit(0L)).cast("double") /
          (col("sz_a") + col("sz_b") - coalesce(col("inter"), lit(0L))).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup detection: 64-bit simhash over token frequencies via
    * the SimhashAgg typed Aggregator (graft.operators.SimhashAgg — fixed
    * 512-byte state per doc, single aggregation pass; no 64× bit-explode
    * row amplification), 4 × 16-bit bands for downstream blocking.
    * Hash-based → no SQL oracle. Emits per-doc sketches (deterministic,
    * always non-empty) — the useful artifact for blocking. */
  private def q29(s: SparkSession, d: String): DataFrame = {
    val tf = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("th", xxhash64(col("token")))
    val bits = tf.groupBy(col("doc_id"))
      .agg(graft.operators.SimhashAgg(col("th"), col("cnt")).as("simhash"))
    bits.select(
        col("doc_id"), col("simhash"),
        expr("(simhash >> 0)  & 65535").as("band0"),
        expr("(simhash >> 16) & 65535").as("band1"),
        expr("(simhash >> 32) & 65535").as("band2"),
        expr("(simhash >> 48) & 65535").as("band3"))
      .orderBy("doc_id")
  }

  /** SimHash candidate pairs: docs sharing any 16-bit band, verified by
    * hamming distance ≤ 8. No oracle (hash-based). */
  private def q30(s: SparkSession, d: String): DataFrame = {
    val sk = q29(s, d).cache() // self-joined below: materialize once
    val bands = sk.select(col("doc_id"), col("simhash"),
      explode(array(
        struct(lit(0).as("b"), col("band0").as("v")),
        struct(lit(1).as("b"), col("band1").as("v")),
        struct(lit(2).as("b"), col("band2").as("v")),
        struct(lit(3).as("b"), col("band3").as("v")))).as("band"))
      .select(col("doc_id"), col("simhash"), col("band.b"), col("band.v"))
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 8)
      .orderBy("doc_a", "doc_b")
  }

  val all: Seq[Q] = Seq(
    Q("q26_dedup_exact", q26, Some(q26Sql)),
    Q("q27_dedup_ngram_jaccard", q27, Some(q27Sql)),
    Q("q28_dedup_minhash_lsh", q28, None),
    Q("q29_simhash_sketch", q29, None),
    Q("q30_simhash_pairs", q30, None))
}
