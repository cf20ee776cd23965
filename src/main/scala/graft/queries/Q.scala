package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a DataFrame program over the testdata tables plus an
  * optional ANSI-SQL oracle (DuckDB dialect) computing the identical result.
  * Queries without an oracle (hash-based / non-SQL-expressible ops) get the
  * driver's weaker rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Scratch-materialization convention for query implementations: an
  * intermediate that is referenced more than once is materialized with
  * `localCheckpoint(true)`, NOT `cache()`.
  *
  * Why not cache: `cache()` registers with the session-global CacheManager
  * and lives until an explicit `unpersist` — a 48-query Verify/Bench session
  * would accumulate every query's scratch tables in executor storage for the
  * whole session. And unpersisting is a trap of its own: CacheManager reacts
  * to unpersist of a subtree by recompiling every dependent cached plan and
  * DROPPING its materialized data, so "cache the result, then unpersist the
  * scratch" silently recomputes the entire query on the caller's first
  * action (measured 6× on q42). `localCheckpoint(true)` materializes once,
  * cuts lineage (so nothing can cascade into it), and its blocks are
  * reclaimed by the ContextCleaner as soon as the DataFrame is garbage —
  * no session-lifetime leak.
  */
trait QueryModule {
  def all: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  final def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
