package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module's (name → DataFrame program) map plus the
  * DuckDB oracle SQL used by the driver's correctness gate.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] =
    Seq(Relational, RelationalExt, TextOps, DedupOps, VectorOps, PipelineOps,
      SourceOps, MediaOps, HtmlOps, LineOps, BpeOps, LmOps, UrlOps,
      AssemblyOps, CorpusOps, CurationOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + broadcast dims + hash aggregate (SURVEY §7.2 slice). */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q03_star_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
