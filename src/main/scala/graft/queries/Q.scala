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

trait QueryModule {
  def all: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap
  final def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
