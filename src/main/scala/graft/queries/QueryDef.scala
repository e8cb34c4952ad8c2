package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One coverage-checklist entry (SURVEY.md §2): a Spark-side builder
  * plus, when SQL-expressible, the equivalent DuckDB oracle SQL the
  * driver hash-compares against. Column names/aliases MUST match the
  * Spark output exactly; double aggregates are rounded identically on
  * both sides; every query carries a deterministic ORDER BY.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  def sql(b: (SparkSession, String) => DataFrame, o: String): QueryDef =
    QueryDef(b, Some(o))
  def rowsOnly(b: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(b, None)
}
