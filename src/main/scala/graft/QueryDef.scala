package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over the testdata tables plus an
  * optional DuckDB-SQL oracle with identical column names and semantics.
  *
  * Determinism contract (see SURVEY.md §5): aggregate doubles go through
  * DECIMAL, per-row derived doubles are rounded, and raw nanosecond
  * timestamps are never emitted.
  */
final case class QueryDef(
    name: String,
    query: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None
)

object QueryDef {
  /** Modules contribute query groups; SparkEntry flattens them. */
  def toMaps(
      defs: Seq[QueryDef]
  ): (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val qs = defs.map(d => d.name -> d.query).toMap
    val os = defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
    (qs, os)
  }
}
