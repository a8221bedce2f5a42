package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    _root_.graft.queries.CoreQueries.defs ++
      _root_.graft.queries.PrepQueries.defs ++
      _root_.graft.queries.StringQueries.defs ++
      _root_.graft.queries.LinkageQueries.defs ++
      _root_.graft.queries.RefFileQueries.defs ++
      _root_.graft.queries.PipelineQueries.defs ++
      _root_.graft.queries.StreamingQueries.defs

  private lazy val (queryMap, oracleMap) = QueryDef.toMaps(allDefs)

  /** Flagship: the full PVS-style linkage cascade on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queryMap("q32_cascade_best_link")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleMap

  /** Populates the cross-query memo caches (linkage side frames, dedup
    * gram frame) so benchmarks measure steady-state query time, not
    * whichever query first pays the one-time cache build.
    */
  def warm(spark: SparkSession, sfDir: String): Unit =
    warmSteps.foreach { case (_, f) => f(spark, sfDir) }

  /** Named memo builds, in execution order — Bench times each and emits
    * the per-step `warm_breakdown` map alongside the `warm_sec` total.
    */
  def warmSteps: Seq[(String, (SparkSession, String) => Unit)] =
    _root_.graft.queries.LinkageQueries.warmSteps ++
      _root_.graft.queries.PipelineQueries.warmSteps
}
