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
    * whichever query first pays the one-time cache build. Runs the
    * dependency waves of [[warmWaves]], each wave's steps CONCURRENTLY:
    * at bench scale most memo builds are one- or two-task Spark jobs, so
    * serial warm is a sum of scheduler latencies while the executor
    * threads idle — concurrent jobs overlap them (Spark job submission is
    * thread-safe; each memo has its own lock).
    */
  def warm(spark: SparkSession, sfDir: String): Unit =
    warmWaves.foreach { wave => runWave(wave, spark, sfDir); () }

  /** Named memo builds — Bench times each and emits the per-step
    * `warm_breakdown` map alongside the `warm_sec` (wall-clock) total.
    */
  def warmSteps: Seq[(String, (SparkSession, String) => Unit)] =
    _root_.graft.queries.LinkageQueries.warmSteps ++
      _root_.graft.queries.PipelineQueries.warmSteps ++
      _root_.graft.queries.RefFileQueries.warmSteps

  /** [[warmSteps]] grouped into dependency waves: a step may consume
    * caches built by an earlier wave (reffiles reads the side frames,
    * jaccard_banded reads the gram + band frames, ivf/brute read the
    * norm frames) but never by a step in its own wave.
    */
  def warmWaves: Seq[Seq[(String, (SparkSession, String) => Unit)]] = {
    val waveOf = Map(
      "linkage_sides" -> 1, "grams" -> 1, "emb_norms" -> 1,
      "emb_dup_norms" -> 1, "minhash_bands" -> 1, "shingles" -> 1,
      "reffile_chain" -> 1,
      "linkage_reffiles" -> 2, "jaccard_banded" -> 2, "ivf_assign" -> 2,
      "brute_knn" -> 2, "reffile_accuracy" -> 2, "emb_pairs" -> 2,
      "emb_corpus_cells" -> 2,
      "linkage_scored_block" -> 3, "linkage_cost_summary" -> 3,
      "cascade_links" -> 3)
    warmSteps.groupBy { case (n, _) => waveOf.getOrElse(n, 3) }
      .toSeq.sortBy(_._1).map(_._2)
  }

  /** Runs one wave's steps concurrently; returns (step, seconds) — a
    * failed step reports its elapsed time and swallows the error (warm
    * is best-effort; the consuming query will surface a real failure).
    */
  def runWave(wave: Seq[(String, (SparkSession, String) => Unit)],
      spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(math.max(wave.size, 1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val futures = wave.map { case (step, f) =>
      step -> Future {
        val t0 = System.nanoTime()
        try f(spark, sfDir) catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }
    }
    val out = futures.map { case (step, fut) =>
      (step, Await.result(fut, Duration.Inf))
    }
    pool.shutdown()
    out
  }
}
