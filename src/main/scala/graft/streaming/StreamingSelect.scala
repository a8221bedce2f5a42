package graft.streaming

import graft.queries.PipelineQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming DSIR importance selection — the deployment shape of q133:
  * the hashed-unigram importance model and the keep threshold are FITTED
  * once on the reference corpus (target slice vs raw pool), then each
  * arriving micro-batch of documents is scored against the broadcast
  * model and kept or dropped by the fitted threshold — the
  * stream-filter-the-crawl loop of Xie et al. 2023's importance
  * resampling, where refitting per batch would both cost a corpus pass
  * and drift the selection boundary batch-to-batch.
  *
  * Reuses the batch machinery verbatim ([[PipelineQueries.dsirTokens]] /
  * `dsirScore` / `dsirKeep` — same md5 bucketing, same decimal term
  * truncation, same floor-threshold rule), so streaming and batch keep
  * decisions cannot drift (StreamingSpec asserts equality against the
  * batch q133 selection when the pool is replayed as micro-batches).
  *
  * State shape: NONE. A document arrives whole in one micro-batch and
  * its weight depends only on its own tokens plus the fitted O(1024)-row
  * broadcast model — no streaming aggregation, no watermark, no state
  * store. At scale the model/threshold pair is a few KB republished to
  * executors per fit, and each micro-batch pays one map-side token
  * explode + a broadcast join.
  */
object StreamingSelect {

  /** Fit the DSIR artifacts on the reference corpus: the (bucket, term)
    * model over target + pool and the 1-row keep-threshold frame over
    * the pool's weight histogram. Both are O(buckets)-bounded frames —
    * materialize/broadcast once per fit.
    */
  def dsirFit(corpus: DataFrame, isTarget: org.apache.spark.sql.Column,
      keepNum: Int, keepDen: Int): (DataFrame, DataFrame) = {
    val tc = PipelineQueries.dsirTokenCounts(
      PipelineQueries.dsirTokens(corpus, isTarget)).localCheckpoint()
    val model = PipelineQueries.dsirModel(tc)
    val scored = PipelineQueries.dsirScore(tc.filter(!col("is_target")), model)
    (model, PipelineQueries.dsirThreshold(scored, keepNum, keepDen)
      .localCheckpoint())
  }

  /** Score one arriving micro-batch of (doc_id, text, lang, source) rows
    * against the fitted model and keep the rows at/above the fitted
    * floor threshold. Call from a foreachBatch sink; per-batch keeps are
    * globally correct because a doc's weight is batch-independent.
    */
  def keepBatch(model: DataFrame, thr: DataFrame,
      arrivals: DataFrame): DataFrame = {
    val tc = PipelineQueries.dsirTokenCounts(
      PipelineQueries.dsirTokens(arrivals, lit(false)))
    PipelineQueries.dsirKeep(PipelineQueries.dsirScore(tc, model), thr)
  }

  /** BPE token accounting for an arriving micro-batch — the streaming
    * deployment of q135: the merge list is TRAINED once on the reference
    * corpus (the tokenizer is fitted offline; retraining per batch would
    * drift token budgets batch-to-batch) and each arriving batch of
    * (doc_id, text) rows is counted with the SAME nested-replace
    * encoding ([[graft.operators.Bpe.docTokenCounts]]). Stateless: a
    * doc's count depends only on its own words plus the fitted merge
    * list, so per-batch outputs union to exactly the batch q135 result
    * under any replay order (StreamingSpec pins it). At scale the merge
    * list is a few KB shipped in the closure; each batch pays one
    * map-side explode + a broadcast vocabulary join.
    */
  def bpeCountsBatch(merges: Seq[(String, String)],
      arrivals: DataFrame): DataFrame =
    graft.operators.Bpe.docTokenCounts(arrivals.select("doc_id", "text"), merges)

  /** Fit the BM25 standing-query artifacts on the reference corpus — the
    * streaming deployment of q147 is PUB/SUB RETRIEVAL: a fixed query set
    * routes/alerts over a document stream, so the corpus model (per-term
    * df, n, avgdl) is frozen at fit time like the DSIR model above —
    * rescoring idf per batch would drift a query's score for the SAME
    * document batch-to-batch. Both artifacts are broadcast-sized
    * (O(query terms) + 1 row) at any corpus scale; localCheckpoint
    * truncates their corpus lineage so every micro-batch plans against
    * materialized literals, not the fit's scan DAG.
    */
  def bm25Fit(corpus: DataFrame): (DataFrame, DataFrame) = {
    val (qt, stats) = PipelineQueries.bm25Fit(corpus)
    (qt.localCheckpoint(), stats.localCheckpoint())
  }

  /** Score one arriving micro-batch of (doc_id, text, ...) rows against
    * the fitted standing queries: (query_id, doc_id, score). Stateless —
    * a doc's score depends only on its own term counts plus the frozen
    * broadcast artifacts, so per-batch outputs union to exactly the
    * batch scoring under any replay split (StreamingSpec pins it).
    * Consumers rank or threshold downstream (per-batch top-k would be
    * replay-dependent by construction, so the scorer never ranks).
    */
  def bm25ScoreBatch(qt: DataFrame, stats: DataFrame,
      arrivals: DataFrame): DataFrame = {
    val (tf, dl) = PipelineQueries.bm25DocTf(arrivals)
    PipelineQueries.bm25Score(tf, dl, qt, stats)
  }

  /** Fit the temperature-mix replication rates on the reference corpus —
    * the streaming deployment of q151: the language mix is a property of
    * the CORPUS the run is balancing toward, so the per-language
    * (fl, thr) rate table freezes at fit time (refitting per batch would
    * re-derive rates from each batch's accidental language skew and
    * replicate the same document differently across replays). The rate
    * table is O(languages) rows — broadcast-sized at any corpus scale.
    */
  def mixFit(corpus: DataFrame): DataFrame =
    PipelineQueries.mixRates(PipelineQueries.mixTokens(corpus))
      .localCheckpoint()

  /** Replicate/sample one arriving micro-batch of (doc_id, text, lang)
    * rows by the fitted rates: (doc_id, lang, copy) kept rows. Stateless
    * — a doc's kept copies depend only on (doc_id, lang) plus the frozen
    * rates, so per-batch outputs union to exactly the batch q151 result
    * under any replay split (StreamingSpec pins it).
    */
  def mixSampleBatch(rates: DataFrame, arrivals: DataFrame): DataFrame =
    PipelineQueries.mixKeep(PipelineQueries.mixTokens(arrivals), rates)
}
