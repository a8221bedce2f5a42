package graft.streaming

import graft.queries.PipelineQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming incremental near-dup detection: arriving documents are
  * MinHash-signatured per micro-batch and probed against the persisted
  * corpus band index — the streaming deployment of q100's incremental
  * shape (the batch pipeline indexes the corpus once; the stream pays
  * O(|batch|) hashing plus one equi-join probe per micro-batch).
  *
  * Reuses the batch signature machinery verbatim
  * ([[PipelineQueries.bandRowsFor]] — same md5 hash family, same band
  * layout), so streaming and batch candidates cannot drift
  * (StreamingSpec asserts equality against the batch q100 probe).
  *
  * State shape: NONE. A document arrives whole in one micro-batch, so
  * signatures are computed statelessly per batch inside foreachBatch —
  * no streaming aggregation, no watermark, no state store. At scale the
  * corpus band index is a bucketed table on (band, v1, v2) and each
  * probe is a broadcast or bucket-local join; newly accepted documents
  * append their band rows to the index between batches (the next
  * batch's corpus problem, exactly like the batch variant).
  */
object StreamingDedup {

  /** Candidate matches of one arriving micro-batch (doc_id, text) against
    * the corpus band index: (corpus_id, new_id), distinct. Call from a
    * foreachBatch sink; per-batch distinct is globally correct because
    * each new_id arrives on exactly one micro-batch.
    */
  def matchesBatch(corpusBands: DataFrame, arrivals: DataFrame): DataFrame = {
    val delta = PipelineQueries.bandRowsFor(arrivals.select("doc_id", "text"))
    corpusBands.as("a").join(delta.as("b"),
        col("a.band") === col("b.band") && col("a.v1") === col("b.v1") &&
          col("a.v2") === col("b.v2"))
      .select(col("a.doc_id").as("corpus_id"), col("b.doc_id").as("new_id"))
      .distinct()
  }

  /** WINNOWING variant — the streaming deployment of q134's
    * exact-substring overlap detection: the corpus fingerprint index is
    * built once (`corpusFps` = (doc_id, h, pos) winnow fingerprints — at
    * scale a bucketed table on h), and each arriving micro-batch of
    * (doc_id, text) rows is fingerprinted with the SAME native
    * expression, probed by hash equi-join, and verified by substring
    * equality against the corpus texts — so streaming and batch matches
    * cannot drift, and the ≥ w+k−1-char detection guarantee carries
    * over. Stateless per batch, like the other variants.
    *
    * Output: (corpus_id, new_id, n_grams) — verified overlap pairs.
    */
  def winnowMatchesBatch(corpusFps: DataFrame, corpusTexts: DataFrame,
      arrivals: DataFrame): DataFrame = {
    import graft.functions.{GraftFunctions, WinnowImpl}
    val shift = WinnowImpl.PosShift
    val fps = arrivals.select(col("doc_id"),
        explode(GraftFunctions.winnowKeys(col("text"),
          PipelineQueries.WinnowK, PipelineQueries.WinnowW)).as("key"))
      .select(col("doc_id").as("new_id"), shiftright(col("key"), 33).as("h"),
        col("key").bitwiseAND(lit(shift - 1)).as("pos_b"))
    // Hub cap on COMBINED occupancy, applied SOLELY at probe time: the
    // index ([[winnowIndex]]) is built UNCAPPED, so nd_c below is the
    // TRUE corpus occupancy and the combined nd_c + nd_b check is
    // exactly the batch query's cap rule whenever the compared corpus
    // arrives in one batch. The ok-set is computed from the two slim
    // occupancy aggregates and semi-joined BEFORE the fingerprint join,
    // so a hub bucket is dropped ahead of — never after — the
    // quadratic-in-occupancy candidate explosion. The only residual
    // divergence from batch q134 is arrivals split across SEPARATE
    // micro-batches under-counting each other near the cap — the
    // documented cross-batch bound.
    val occC = corpusFps.groupBy("h").agg(countDistinct("doc_id").as("nd_c"))
    val occB = fps.groupBy("h").agg(countDistinct("new_id").as("nd_b"))
    val okH = occC.join(occB, Seq("h"))
      .filter(col("nd_c") + col("nd_b") <= PipelineQueries.WinnowHubCap)
      .select("h")
    corpusFps
      .select(col("doc_id").as("corpus_id"), col("h"), col("pos").as("pos_a"))
      .join(fps.join(okH, Seq("h")), Seq("h"))
      .join(corpusTexts.select(col("doc_id").as("corpus_id"),
        col("text").as("ta")), Seq("corpus_id"))
      .join(arrivals.select(col("doc_id").as("new_id"), col("text").as("tb")),
        Seq("new_id"))
      .filter(col("ta").substr(col("pos_a").cast("int"),
          lit(PipelineQueries.WinnowK)) ===
        col("tb").substr(col("pos_b").cast("int"), lit(PipelineQueries.WinnowK)))
      .groupBy("corpus_id", "new_id")
      .agg(countDistinct("h").as("n_grams"))
  }

  /** The (doc_id, h, pos) corpus fingerprint index [[winnowMatchesBatch]]
    * probes — decode of the packed winnow keys, built UNCAPPED so the
    * probe's combined corpus + batch occupancy check sees the true
    * corpus counts (q134's cap is applied solely at probe time; see the
    * bound documented in [[winnowMatchesBatch]]). A hub bucket costs
    * index ROWS but never candidate pairs — the probe drops it before
    * the fingerprint join.
    */
  def winnowIndex(docs: DataFrame): DataFrame =
    PipelineQueries.winnowFingerprintsUncapped(docs, "text")

  /** URL variant — the crawl-frontier "already crawled?" probe (q140's
    * incremental deployment): the corpus keeps a canonical-URL index
    * (`corpusUrls(url_canon, corpus_id)` — at scale a bucketed table on
    * url_canon), and each arriving micro-batch of (doc_id, url_raw)
    * rows canonicalizes with the SAME rewrite chain
    * ([[PipelineQueries.canonicalizeUrl]]) and equi-joins the index —
    * matches are recrawls to skip before any content fetch/dedup pays
    * for them. Stateless per batch; newly accepted URLs append to the
    * index between batches (the band-index pattern).
    *
    * Output: (corpus_id, new_id, url_canon), distinct.
    */
  def urlMatchesBatch(corpusUrls: DataFrame, arrivals: DataFrame): DataFrame =
    arrivals.select(col("doc_id").as("new_id"),
        PipelineQueries.canonicalizeUrl(col("url_raw")).as("url_canon"))
      .join(corpusUrls, Seq("url_canon"))
      .select("corpus_id", "new_id", "url_canon")
      .distinct()

  /** The canonical-URL corpus index [[urlMatchesBatch]] probes. */
  def urlIndex(corpusDocs: DataFrame): DataFrame =
    corpusDocs.select(col("doc_id").as("corpus_id"),
      PipelineQueries.canonicalizeUrl(col("url_raw")).as("url_canon"))

  /** EMBEDDING variant — the streaming deployment of q123's incremental
    * shape: the corpus IVF index is built once (`cents` = the index's
    * centroid set, `corpusCells` = its hard (corpus_id, label, cid)
    * assignments, `corpus` = the normed corpus vectors — at scale a
    * bucketed table on (label, cid) plus the vector store), and each
    * arriving micro-batch of (vec_id, label, embedding) rows is normed,
    * probe-3 cell-assigned with the SAME shared machinery
    * ([[PipelineQueries.cellAssignments]]) and verified two-phase
    * ([[PipelineQueries.verifyPairs]]) — so streaming and batch
    * candidates cannot drift (StreamingSpec asserts equality against the
    * batch q123). Stateless per batch, like the text variant.
    */
  def embMatchesBatch(cents: DataFrame, corpusCells: DataFrame,
      corpus: DataFrame, arrivals: DataFrame): DataFrame = {
    val e = arrivals.select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("nrm", graft.operators.VectorOps.norm(col("embedding")))
    val newCells = PipelineQueries.cellAssignmentsDerived(e, cents)
      .select(col("vec_id").as("new_id"), col("label"), col("cid"))
    val cand = corpusCells.join(newCells, Seq("label", "cid"))
      .select("corpus_id", "new_id").distinct()
    PipelineQueries.verifyPairs(cand, corpus, e, "corpus_id", "new_id", 0.9)
  }

  /** IMAGE variant — the streaming deployment of q157's incremental
    * shape: the corpus keeps its dHash signature-class index
    * (`corpusSigs(doc_id, sig)` — at scale: the per-sig class reps plus
    * the banded distinct-sig keys persisted as bucketed tables on
    * (tbl, k)), and each arriving micro-batch of media records is
    * PPM-decoded + dHashed with the SAME kernel
    * ([[PipelineQueries.dhashSigsOf]]) and probed with the SAME probe
    * machinery ([[PipelineQueries.imageProbeMatches]]: exact-sig star
    * membership at hamming 0, banded near-dup rep pairs, probe-time
    * combined hub cap) — so streaming and batch matches cannot drift
    * (StreamingSpec asserts single-batch replay equality against the
    * batch q157). Stateless per batch; the documented residual
    * divergence is arrivals split across separate micro-batches
    * under-counting each other's bucket occupancy near the hub cap,
    * the same cross-batch bound as the winnow variant.
    *
    * Output: (corpus_id, new_id, hamming) — corpus_id is the corpus
    * signature-class representative the arrival matched.
    */
  def imageMatchesBatch(corpusSigs: DataFrame,
      arrivals: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord])
      : DataFrame =
    PipelineQueries.imageProbeMatches(corpusSigs,
      PipelineQueries.dhashSigsOf(arrivals))
}
