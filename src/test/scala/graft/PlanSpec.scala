package graft

import graft.functions.GraftFunctions

/** Explain-plan audits: the properties that make these operators scale are
  * asserted here so a refactor can't silently regress them (SURVEY.md §6).
  */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String = {
    GraftFunctions.register(spark)
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
  }

  test("q01: filters and projection are pushed to the parquet scan") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity), GreaterThanOrEqual"),
      s"filters not pushed:\n$p")
    assert(!p.contains("l_comment"), "scan reads columns the query never uses")
  }

  test("q03: dimension joins broadcast") {
    val p = plan("q03_join_broadcast")
    assert(p.split("BroadcastHashJoin").length >= 3, s"expected 2 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
  }

  test("linkage predict: single equi-join, no cartesian, no BNLJ") {
    val p = plan("q29_predict_links")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"blocking degenerated into a cross join:\n$p")
  }

  test("cascade: every pass joins on its block keys, never cross-joins") {
    val p = plan("q32_cascade_best_link")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"cascade contains a cross join:\n$p")
  }

  test("minhash LSH: bucket join is an equi-join with partial aggregation") {
    val p = plan("q41_minhash_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"LSH bucket join is not an equi-join:\n$p")
    assert(p.contains("partial_min") || p.contains("partial min") || p.contains("HashAggregate"),
      s"minhash aggregation lost map-side partials:\n$p")
  }

  test("no query plans a cartesian product except the intended cross joins") {
    GraftFunctions.register(spark)
    // q30 samples both sides then cross-joins (intended); q44 is the
    // brute-force KNN baseline against a broadcast query set (intended);
    // q33/q39/q53/q66 cross-join a single-row totals frame (intended);
    // q68's IVF assignment scores a broadcast 16-centroid set (intended),
    // and q51's celled candidate generation runs the same assignment over
    // the dup-planted frame; q89 reuses the q44 + q68 builders for its
    // recall join.
    // q120's six output scalars cross-join 1-row aggregate frames.
    val intendedCross = Set(
      "q30_u_estimation", "q44_cosine_knn", "q33_accuracy_eval",
      "q39_pik_rate", "q53_tfidf", "q66_unigram_logprob", "q68_ann_ivf",
      "q89_ann_recall", "q110_kmeans_step", "q51_embedding_dedup",
      "q120_accuracy_definitions", "q123_incremental_embedding_dedup",
      "q124_semdedup_keep", "q127_semantic_decontaminate",
      // q131/q132 ride the ivfAssign broadcast-centroid scorer; q133
      // attaches two 1-row aggregate frames (pool count, threshold);
      // q139 attaches the 1-row bigram-total frame (the q66 shape).
      "q131_int8_rerank", "q132_filtered_ann", "q133_dsir_select",
      "q139_bigram_logprob",
      // q42 attaches the 1-row derived-g params frame; q145 attaches the
      // 1-row corpus-derived minted-id offset (both broadcast).
      "q42_simhash", "q145_corpus_diff",
      // q147 attaches the 1-row (n, avgdl) corpus-stats frame (broadcast).
      "q147_bm25_topk",
      // q149/q152 attach the 1-row derived-cstride params frame and ride
      // the ivfAssign broadcast-centroid scorer (q152 also reuses the
      // q44 brute truth builder); q150 attaches the 1-row BM25 stats
      // frame + ivfAssign; q151 attaches the 1-row corpus-total and
      // weight-sum frames (all broadcast).
      "q149_pq_adc", "q150_hybrid_rrf", "q151_mix_temperature",
      "q152_pq_recall",
      // q155 attaches the 1-row derived-g params frame over the distinct
      // image signatures (the q42 shape); q157's probe attaches the same
      // frame to both the corpus-rep and arrival key builds.
      "q155_image_dhash", "q157_incremental_image_dedup")
    SparkEntry.queries.keys.filterNot(intendedCross).foreach { name =>
      val p = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoop"), s"$name plans a BNLJ")
    }
  }

  test("id assignment never plans a single-partition window exchange") {
    Seq("q08_add_unique_id", "q35_pseudo_household").foreach { name =>
      val p = plan(name)
      assert(!p.contains("SinglePartition"),
        s"$name funnels the table through one partition:\n$p")
    }
  }

  test("whole-stage codegen covers the scoring projections") {
    GraftFunctions.register(spark)
    val df = SparkEntry.queries("q28_match_weights")(spark, sfDir)
    df.collect() // materialize THIS plan so AQE reports it final w/ codegen marks
    val p = df.queryExecution.executedPlan.toString
    val jwLine = p.linesIterator.find(_.contains("jaro_winkler")).getOrElse("")
    assert(jwLine.contains("*("), s"FS scoring not inside WholeStageCodegen:\n$p")
  }
}
