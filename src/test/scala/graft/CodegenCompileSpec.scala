package graft

import org.apache.spark.sql.GraftCodegenCheck

/** Every whole-stage-codegen region of the expression-heavy plans must
  * actually COMPILE. Spark only logs a failed whole-stage compile and
  * silently falls back to interpreted evaluation — which is how the
  * phonetic-chain derive() projection ran ~10× slow for two rounds
  * without a red test. This spec makes that failure mode loud.
  */
class CodegenCompileSpec extends SparkTestBase {

  // The scalar-heaviest plans: synthetic-side derivation feeding the
  // cascade (via cached relations inside q26/q32), the prep chain, the
  // scoring chain with the JW expressions, and the shingle-heavy dedups.
  private val heavy = Seq(
    "q13_std_address", "q15_trunc_names", "q23_soundex", "q24_nysiis",
    "q26_block_pairs", "q27_comparison_vectors", "q28_match_weights",
    "q32_cascade_best_link", "q41_minhash_lsh", "q43_ngram_jaccard_dedup",
    "q46_langid", "q53_tfidf", "q56_decontaminate", "q57_vocab_oov",
    "q59_dataset_mix", "q66_unigram_logprob", "q68_ann_ivf",
    "q77_pseudopeople_noise",
    // round-15 scalar-heavy additions: winnow fingerprint+verify chain
    // (native expression inside codegen), BPE nested-replace encode,
    // hashed-bigram scoring, URL rewrite chain, name-parse rule tree.
    "q134_winnow_dedup", "q135_bpe_tokenize", "q136_span_dedup",
    "q137_name_parse", "q139_bigram_logprob", "q140_url_dedup")

  test("all whole-stage regions of the heavy plans compile") {
    graft.functions.GraftFunctions.register(spark)
    heavy.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = GraftCodegenCheck.compileAllStages(df)
      assert(n > 0, s"$name: no whole-stage regions found (unexpected plan shape)")
    }
  }
}
