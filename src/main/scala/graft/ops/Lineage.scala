package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source-record lineage operators — the reference-file construction layer
  * (reference 02_generate_case_study_files.ipynb: dedupe / merge / concat
  * `_preserving_source_records`). Every derived file carries a side table
  * of (record_id, source_record_id) pairs tracing each output record to
  * ALL raw input records that contributed to it; dedupe collapses records
  * while merging their pairings, and a key-join crosses them (a name×DOB
  * reference record descends from both parents' sources).
  *
  * Scale shape: pairings are plain DataFrames; every operator is an
  * equi-join or a single-shuffle window/aggregate on the dedupe keys — no
  * driver-side state, no row ordering assumptions. New record ids are
  * DETERMINISTIC (min source id per group / concatenation of parent ids),
  * not positional counters, so the construction is reproducible under any
  * partitioning — the property the reference gets by single-threaded
  * re-indexing and a 100 TB run cannot afford.
  */
object Lineage {

  /** reference cell 27: record_id_to_single_source_record_pairs — a raw
    * file is its own (sole) source.
    */
  def initPairs(df: DataFrame): DataFrame =
    df.select(col("record_id"), col("record_id").as("source_record_id"))

  /** reference concat_preserving_source_records: files already carry
    * per-file-prefixed record ids (add_unique_record_id), so the union is
    * collision-free and pairings union unchanged.
    */
  def concatPreservingSourceRecords(
      dfs: Seq[DataFrame], pairs: Seq[DataFrame]): (DataFrame, DataFrame) =
    (dfs.reduce(_ unionByName _), pairs.reduce(_ unionByName _))

  /** reference dedupe_preserving_source_records: one output record per
    * distinct combination of `cols` (nulls group together, like pandas
    * drop_duplicates), carrying the UNION of the collapsed records'
    * source pairings. The new record id is `prefix_` + the group's
    * minimum old record id — deterministic under any partitioning, one
    * shuffle on the dedupe keys (the window and the distinct reuse the
    * same hash partitioning).
    */
  def dedupePreservingSourceRecords(
      df: DataFrame, pairs: DataFrame, cols: Seq[String],
      newRecordIdPrefix: String): (DataFrame, DataFrame) = {
    // One hash aggregate (map-side partials) instead of the former
    // window + distinct — same rows: the group's min record id IS the
    // window min, and distinct-over-(new_id, cols) is exactly one row
    // per group. Round-19 plan diff: 2 exchanges -> 1 on this branch.
    val deduped = dedupedOn(df, cols, newRecordIdPrefix)
    val grp = Window.partitionBy(cols.map(col): _*)
    val withNew = df.withColumn("__new_id",
      concat(lit(newRecordIdPrefix + "_"), min("record_id").over(grp)))
    val mapped = withNew
      .select(col("record_id").as("__old_id"), col("__new_id"))
      .join(pairs.withColumnRenamed("record_id", "__old_id"), Seq("__old_id"))
      .select(col("__new_id").as("record_id"), col("source_record_id"))
      .distinct()
    (deduped, mapped)
  }

  private def dedupedOn(df: DataFrame, cols: Seq[String],
      newRecordIdPrefix: String): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(concat(lit(newRecordIdPrefix + "_"), min("record_id"))
        .as("record_id"))
      .select((col("record_id") +: cols.map(col)): _*)

  /** [[dedupePreservingSourceRecords]] for a RAW file — one whose pairing
    * table would be [[initPairs]] (every record its own sole source, the
    * reference's cell-27 case, which is every production dedupe site in
    * this repo). The generic path then does pure no-op work: the pairing
    * join is an identity self-join on record_id, and the final distinct
    * deduplicates (new_id, old_id) rows that are already unique (old ids
    * are unique by contract). Skipping both leaves ONE aggregate for the
    * deduped file and ONE window pass for the map — identical output
    * rows, two fewer exchanges and no join (guide §2.4).
    */
  def dedupeRawPreservingSourceRecords(
      df: DataFrame, cols: Seq[String],
      newRecordIdPrefix: String): (DataFrame, DataFrame) = {
    val deduped = dedupedOn(df, cols, newRecordIdPrefix)
    val grp = Window.partitionBy(cols.map(col): _*)
    val mapped = df.withColumn("__new_id",
        concat(lit(newRecordIdPrefix + "_"), min("record_id").over(grp)))
      .select(col("__new_id").as("record_id"),
        col("record_id").as("source_record_id"))
    (deduped, mapped)
  }

  /** reference merge_preserving_source_records: key-join two derived files
    * (rows with null join keys dropped first, as the reference does); each
    * joined record's pairing is the union of its parents'. New record id =
    * `prefix_<left id>_<right id|na>` — deterministic, no counter.
    */
  def mergePreservingSourceRecords(
      left: DataFrame, leftPairs: DataFrame,
      right: DataFrame, rightPairs: DataFrame,
      on: Seq[String], newRecordIdPrefix: String,
      how: String = "left"): (DataFrame, DataFrame) = {
    val l = left.na.drop(on).withColumnRenamed("record_id", "__l_id")
    val r = right.na.drop(on).withColumnRenamed("record_id", "__r_id")
    val joined = l.join(r, on, how)
      .withColumn("record_id",
        concat_ws("_", lit(newRecordIdPrefix), col("__l_id"),
          coalesce(col("__r_id"), lit("na"))))
    val lp = joined.select(col("record_id"), col("__l_id"))
      .join(leftPairs.withColumnRenamed("record_id", "__l_id"), Seq("__l_id"))
      .select("record_id", "source_record_id")
    val rp = joined.filter(col("__r_id").isNotNull)
      .select(col("record_id"), col("__r_id"))
      .join(rightPairs.withColumnRenamed("record_id", "__r_id"), Seq("__r_id"))
      .select("record_id", "source_record_id")
    (joined.drop("__l_id", "__r_id"), lp.unionByName(rp).distinct())
  }

  /** reference cell 87 get_simulants_of_source_records: resolve each
    * derived record's ground truth through its pairings; `n_truths` > 1
    * flags records whose sources disagree (the reference's nunique check).
    */
  def resolveGroundTruth(pairs: DataFrame, truth: DataFrame): DataFrame =
    pairs
      .join(truth.withColumnRenamed("record_id", "source_record_id"),
        Seq("source_record_id"))
      .select("record_id", "simulant_id")
      .distinct()
      .withColumn("n_truths",
        count(lit(1)).over(Window.partitionBy("record_id")))
}
