package graft

import graft.ops.Lineage
import graft.queries.RefFileQueries
import org.apache.spark.sql.functions._

class LineageSpec extends SparkTestBase {

  import spark.implicits._

  private def file = Seq(
    ("a_1", 1L, "JOHN", "SMITH"),
    ("a_2", 1L, "JON", "SMITH"),   // alternate spelling, same ssn
    ("a_3", 1L, "JOHN", "SMITH"),  // exact repeat -> collapses with a_1
    ("a_4", 2L, "MARY", null),     // null dedupe key
    ("a_5", 2L, "MARY", null)      // nulls group together (pandas semantics)
  ).toDF("record_id", "ssn", "first_name", "last_name")

  test("dedupe collapses key groups, unions sources, groups null keys") {
    val (deduped, pairs) = Lineage.dedupePreservingSourceRecords(
      file, Lineage.initPairs(file), Seq("ssn", "first_name", "last_name"), "d")
    val rows = deduped.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.length == 3, s"expected 3 deduped records, got ${rows.toSeq}")
    val byId = pairs.collect().groupBy(_.getString(0))
      .map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    assert(byId("d_a_1") == Set("a_1", "a_3"), s"merged sources wrong: $byId")
    assert(byId("d_a_2") == Set("a_2"))
    assert(byId("d_a_4") == Set("a_4", "a_5"), "null-keyed rows must dedupe together")
  }

  test("merge crosses parent pairings and drops null join keys") {
    val left = Seq(("l_1", Some(1L), "JOHN"), ("l_2", Some(2L), "MARY"),
      ("l_3", Option.empty[Long], "GHOST"))
      .toDF("record_id", "ssn", "first_name")
    val right = Seq(("r_1", 1L, 1980), ("r_2", 1L, 1981))
      .toDF("record_id", "ssn", "dob_year")
    val lp = Lineage.initPairs(left)
    val rp = Lineage.initPairs(right)
    val (merged, pairs) = Lineage.mergePreservingSourceRecords(
      left, lp, right, rp, Seq("ssn"), "m")
    val ids = merged.select("record_id").collect().map(_.getString(0)).toSet
    // ssn 1 crosses both DOBs; ssn 2 left-joins to nothing; the null-key
    // left row is dropped entirely (reference dropna(subset=on)).
    assert(ids == Set("m_l_1_r_1", "m_l_1_r_2", "m_l_2_na"), s"ids: $ids")
    val byId = pairs.collect().groupBy(_.getString(0))
      .map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    assert(byId("m_l_1_r_1") == Set("l_1", "r_1"), s"pairings: $byId")
    assert(byId("m_l_1_r_2") == Set("l_1", "r_2"))
    assert(byId("m_l_2_na") == Set("l_2"), "unmatched left keeps only left sources")
  }

  test("concat unions files and pairings unchanged") {
    val a = Seq(("a_1", 1L)).toDF("record_id", "ssn")
    val b = Seq(("b_1", 2L)).toDF("record_id", "ssn")
    val (all, pairs) = Lineage.concatPreservingSourceRecords(
      Seq(a, b), Seq(Lineage.initPairs(a), Lineage.initPairs(b)))
    assert(all.count() == 2 && pairs.count() == 2)
  }

  test("resolveGroundTruth flags records whose sources disagree") {
    val pairs = Seq(("d_1", "a_1"), ("d_1", "a_2"), ("d_2", "a_3"))
      .toDF("record_id", "source_record_id")
    val truth = Seq(("a_1", 100L), ("a_2", 200L), ("a_3", 100L))
      .toDF("record_id", "simulant_id")
    val resolved = Lineage.resolveGroundTruth(pairs, truth).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(resolved.filter(_._1 == "d_1").forall(_._3 == 2L),
      "d_1's sources disagree -> n_truths 2")
    assert(resolved.filter(_._1 == "d_2").forall(_._3 == 1L))
  }

  test("reference-file queries run; name×DOB combos multiply per ssn") {
    RefFileQueries.defs.foreach { d =>
      assert(d.query(spark, sfDir).count() > 0, s"${d.name} returned no rows")
    }
    // Every ndr record's n_sources >= the max of its parents' counts, and
    // per ssn the combo count = n_alt_names * n_alt_dobs.
    val ndr = RefFileQueries.defs.find(_.name == "q72_name_dob_reference").get
      .query(spark, sfDir).cache()
    val altn = RefFileQueries.defs.find(_.name == "q71_alternate_names").get
      .query(spark, sfDir)
    val combos = ndr.groupBy("ssn").agg(count(lit(1)).as("n_combos"),
      countDistinct("first_name", "last_name").as("n_names"),
      countDistinct("dob_year", "dob_month", "dob_day").as("n_dobs"))
    val bad = combos.filter(col("n_combos") =!= col("n_names") * col("n_dobs")).count()
    assert(bad == 0, s"$bad ssns with combo count != names*dobs")
    val nAltn = altn.count()
    assert(ndr.select("ssn", "first_name", "last_name").distinct().count() == nAltn,
      "every alternate name appears in the reference file")
    // The k%9 clean-name refiles actually collapse: some alternate-name
    // records trace to BOTH eras.
    assert(altn.filter(col("n_sources") > 1).count() > 0,
      "no alternate-name record collapsed multiple sources")
    ndr.unpersist()
  }
}
