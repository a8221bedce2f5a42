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

  test("dedupeRawPreservingSourceRecords ≡ generic dedupe over initPairs") {
    // The raw-file fast path (no pairing join, no distinct, aggregate
    // instead of window+distinct for the deduped file) must produce the
    // exact row sets of the generic path it replaces at every production
    // call site.
    val keys = Seq("ssn", "first_name", "last_name")
    val (d1, p1) = Lineage.dedupePreservingSourceRecords(
      file, Lineage.initPairs(file), keys, "d")
    val (d2, p2) = Lineage.dedupeRawPreservingSourceRecords(file, keys, "d")
    assert(d1.exceptAll(d2).isEmpty && d2.exceptAll(d1).isEmpty,
      "deduped files differ")
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty,
      "pairing maps differ")
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
    // per SSN-holder ssn the combo count = n_alt_names * n_alt_dobs (ITIN
    // rows carry no DOB and live outside the numident cross, so they are
    // excluded from the combinatorial check).
    val ndrAll = RefFileQueries.defs.find(_.name == "q72_name_dob_reference").get
      .query(spark, sfDir).cache()
    assert(ndrAll.filter(col("ssn") >= 900000000L).count() > 0,
      "no ITIN name records reached the name/DOB reference file")
    val ndr = ndrAll.filter(col("ssn") < 900000000L)
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
    ndrAll.unpersist()
  }

  test("geobase records resolve to exactly one simulant through their pairings") {
    // Rebuild the q117 chain keeping the pairings, then resolve ground
    // truth through them (reference cell 87): every numident/address
    // filing of ssn k belongs to simulant k, so each GeoBase record must
    // resolve to its ssn with NO disagreement (n_truths == 1).
    val p = queries.People.persons(spark, sfDir)
    val n0 = p.select(concat(lit("num0_"), col("k")).as("record_id"),
      col("k").as("ssn"), col("first_name"), col("last_name"),
      col("dob_year"), col("dob_month"), col("dob_day"))
    val n1 = p.select(concat(lit("num1_"), col("k")).as("record_id"),
      col("k").as("ssn"),
      when(pmod(col("k"), lit(9)) === 0, col("first_name"))
        .otherwise(col("messy_first")).as("first_name"),
      when(pmod(col("k"), lit(9)) === 0, col("last_name"))
        .otherwise(col("messy_last")).as("last_name"),
      col("dob_year"), col("dob_month"),
      when(pmod(col("k"), lit(6)) === 0, pmod(col("dob_day"), lit(28)) + 1)
        .otherwise(col("dob_day")).cast("int").as("dob_day"))
    val num = n0.unionByName(n1)
    val init = Lineage.initPairs(num)
    val (altN, pN) = Lineage.dedupePreservingSourceRecords(
      num, init, Seq("ssn", "first_name", "last_name"), "altn")
    val (altD, pD) = Lineage.dedupePreservingSourceRecords(
      num.select("record_id", "ssn", "dob_year", "dob_month", "dob_day"),
      init, Seq("ssn", "dob_year", "dob_month", "dob_day"), "altd")
    val (ndr, pM) = Lineage.mergePreservingSourceRecords(
      altN, pN, altD, pD, Seq("ssn"), "ndr")
    val addr = p.select(concat(lit("addr_"), col("k")).as("record_id"),
      col("k").as("ssn"), col("zipcode"))
    val (geob, pG) = Lineage.mergePreservingSourceRecords(
      ndr, pM, addr, Lineage.initPairs(addr), Seq("ssn"), "geo")
    // Truth table: every raw filing record (both numident eras + the
    // address filings) maps back to its simulant key.
    val truth = num.select(col("record_id"), col("ssn").as("simulant_id"))
      .unionByName(addr.select(col("record_id"), col("ssn").as("simulant_id")))
    val resolved = Lineage.resolveGroundTruth(pG, truth).cache()
    assert(resolved.select("record_id").distinct().count() == geob.count(),
      "some geobase record resolved to no simulant")
    val disagree = resolved.filter(col("n_truths") =!= 1).count()
    assert(disagree == 0, s"$disagree geobase records with ambiguous ground truth")
    resolved.unpersist()
  }

  test("q119/q120: planted wrong-SSN W2 mints a multi-simulant PIK that " +
    "separates the three accuracy definitions") {
    // The k%57 slice's 2026 W2 filing reports the neighbor's SSN
    // (RefFileQueries.w2): person 57's filing lands under ssn 58, so ssn
    // 58's reference records trace to simulants {57, 58} and its PIK is
    // multi-simulant (notebook 04 cell 25's collision class).
    val w2 = RefFileQueries.defs.find(_.name == "q119_w2_source").get
      .query(spark, sfDir)
    val planted = w2.filter(col("record_id") === "w2_2026_57")
      .select("ssn").collect()
    assert(planted.length == 1 && planted.head.getLong(0) == 58L,
      s"wrong-SSN plant missing: ${planted.toSeq}")
    // Other years of the same filer stay under the filer's own SSN.
    val own = w2.filter(col("record_id") === "w2_2025_57").select("ssn").collect()
    assert(own.head.getLong(0) == 57L, "non-2026 W2 years must keep the own SSN")
    // The definitions separate: person 58 links (correctly) to its own
    // SSN's PIK, which is multi-simulant — definition 1 scores it
    // incorrect, definition 3 scores it correct, definition 2 drops it
    // from the denominator.
    val acc = RefFileQueries.defs.find(_.name == "q120_accuracy_definitions").get
      .query(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val (n1, d1) = acc((1, "pik"))
    val (n2, d2) = acc((2, "pik"))
    val (n3, d3) = acc((3, "pik"))
    assert(n3 > n1, s"definition 3 must credit the multi-sim PIK def 1 rejects ($n1 vs $n3)")
    assert(d2 < d1, s"definition 2 must shrink the denominator ($d2 vs $d1)")
    assert(n1 == n2 && d1 == d3, "definition wiring broken")
    assert(n1 <= d1 && n2 <= d2 && n3 <= d3, "accuracy above 1")
    // Record level exists and is similarly ordered.
    assert(acc((3, "record"))._1 >= acc((1, "record"))._1)
    // q122 diagnosis (04 cells 61/66): the k%83 wrong-link slice shows up
    // as `incorrect` pairs, the k%67 missed-holder slice as `missed`
    // rows pointing at its own single-simulant reference records; the
    // SSN-less non-filers (impossible to PIK) emit nothing.
    val diag = RefFileQueries.defs.find(_.name == "q122_link_diagnosis").get
      .query(spark, sfDir).cache()
    val missedIds = diag.filter(col("kind") === "missed")
      .select("in_id").distinct().collect().map(_.getString(0)).toSet
    assert(missedIds.contains("cin_67"), s"k=67 not in missed: $missedIds")
    assert(missedIds.forall { id =>
      val k = id.stripPrefix("cin_").toLong
      k % 5 != 4 && k % 67 == 0
    }, s"non-planted missed ids: $missedIds")
    // Every `incorrect` row is a k%83 wrong-link (def-3 any-match means a
    // record linked to its OWN pik can never be incorrect, even on a
    // multi-simulant pik). At this test SF the slice is empty — k=83's
    // neighbor is SSN-less, so no wrong link fires — which itself pins
    // the diagnosis emitting no false positives.
    val incorrectIds = diag.filter(col("kind") === "incorrect")
      .select("in_id").collect().map(_.getString(0)).toSet
    assert(incorrectIds.forall(_.stripPrefix("cin_").toLong % 83 == 0),
      s"non-wrong-link rows diagnosed incorrect: $incorrectIds")
    diag.unpersist()
  }

  test("q125 verification module: wrong-SSN filing fails, clean filings verify, " +
    "ITINs are unknown") {
    val v = RefFileQueries.defs.find(_.name == "q125_verification_module").get
      .query(spark, sfDir).cache()
    val byRec = v.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // The planted wrong-SSN 2026 filing resolves to the NEIGHBOR's
    // identity, the names disagree, verification rejects it (no PIK).
    val (ssn57, out57, pik57) = byRec("w2_2026_57")
    assert(ssn57 == 58L && out57 == "failed" && pik57 == -1L,
      s"wrong-SSN filing not rejected: $ssn57 $out57 $pik57")
    // The same filer's other years verify under the own SSN and take a PIK.
    val (ssnOk, outOk, pikOk) = byRec("w2_2025_57")
    assert(ssnOk == 57L && outOk == "verified" && pikOk >= 0L,
      s"clean filing not verified: $ssnOk $outOk $pikOk")
    // ITIN-range SSNs are outside the numident: unknown, to be covered by
    // the ITIN incorporation path (q118).
    assert(v.filter(col("ssn") >= 900000000L &&
      col("outcome") =!= "unknown_ssn").count() == 0)
    // Verification passes the clean bulk (IRS truncation survives the JW
    // threshold) and every verified row carries a PIK.
    val n = v.count().toDouble
    assert(v.filter(col("outcome") === "verified").count() / n > 0.8,
      "verification rejected the clean bulk")
    assert(v.filter(col("outcome") === "verified" && col("pik").isNull).count() == 0)
    assert(v.filter(col("outcome") =!= "verified" && col("pik").isNotNull).count() == 0)
    v.unpersist()
  }

  test("ITIN incorporation: ITIN rows are PIKed and carry the IRS truncation") {
    val itinRef = RefFileQueries.defs.find(_.name == "q118_itin_incorporation").get
      .query(spark, sfDir).cache()
    val itins = itinRef.filter(col("id_type") === "itin").cache()
    assert(itins.count() > 0, "no ITIN rows minted")
    // ITIN-range identifiers start with 9 (the reference's ITIN test) and
    // every one received a PIK.
    assert(itins.filter(!col("id").cast("string").startsWith("9")).count() == 0,
      "an ITIN outside the 9-range")
    assert(itins.filter(col("pik").isNull).count() == 0, "an ITIN row without a PIK")
    // PIKs are contiguous over the union: max pik == rows - 1.
    val total = itinRef.count()
    assert(itinRef.agg(max("pik")).head.getLong(0) == total - 1,
      "PIK minting left holes")
    // Only SSN-less people (k%5=4) get ITINs — no double identity.
    assert(itins.filter(pmod(col("id") - 900000000L, lit(5)) =!= 4).count() == 0,
      "an SSN holder was minted an ITIN")
    // The 1040-sourced names carry the IRS 4-char truncation on a real
    // fraction of rows (q74's machinery; where ITIN PIKing meets the
    // truncation, per the reference's own comment).
    val truncated = itins.filter(length(col("last_name")) === 4).count()
    assert(truncated > 0, "no ITIN row shows the 4-char IRS truncation")
    itins.unpersist(); itinRef.unpersist()
  }
}
