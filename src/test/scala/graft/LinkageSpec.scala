package graft

import graft.functions.GraftFunctions
import graft.linkage._
import graft.queries.LinkageQueries
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkTestBase {

  private def census = LinkageQueries.census(spark, sfDir)
  private def input = LinkageQueries.input(spark, sfDir)
  private val cfg = LinkageQueries.config

  test("all linkage queries run and return rows at sf0.001") {
    LinkageQueries.defs.foreach { d =>
      GraftFunctions.register(spark)
      assert(d.query(spark, sfDir).count() > 0, s"${d.name} returned no rows")
    }
  }

  test("cascade accuracy beats 0.9 precision and recall") {
    GraftFunctions.register(spark)
    val links = LinkageCascade.run(census, input, cfg).cache()
    val nLinks = links.count().toDouble
    val nCorrect = links.filter(col("pik") === col("rec_id")).count().toDouble
    val nTrue = census.count().toDouble
    links.unpersist()
    assert(nCorrect / nLinks > 0.9, s"precision ${nCorrect / nLinks}")
    assert(nCorrect / nTrue > 0.9, s"recall ${nCorrect / nTrue}")
  }

  test("salted blocking produces exactly the same pairs as unsalted") {
    val pass = BlockingPass("zip3", Seq("zip3"))
    val salted = BlockingPass("zip3s", Seq("zip3"), salt = 4)
    val a = LinkageCascade.pairs(census, input, pass)
      .select("l_pik", "r_rec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = LinkageCascade.pairs(census, input, salted)
      .select("l_pik", "r_rec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b, s"salting changed the candidate set: ${a.size} vs ${b.size}")
  }

  test("EM m-probabilities sum to 1 per comparison and find strong agreement") {
    GraftFunctions.register(spark)
    val m = LinkageCascade.emTrainM(census, input, LinkageQueries.blockPass, cfg, iterations = 3)
    val byComp = m.groupBy(_._1)
    byComp.foreach { case (name, rows) =>
      val total = rows.map(_._3).sum
      assert(math.abs(total - 1.0) < 1e-6, s"$name m sums to $total")
    }
    // Matches agree on first name far more often than chance.
    val firstTop = m.find(t => t._1 == "first" && t._2 == 2).get._3
    assert(firstTop > 0.5, s"EM top-level m for first_name: $firstTop")
  }

  test("u estimates sum to 1 per comparison") {
    GraftFunctions.register(spark)
    val u = LinkageCascade.estimateU(census, input, cfg)
      .groupBy("comparison").agg(sum("u_hat").as("total")).collect()
    u.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-3, r.toString))
  }

  /** Shared cascade run for the planted-class assertions. */
  private lazy val cascade: Array[(Long, Long, String)] = {
    GraftFunctions.register(spark)
    LinkageCascade.run(census, input, cfg)
      .select("pik", "rec_id", "pass").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
  }

  private def linksOf(pass: String) = cascade.filter(_._3 == pass)

  test("geokey name-switch pass recovers transposed-name records") {
    val links = linksOf("p2_geokey_switch")
    assert(links.nonEmpty, "name-switch pass linked nothing")
    links.foreach { case (pik, rec, _) =>
      assert(pik == rec, s"name-switch mislink $pik -> $rec")
      assert(rec % 23 == 0, s"name-switch linked a non-swapped record $rec")
    }
  }

  test("street-soundex pass recovers zip-typo records") {
    val links = linksOf("p3_street_sdx")
    assert(links.nonEmpty, "street-soundex pass linked nothing")
    links.foreach { case (pik, rec, _) =>
      assert(pik == rec, s"street-soundex mislink $pik -> $rec")
      assert(rec % 17 == 0, s"street-soundex linked a non-zip-typo record $rec")
    }
  }

  test("DOB+NYSIIS pass recovers vowel-mangled class-N records") {
    val links = linksOf("p5_dob_nysiis")
    val classN = links.filter(_._2 % 29 == 0)
    assert(classN.nonEmpty, "NYSIIS pass recovered no class-N records")
    classN.foreach { case (pik, rec, _) => assert(pik == rec, s"N mislink $pik -> $rec") }
    // No earlier pass should have caught a class-N record: the vowel swap
    // breaks geokey (stale census address), fn2/ln2, and prefixes.
    val early = cascade.filter(t => t._2 % 29 == 0 &&
      Set("p1_geokey", "p2_geokey_switch", "p3_street_sdx").contains(t._3))
    assert(early.isEmpty, s"class-N recovered before NYSIIS: ${early.toSeq}")
  }

  test("reverse-soundex pass recovers first-letter-swapped class-V records") {
    val links = linksOf("p8_rev_sdx")
    val classV = links.filter(t => t._2 % 19 == 0 && t._2 % 29 != 0)
    assert(classV.nonEmpty, "reverse-soundex pass recovered no class-V records")
    classV.foreach { case (pik, rec, _) => assert(pik == rec, s"V mislink $pik -> $rec") }
  }

  test("hhcomp passes recover moved-household records via housemate links") {
    val hh = cascade.filter(t => t._3 == "p9_hh_initials" || t._3 == "p10_hh_yob")
    assert(hh.nonEmpty, "hhcomp passes linked nothing")
    hh.foreach { case (pik, rec, _) => assert(pik == rec, s"hhcomp mislink $pik -> $rec") }
    // Every hhcomp link is a member of a moved household (hh%13, non-GQ).
    hh.foreach { case (_, rec, _) =>
      val hhId = if (rec % 200 < 20) rec - rec % 200 else rec - rec % 4
      assert(hhId % 13 == 0 && hhId % 200 != 0, s"hhcomp linked non-mover $rec (hh $hhId)")
    }
  }

  test("GQ records never enter address-blocked passes") {
    val gqRecs = cascade.filter(t =>
      t._2 % 200 < 20 &&
        Set("p1_geokey", "p2_geokey_switch", "p3_street_sdx",
          "p9_hh_initials", "p10_hh_yob").contains(t._3))
    assert(gqRecs.isEmpty, s"GQ records linked via address blocking: ${gqRecs.toSeq}")
  }

  test("confirm drops links to deceased PIKs") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.lit
    val links = LinkageCascade.run(census, input, cfg).cache()
    val deceased = census.filter(pmod(col("pik"), lit(29)) === 0).select("pik")
    val confirmed = LinkageCascade.confirm(links, deceased)
    assert(confirmed.count() < links.count())
    assert(confirmed.filter(pmod(col("pik"), lit(29)) === 0).count() == 0)
    links.unpersist()
  }

  test("predict pass plans as a single equi-join, no cartesian product") {
    GraftFunctions.register(spark)
    val plan = LinkageCascade
      .predict(census, input, LinkageQueries.blockPass, cfg)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"unexpected cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"), s"unexpected BNLJ:\n$plan")
  }
}
