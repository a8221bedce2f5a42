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

  test("name-switch pass recovers transposed-name records") {
    GraftFunctions.register(spark)
    val links = LinkageCascade.run(census, input, cfg)
      .filter(col("pass") === "p4_switch").cache()
    assert(links.count() > 0, "name-switch pass linked nothing")
    // everything it links is a swapped-name record (k%23==0) it got RIGHT
    links.collect().foreach { r =>
      val pik = r.getLong(0); val rec = r.getLong(1)
      assert(pik == rec, s"name-switch mislink $pik -> $rec")
      assert(rec % 23 == 0, s"name-switch linked a non-swapped record $rec")
    }
    links.unpersist()
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
