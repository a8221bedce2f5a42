package graft

import graft.linkage.{FellegiSunter, LinkageCascade}
import graft.queries.LinkageQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not a test): measure gamma-PATTERN-compressed scoring
  * (score the distinct gamma tuples once — bounded by Π level counts —
  * and re-join weights to pairs by pattern key) against the production
  * inline CASE-chain weight, over the demo blocking's pair volume at a
  * given dir. The round-16 verdict's suggestion for the q27/q28/q31
  * pair-volume trio; the EM loop is already pattern-compressed
  * (gammaHistogram), so the open question is whether the SCORING pass
  * gains anything — the inline weight is a codegen'd CASE over ints,
  * so the hypothesis to refute is that a broadcast join beats branch-
  * free arithmetic. Run:
  *   sbt "Test/runMain graft.GammaProbe target/scaledata/x30"
  */
object GammaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-gamma-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val census = LinkageQueries.census(spark, dir).cache()
    val input = LinkageQueries.input(spark, dir).cache()
    census.count(); input.count()
    val comparisons = LinkageQueries.comparisons
    val cfg = LinkageQueries.config

    def force(df: DataFrame): Long =
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect().head.getLong(0)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gamma] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val nPairs = LinkageCascade
      .pairs(census, input, LinkageQueries.blockPass).count()
    println(s"[gamma] $dir pairs=$nPairs")

    def gammas(): DataFrame =
      LinkageCascade
        .pairs(census, input, LinkageQueries.blockPass)
        .select(col("l_pik").as("pik") +: col("r_rec_id").as("rec_id") +:
          comparisons.map(c => FellegiSunter.gammaCol(c).as(c.gammaName)): _*)

    // Variant A — production: gammas + inline codegen CASE weight.
    (1 to 2).foreach { i =>
      time(s"inline (run $i)") {
        val df = LinkageCascade
          .score(LinkageCascade.pairs(census, input, LinkageQueries.blockPass), cfg)
          .select(col("l_pik").as("pik"), col("r_rec_id").as("rec_id"),
            round(col("match_weight"), 6).as("mw"))
        force(df)
      }
    }

    // Variant B — pattern-compressed: distinct gamma tuples scored once,
    // weights re-joined by pattern key (broadcast — the pattern table is
    // bounded by Π(levels+2) ≈ tiny at any corpus size).
    (1 to 2).foreach { i =>
      time(s"pattern-join (run $i)") {
        val g = gammas()
        val names = comparisons.map(_.gammaName)
        val pat = g.select(names.map(col): _*).distinct()
          .withColumn("match_weight", FellegiSunter.matchWeightCol(comparisons))
        val df = g.join(broadcast(pat), names)
          .select(col("pik"), col("rec_id"), round(col("match_weight"), 6).as("mw"))
        force(df)
      }
    }

    // Variant C — gamma eval only (the irreducible per-pair string work),
    // to show where the wall actually lives.
    (1 to 2).foreach { i =>
      time(s"gammas only (run $i)") { force(gammas()) }
    }

    val nPat = gammas().select(comparisons.map(c => col(c.gammaName)): _*)
      .distinct().count()
    println(s"[gamma] distinct patterns=$nPat")
    spark.stop()
  }
}
