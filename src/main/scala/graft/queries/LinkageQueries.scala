package graft.queries

import graft.QueryDef
import graft.functions.GraftFunctions
import graft.linkage._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.D — the Fellegi-Sunter linkage engine (flagship). Two deterministic
  * sides derive from `persons`: `census` (clean, 80% coverage, keyed pik)
  * and `input` (messy names, occasional DOB-day perturbation, keyed
  * rec_id); ground truth is pik == rec_id. The model/passes live in
  * graft.linkage and are rendered to DuckDB SQL from the same config.
  */
object LinkageQueries {

  // ---- the model (shared by all queries + the oracle SQL) ----------------

  val comparisons: Seq[Comparison] = Seq(
    Comparison("first", "first_name",
      Seq(ComparisonLevel(JwAtLeast(0.9), 0.70, 0.01),
        ComparisonLevel(JwAtLeast(0.75), 0.20, 0.05)), 0.10, 0.94),
    Comparison("last", "last_name",
      Seq(ComparisonLevel(JwAtLeast(0.9), 0.65, 0.02),
        ComparisonLevel(JwAtLeast(0.75), 0.20, 0.04)), 0.15, 0.94),
    Comparison("mid", "middle_initial",
      Seq(ComparisonLevel(ExactMatch, 0.90, 0.05)), 0.10, 0.95),
    Comparison("byear", "dob_year",
      Seq(ComparisonLevel(AbsDiffAtMost(0), 0.90, 0.017),
        ComparisonLevel(AbsDiffAtMost(1), 0.05, 0.030)), 0.05, 0.953),
    Comparison("bday", "dob_day",
      Seq(ComparisonLevel(AbsDiffAtMost(0), 0.85, 0.036)), 0.15, 0.964))

  val passes: Seq[BlockingPass] = Seq(
    BlockingPass("p1_zip", Seq("zipcode")),
    BlockingPass("p2_name_yob", Seq("fn2", "dob_year")),
    BlockingPass("p3_dob_ln", Seq("dob_month", "dob_day", "ln1")),
    // PVS-style name-switch pass: recovers records with transposed
    // first/last names (reference geosearch "name-switch" passes).
    BlockingPass("p4_switch", Seq("dob_year", "dob_month"),
      rightRemap = Map("first_name" -> "last_name", "last_name" -> "first_name")))

  val config: LinkageConfig = LinkageConfig(comparisons, lambda = 0.5,
    thresholdWeight = 9.0, passes = passes)

  val blockPass: BlockingPass = BlockingPass("zip3_block", Seq("zip3"))

  // ---- the two sides (Spark + CTE in lockstep) ---------------------------

  /** Clean reference file: persons with k%5 != 4 (80% PIK coverage). */
  def census(s: SparkSession, d: String): DataFrame =
    People.persons(s, d)
      .filter(pmod(col("k"), lit(5)) =!= 4)
      .select(
        col("k").as("pik"),
        col("first_name"), col("last_name"), col("middle_initial"),
        col("dob_year"), col("dob_month"), col("dob_day"),
        col("zipcode"),
        substring(col("zipcode"), 1, 3).as("zip3"),
        substring(col("first_name"), 1, 2).as("fn2"),
        substring(col("last_name"), 1, 1).as("ln1"))

  /** Messy input file: typo'd names; k%13==0 records carry a wrong DOB day;
    * k%23==0 records arrive with first/last names transposed (recovered by
    * the name-switch pass).
    */
  def input(s: SparkSession, d: String): DataFrame =
    People.persons(s, d)
      .select(
        col("k").as("rec_id"),
        when(pmod(col("k"), lit(23)) === 0, col("messy_last"))
          .otherwise(col("messy_first")).as("first_name"),
        when(pmod(col("k"), lit(23)) === 0, col("messy_first"))
          .otherwise(col("messy_last")).as("last_name"),
        col("middle_initial"),
        col("dob_year"), col("dob_month"),
        when(pmod(col("k"), lit(13)) === 0, pmod(col("dob_day"), lit(28)) + 1)
          .otherwise(col("dob_day")).cast("int").as("dob_day"),
        // k%17==0 records carry a zip typo in the last two digits, so the
        // zipcode-blocked pass misses them and later passes must recover.
        when(pmod(col("k"), lit(17)) === 0,
          concat(substring(col("zipcode"), 1, 3), lit("99")))
          .otherwise(col("zipcode")).as("zipcode"),
        substring(col("zipcode"), 1, 3).as("zip3"))
      .withColumn("fn2", substring(col("first_name"), 1, 2))
      .withColumn("ln1", substring(col("last_name"), 1, 1))

  private val censusCte: String =
    """census AS (
      |  SELECT k AS pik, first_name, last_name, middle_initial,
      |         dob_year, dob_month, dob_day, zipcode,
      |         substr(zipcode, 1, 3) AS zip3,
      |         substr(first_name, 1, 2) AS fn2,
      |         substr(last_name, 1, 1) AS ln1
      |  FROM persons WHERE k % 5 <> 4)""".stripMargin

  private val inputCte: String =
    """input AS (
      |  SELECT rec_id, first_name, last_name, middle_initial,
      |         dob_year, dob_month, dob_day, zipcode, zip3,
      |         substr(first_name, 1, 2) AS fn2,
      |         substr(last_name, 1, 1) AS ln1
      |  FROM (
      |    SELECT k AS rec_id,
      |           CASE WHEN k % 23 = 0 THEN messy_last ELSE messy_first END AS first_name,
      |           CASE WHEN k % 23 = 0 THEN messy_first ELSE messy_last END AS last_name,
      |           middle_initial, dob_year, dob_month,
      |           CAST(CASE WHEN k % 13 = 0 THEN (dob_day % 28) + 1 ELSE dob_day END AS INTEGER) AS dob_day,
      |           CASE WHEN k % 17 = 0 THEN substr(zipcode, 1, 3) || '99' ELSE zipcode END AS zipcode,
      |           substr(zipcode, 1, 3) AS zip3
      |    FROM persons))""".stripMargin

  private val base = s"WITH ${People.personsCte},\n$censusCte,\n$inputCte"

  // ---- SQL fragments generated from the config ---------------------------

  private def keysOn(keys: Seq[String]): String =
    keys.map(k => s"c.$k = i.$k").mkString(" AND ")

  private val inputCols = Seq("rec_id", "first_name", "last_name", "middle_initial",
    "dob_year", "dob_month", "dob_day", "zipcode", "zip3", "fn2", "ln1")

  /** Mirror of LinkageCascade's rightRemap: rename right-side columns
    * before pairing (the name-switch pass).
    */
  private def remappedRel(rel: String, remap: Map[String, String]): String =
    if (remap.isEmpty) rel
    else {
      val sel = inputCols.map(c => s"${remap.getOrElse(c, c)} AS $c").mkString(", ")
      s"(SELECT $sel FROM $rel remap_t)"
    }

  private def gammaSelects: String =
    comparisons.map(c => s"${FellegiSunter.gammaSql(c, "c", "i")} AS ${c.gammaName}").mkString(",\n         ")

  /** cand/scored/best CTE chain for one pass over `inputRel`. */
  private def passSql(pass: BlockingPass, inputRel: String, tag: String): String =
    s"""cand_$tag AS (
       |  SELECT c.pik, i.rec_id,
       |         $gammaSelects
       |  FROM census c JOIN $inputRel i ON ${keysOn(pass.keys)}),
       |scored_$tag AS (
       |  SELECT pik, rec_id, ${FellegiSunter.matchWeightSql(comparisons)} AS match_weight
       |  FROM cand_$tag),
       |best_$tag AS (
       |  SELECT pik, rec_id, match_weight FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY rec_id) AS n_top FROM (
       |      SELECT * FROM (
       |        SELECT pik, rec_id, match_weight,
       |               MAX(match_weight) OVER (PARTITION BY rec_id) AS w_max
       |        FROM scored_$tag
       |        WHERE match_weight >= ${config.thresholdWeight}) t1
       |      WHERE match_weight = w_max) t2) t3
       |  WHERE n_top = 1)""".stripMargin

  /** CTE chain mirroring LinkageCascade.run over config.passes. */
  private def cascadeCtes: String = {
    val parts = new StringBuilder(base)
    var prevBest = List.empty[String]
    passes.zipWithIndex.foreach { case (pass, idx) =>
      val tag = s"p${idx + 1}"
      val rel =
        if (prevBest.isEmpty) "input"
        else {
          val excluded = prevBest.map(b => s"SELECT rec_id FROM $b").mkString(" UNION ALL ")
          s"(SELECT * FROM input WHERE rec_id NOT IN ($excluded))"
        }
      parts.append(",\n").append(passSql(pass, remappedRel(rel, pass.rightRemap), tag))
      prevBest = prevBest :+ s"best_$tag"
    }
    parts.toString
  }

  private def cascadeSql: String = {
    val unions = passes.zipWithIndex
      .map { case (p, idx) =>
        s"SELECT pik, rec_id, round(match_weight, 6) AS mw, '${p.name}' AS pass FROM best_p${idx + 1}"
      }
      .mkString("\nUNION ALL\n")
    s"$cascadeCtes\n$unions"
  }

  /** Accuracy over the cascade links vs ground truth pik == rec_id. */
  private def accuracySql: String = {
    val links = passes.zipWithIndex
      .map { case (_, idx) => s"SELECT pik, rec_id FROM best_p${idx + 1}" }
      .mkString("\n  UNION ALL\n  ")
    s"""$cascadeCtes,
       |links AS (
       |  $links)
       |SELECT COUNT(*) AS n_links,
       |       CAST(SUM(CASE WHEN pik = rec_id THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       |       (SELECT COUNT(*) FROM census) AS n_true,
       |       round(CAST(SUM(CASE WHEN pik = rec_id THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS precision_,
       |       round(CAST(SUM(CASE WHEN pik = rec_id THEN 1 ELSE 0 END) AS DOUBLE) / CAST((SELECT COUNT(*) FROM census) AS DOUBLE), 6) AS recall_
       |FROM links""".stripMargin
  }

  // ---- the queries -------------------------------------------------------

  private def reg(s: SparkSession): Unit = GraftFunctions.register(s)

  /** q32 and q33 both need the full cascade; its per-pass links are already
    * localCheckpointed, so memoizing the assembled frame per (session, dir)
    * means the accuracy query reuses the materialized links instead of
    * re-running every predict pass.
    */
  private val cascadeFrames =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def cascadeLinks(s: SparkSession, d: String): DataFrame =
    cascadeFrames.getOrElseUpdate((s, d),
      LinkageCascade.run(census(s, d), input(s, d), config))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q26_block_pairs",
      (s, d) =>
        LinkageCascade.pairs(census(s, d), input(s, d), blockPass)
          .select(col("l_pik").as("pik"), col("r_rec_id").as("rec_id")),
      Some(s"""$base
              |SELECT c.pik, i.rec_id FROM census c JOIN input i ON c.zip3 = i.zip3""".stripMargin)
    ),
    QueryDef(
      "q27_comparison_vectors",
      (s, d) => {
        reg(s)
        comparisons.foldLeft(LinkageCascade.pairs(census(s, d), input(s, d), blockPass)) {
          (df, c) => df.withColumn(c.gammaName, FellegiSunter.gammaCol(c))
        }.select(col("l_pik").as("pik") +: col("r_rec_id").as("rec_id") +:
          comparisons.map(c => col(c.gammaName)): _*)
      },
      Some(s"""$base
              |SELECT c.pik, i.rec_id,
              |       $gammaSelects
              |FROM census c JOIN input i ON c.zip3 = i.zip3""".stripMargin)
    ),
    QueryDef(
      "q28_match_weights",
      (s, d) => {
        reg(s)
        LinkageCascade.score(
            LinkageCascade.pairs(census(s, d), input(s, d), blockPass), config)
          .select(
            col("l_pik").as("pik"), col("r_rec_id").as("rec_id"),
            round(col("match_weight"), 6).as("mw"),
            round(FellegiSunter.probabilityCol(col("match_weight"), config.lambda), 6)
              .as("match_probability"))
      },
      Some(s"""$base,
              |cand AS (
              |  SELECT c.pik, i.rec_id,
              |         $gammaSelects
              |  FROM census c JOIN input i ON c.zip3 = i.zip3),
              |scored AS (
              |  SELECT pik, rec_id, ${FellegiSunter.matchWeightSql(comparisons)} AS match_weight
              |  FROM cand)
              |SELECT pik, rec_id, round(match_weight, 6) AS mw,
              |       round(${FellegiSunter.probabilitySql("match_weight", config.lambda)}, 6) AS match_probability
              |FROM scored""".stripMargin)
    ),
    QueryDef(
      "q29_predict_links",
      (s, d) => {
        reg(s)
        LinkageCascade.predict(census(s, d), input(s, d), blockPass, config)
          .select(col("pik"), col("rec_id"), round(col("match_weight"), 6).as("mw"))
      },
      Some(s"""$base,
              |${passSql(blockPass, "input", "b")}
              |SELECT pik, rec_id, round(match_weight, 6) AS mw FROM best_b""".stripMargin)
    ),
    QueryDef(
      "q30_u_estimation",
      (s, d) => {
        reg(s)
        LinkageCascade.estimateU(census(s, d), input(s, d), config)
      },
      Some(s"""$base,
              |csamp AS (SELECT * FROM census
              |          WHERE pik % greatest(1, (SELECT COUNT(*) FROM census) // ${LinkageCascade.uSampleTarget}) = 0),
              |isamp AS (SELECT * FROM input
              |          WHERE rec_id % greatest(1, (SELECT COUNT(*) FROM input) // ${LinkageCascade.uSampleTarget}) = 0),
              |prs AS (
              |  SELECT $gammaSelects
              |  FROM csamp c CROSS JOIN isamp i),
              |stacked AS (
              |  ${comparisons.map(c => s"SELECT '${c.name}' AS comparison, ${c.gammaName} AS gamma FROM prs")
                  .mkString("\n  UNION ALL\n  ")}),
              |grouped AS (SELECT comparison, gamma, COUNT(*) AS n FROM stacked GROUP BY comparison, gamma)
              |SELECT comparison, gamma, n,
              |       round(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY comparison) AS DOUBLE), 6) AS u_hat
              |FROM grouped""".stripMargin)
    ),
    QueryDef(
      // EM is iterative driver-orchestrated training → rows-only oracle;
      // LinkageSpec asserts convergence properties instead. Two training
      // blockings, like the reference (first_name+zipcode, geokey): each
      // blocking only assumes ITS keys agree among matches.
      "q31_em_training",
      (s, d) => {
        reg(s)
        val result = LinkageCascade.emTrainMMulti(
          census(s, d), input(s, d),
          Seq(blockPass, BlockingPass("em_name_yob", Seq("fn2", "dob_year"))),
          config)
        s.createDataFrame(result.map { case (c, g, m) => (c, g, BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) })
          .toDF("comparison", "gamma", "m_hat")
      }
    ),
    QueryDef(
      "q32_cascade_best_link",
      (s, d) => {
        reg(s)
        cascadeLinks(s, d)
          .select(col("pik"), col("rec_id"), round(col("match_weight"), 6).as("mw"), col("pass"))
      },
      Some(s"""$cascadeSql""".stripMargin)
    ),
    QueryDef(
      "q33_accuracy_eval",
      (s, d) => {
        reg(s)
        val links = cascadeLinks(s, d)
        val truth = census(s, d).select(count(lit(1)).as("n_true"))
        links
          .agg(
            count(lit(1)).as("n_links"),
            sum(when(col("pik") === col("rec_id"), 1L).otherwise(0L)).as("n_correct"))
          .crossJoin(truth)
          .select(
            col("n_links"), col("n_correct"), col("n_true"),
            round(col("n_correct").cast("double") / col("n_links").cast("double"), 6).as("precision_"),
            round(col("n_correct").cast("double") / col("n_true").cast("double"), 6).as("recall_"))
      },
      Some(accuracySql)
    )
  )
}
