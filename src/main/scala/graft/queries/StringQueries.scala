package graft.queries

import graft.QueryDef
import graft.functions.{GraftFunctions, Phonetics}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** §2.C — string similarity & phonetics, the scoring/blocking primitives of
  * the reference's Splink model (jaro_winkler comparisons) and PVS-style
  * phonetic blocking (soundex / reverse soundex / NYSIIS;
  * /root/reference/03_link_datasets.ipynb "add_name_phonetics").
  *
  * Jaro-Winkler and NYSIIS are native codegen'd Catalyst expressions;
  * n-gram Jaccard is composed from higher-order built-ins. All stay inside
  * whole-stage codegen.
  */
object StringQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q21_jaro_winkler",
      (s, d) => {
        GraftFunctions.register(s)
        People.people(s, d).select(
          col("k"),
          col("first_name"),
          col("messy_first"),
          round(jaroWinkler(col("first_name"), col("messy_first")), 6).as("jw_first"),
          round(jaroWinkler(col("last_name"), col("messy_last")), 6).as("jw_last"),
          round(jaroWinkler(col("first_name"), col("last_name")), 6).as("jw_cross"))
      },
      Some(s"""WITH ${People.peopleCte}
              |SELECT k, first_name, messy_first,
              |       round(jaro_winkler_similarity(first_name, messy_first), 6) AS jw_first,
              |       round(jaro_winkler_similarity(last_name, messy_last), 6) AS jw_last,
              |       round(jaro_winkler_similarity(first_name, last_name), 6) AS jw_cross
              |FROM people""".stripMargin)
    ),
    QueryDef(
      "q22_levenshtein",
      (s, d) =>
        People.people(s, d).select(
          col("k"),
          levenshtein(col("first_name"), col("messy_first")).as("lev_first"),
          levenshtein(col("last_name"), col("messy_last")).as("lev_last"),
          levenshtein(col("first_name"), col("last_name")).as("lev_cross")),
      Some(s"""WITH ${People.peopleCte}
              |SELECT k,
              |       levenshtein(first_name, messy_first) AS lev_first,
              |       levenshtein(last_name, messy_last) AS lev_last,
              |       levenshtein(first_name, last_name) AS lev_cross
              |FROM people""".stripMargin)
    ),
    QueryDef(
      // The dual-rendered soundex/reverse-soundex blocking keys
      // (graft.functions.Phonetics): DuckDB has no soundex builtin, so the
      // oracle runs the SAME translate/regexp chain the Spark plan does.
      "q23_soundex",
      (s, d) =>
        People.people(s, d).select(
          col("k"),
          Phonetics.sdx(col("first_name")).as("sdx_first"),
          Phonetics.sdx(col("last_name")).as("sdx_last"),
          Phonetics.rsdx(col("first_name")).as("rsdx_first"),
          Phonetics.rsdx(col("last_name")).as("rsdx_last")),
      Some(s"""WITH ${People.peopleCte}
              |SELECT k,
              |       ${Phonetics.sdxSql("first_name")} AS sdx_first,
              |       ${Phonetics.sdxSql("last_name")} AS sdx_last,
              |       ${Phonetics.rsdxSql("first_name")} AS rsdx_first,
              |       ${Phonetics.rsdxSql("last_name")} AS rsdx_last
              |FROM people""".stripMargin)
    ),
    QueryDef(
      // DuckDB has no NYSIIS -> rows-only check + golden ScalaTest. (The
      // Phonetics.nysKeySql regexp chain is NOT an oracle candidate: it's
      // the simplified blocking key, while this expression implements the
      // full iterative NYSIIS — e.g. CHARLIE → CARL vs the chain's CHARL.)
      "q24_nysiis",
      (s, d) => {
        GraftFunctions.register(s)
        People.people(s, d).select(
          col("k"),
          nysiis(col("first_name")).as("nysiis_first"),
          nysiis(col("last_name")).as("nysiis_last"))
      }
    ),
    QueryDef(
      "q25_ngram_jaccard",
      (s, d) =>
        People.people(s, d).select(
          col("k"),
          round(ngramJaccard(col("first_name"), col("messy_first"), 3), 6).as("jac_first"),
          round(ngramJaccard(col("first_name"), col("last_name"), 3), 6).as("jac_cross")),
      Some(s"""WITH ${People.peopleCte},
              |grams AS (
              |  SELECT k,
              |    list_distinct([first_name[i:i+2] FOR i IN range(1, greatest(length(first_name) - 2, 0) + 1)]) AS ga,
              |    list_distinct([messy_first[i:i+2] FOR i IN range(1, greatest(length(messy_first) - 2, 0) + 1)]) AS gm,
              |    list_distinct([last_name[i:i+2] FOR i IN range(1, greatest(length(last_name) - 2, 0) + 1)]) AS gl
              |  FROM people)
              |SELECT k,
              |  round(CASE WHEN len(list_distinct(list_concat(ga, gm))) = 0 THEN 0.0
              |        ELSE len(list_intersect(ga, gm)) / CAST(len(list_distinct(list_concat(ga, gm))) AS DOUBLE) END, 6) AS jac_first,
              |  round(CASE WHEN len(list_distinct(list_concat(ga, gl))) = 0 THEN 0.0
              |        ELSE len(list_intersect(ga, gl)) / CAST(len(list_distinct(list_concat(ga, gl))) AS DOUBLE) END, 6) AS jac_cross
              |FROM grams""".stripMargin)
    )
  )
}
