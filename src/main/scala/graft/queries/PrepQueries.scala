package graft.queries

import graft.QueryDef
import graft.operators.Preprocess
import graft.operators.Preprocess._
import org.apache.spark.sql.functions._

/** §2.B — linkage preprocessing (reference 03_link_datasets.ipynb
  * "Pre-processing": address standardization, geokey, truncated names, cut
  * columns, DOB split, nickname expansion, fake-name null-out, probable-GQ
  * detection). All scalar transforms are codegen'd map-side work; the two
  * joins (nicknames, fake names) broadcast tiny dimension lists.
  */
object PrepQueries {

  private val withPersons = s"WITH ${People.personsCte}"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q13_std_address",
      (s, d) =>
        People.persons(s, d).select(
          col("k"),
          col("street_num"),
          standardizeAddressPart(col("street_raw")).as("std_street"),
          standardizeAddressPart(col("unit_raw")).as("std_unit"),
          standardizeAddressPart(col("city")).as("std_city")),
      Some(s"""$withPersons
              |SELECT k, street_num,
              |       ${standardizeAddressPartSql("street_raw")} AS std_street,
              |       ${standardizeAddressPartSql("unit_raw")} AS std_unit,
              |       ${standardizeAddressPartSql("city")} AS std_city
              |FROM persons""".stripMargin)
    ),
    QueryDef(
      "q14_geokey",
      (s, d) =>
        People.persons(s, d).select(
          col("k"),
          Preprocess.geokey(
            col("street_num"),
            standardizeAddressPart(col("street_raw")),
            standardizeAddressPart(col("unit_raw")),
            col("city"), col("state"), col("zipcode")).as("geokey")),
      Some(s"""$withPersons
              |SELECT k,
              |       ${geokeySql(Seq(
                        "street_num",
                        standardizeAddressPartSql("street_raw"),
                        standardizeAddressPartSql("unit_raw"),
                        "city", "state", "zipcode"))} AS geokey
              |FROM persons""".stripMargin)
    ),
    QueryDef(
      "q15_trunc_names",
      (s, d) =>
        People.persons(s, d).select(
          col("k"),
          substring(col("first_name"), 1, 15).as("first_name_15"),
          substring(col("last_name"), 1, 12).as("last_name_12"),
          substring(col("first_name"), 1, 1).as("fn1"),
          substring(col("first_name"), 1, 2).as("fn2"),
          substring(col("first_name"), 1, 3).as("fn3"),
          substring(col("last_name"), 1, 1).as("ln1"),
          col("middle_initial")),
      Some(s"""$withPersons
              |SELECT k,
              |       substr(first_name, 1, 15) AS first_name_15,
              |       substr(last_name, 1, 12) AS last_name_12,
              |       substr(first_name, 1, 1) AS fn1,
              |       substr(first_name, 1, 2) AS fn2,
              |       substr(first_name, 1, 3) AS fn3,
              |       substr(last_name, 1, 1) AS ln1,
              |       middle_initial
              |FROM persons""".stripMargin)
    ),
    QueryDef(
      "q16_cut_columns",
      (s, d) =>
        People.persons(s, d).select(
          col("k"),
          substring(col("zipcode"), 1, 3).as("zip3"),
          initialCut(substring(col("messy_first"), 1, 1)).as("cut_first"),
          initialCut(substring(col("messy_last"), 1, 1)).as("cut_last")),
      Some(s"""$withPersons
              |SELECT k,
              |       substr(zipcode, 1, 3) AS zip3,
              |       ${initialCutSql("substr(messy_first, 1, 1)")} AS cut_first,
              |       ${initialCutSql("substr(messy_last, 1, 1)")} AS cut_last
              |FROM persons""".stripMargin)
    ),
    QueryDef(
      "q17_split_dob",
      (s, d) => {
        val dob = tolerantDate(col("dob_raw"))
        People.persons(s, d).select(
          col("k"),
          col("dob_raw"),
          year(dob).as("byear"),
          month(dob).as("bmonth"),
          dayofmonth(dob).as("bday"))
      },
      Some(s"""$withPersons
              |SELECT k, dob_raw,
              |       CAST(EXTRACT(year FROM d) AS INTEGER) AS byear,
              |       CAST(EXTRACT(month FROM d) AS INTEGER) AS bmonth,
              |       CAST(EXTRACT(day FROM d) AS INTEGER) AS bday
              |FROM (SELECT k, dob_raw, ${tolerantDateSql("dob_raw")} AS d FROM persons)""".stripMargin)
    ),
    QueryDef(
      "q18_nickname_expand",
      (s, d) => {
        val p = People.persons(s, d).select("k", "first_name", "last_name")
        val nick = broadcast(
          s.createDataFrame(Preprocess.nicknames).toDF("name", "alt"))
        val orig = p.select(col("k"), col("first_name"), col("last_name"),
          col("first_name").as("name_variant"), lit("orig").as("variant_type"))
        val alts = p.join(nick, p("first_name") === nick("name"))
          .select(col("k"), col("first_name"), col("last_name"),
            col("alt").as("name_variant"), lit("nick").as("variant_type"))
        orig.unionByName(alts)
      },
      Some(s"""$withPersons,
              |nick AS (SELECT * FROM (VALUES ${Preprocess.nicknamesSqlValues}) t(name, alt))
              |SELECT k, first_name, last_name, first_name AS name_variant, 'orig' AS variant_type FROM persons
              |UNION ALL
              |SELECT k, first_name, last_name, alt AS name_variant, 'nick' AS variant_type
              |FROM persons JOIN nick ON first_name = nick.name""".stripMargin)
    ),
    QueryDef(
      "q19_fake_name_nullout",
      (s, d) => {
        val p = People.persons(s, d).select("k", "first_name", "last_name")
        val fakes = broadcast(
          s.createDataFrame(Preprocess.fakeNames.map(Tuple1(_))).toDF("fake"))
        p.join(fakes, p("first_name") === fakes("fake"), "left")
          .select(
            col("k"),
            when(col("fake").isNotNull, lit(null).cast("string"))
              .otherwise(col("first_name")).as("first_clean"),
            col("last_name"),
            col("fake").isNotNull.as("was_fake"))
      },
      Some(s"""$withPersons,
              |fakes AS (SELECT * FROM (VALUES ${Preprocess.fakeNamesSqlValues}) t(fake))
              |SELECT k,
              |       CASE WHEN fake IS NOT NULL THEN NULL ELSE first_name END AS first_clean,
              |       last_name,
              |       fake IS NOT NULL AS was_fake
              |FROM persons LEFT JOIN fakes ON first_name = fake""".stripMargin)
    ),
    QueryDef(
      // Probable-group-quarters detection (reference 03_link_datasets.ipynb
      // "HACK: Remove address information from GQ" cells): group by the
      // standardized geokey, sum/mean the noisy reported-GQ flag, threshold
      // on BOTH (sum >= 3 catches only unlikely-by-noise groups, mean >= 0.7
      // keeps large ordinary households out). One hash-aggregate.
      "q20_gq_threshold",
      (s, d) =>
        People.persons(s, d)
          .select(People.geokeyCur.as("geokey"),
            (col("housing_type") =!= "Household").cast("int").as("reported_gq"))
          .groupBy("geokey")
          .agg(
            count(lit(1)).as("n_people"),
            sum(col("reported_gq")).as("n_reported"))
          .withColumn("gq_share",
            round(col("n_reported").cast("double") / col("n_people").cast("double"), 6))
          .filter(col("n_reported") >= 3 && col("gq_share") >= 0.7),
      Some(s"""$withPersons
              |SELECT geokey, COUNT(*) AS n_people,
              |       CAST(SUM(reported_gq) AS BIGINT) AS n_reported,
              |       round(CAST(SUM(reported_gq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS gq_share
              |FROM (SELECT ${People.geokeyCurSql} AS geokey,
              |             CAST(housing_type <> 'Household' AS INTEGER) AS reported_gq
              |      FROM persons)
              |GROUP BY geokey
              |HAVING SUM(reported_gq) >= 3
              |   AND round(CAST(SUM(reported_gq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) >= 0.7""".stripMargin)
    ),
    QueryDef(
      // Free-text name parsing (reference 03 cell 16 — skipped there only
      // because the CUF arrives pre-parsed; Wagner & Layne p. 9 edit
      // list): synthesize a mixed-format free-text rendering per person
      // (courtesy prefixes, spelled-out vs abbreviated generational
      // suffixes, optional middle tokens), parse it back into
      // prefix/first/middle/last/suffix with the shared rule tables,
      // standardize the suffix (JUNIOR→JR, 2ND→II, …), and feed the
      // PARSED first name through q18's alternate-name expansion — one
      // 'orig' row plus one 'nick' row per nickname hit. Pure codegen'd
      // scalar work plus one broadcast join; PrepQueriesSpec pins the
      // namesearch win (parsed keys recover suffix-variant records that
      // exact full-name keys miss).
      "q137_name_parse",
      (s, d) => {
        val p = People.persons(s, d)
          .select("k", "first_name", "middle_name", "middle_initial", "last_name")
        val k = col("k")
        val full = when(pmod(k, lit(5)) === 0,
            concat_ws(" ", lit("MR."), col("first_name"), col("middle_name"),
              col("last_name"), lit("JR.")))
          .when(pmod(k, lit(5)) === 1,
            concat_ws(" ", col("first_name"), col("middle_initial"),
              col("last_name"), lit("SENIOR")))
          .when(pmod(k, lit(5)) === 2,
            concat_ws(" ", lit("DR"), col("first_name"), col("last_name"),
              lit("III")))
          .when(pmod(k, lit(5)) === 3,
            concat_ws(" ", col("first_name"), col("last_name")))
          .otherwise(concat_ws(" ", lit("MS"), col("first_name"),
            col("last_name"), lit("2ND")))
        val named = p.select(col("k"), full.as("full_name"))
        val base = named.select(
          col("k") +: col("full_name") +:
            Preprocess.parseName(col("full_name")).map { case (nm, c) => c.as(nm) }: _*)
        val nick = broadcast(
          s.createDataFrame(Preprocess.nicknames).toDF("name", "alt"))
        val orig = base
          .withColumn("name_variant", col("first_p"))
          .withColumn("variant_type", lit("orig"))
        val alts = base.join(nick, col("first_p") === col("name"))
          .select(base.columns.map(col) :+ col("alt").as("name_variant")
            :+ lit("nick").as("variant_type"): _*)
        orig.unionByName(alts)
      },
      Some {
        val fullSql =
          """CASE WHEN k % 5 = 0 THEN 'MR. ' || first_name || ' ' || middle_name || ' ' || last_name || ' JR.'
            |     WHEN k % 5 = 1 THEN first_name || ' ' || middle_initial || ' ' || last_name || ' SENIOR'
            |     WHEN k % 5 = 2 THEN 'DR ' || first_name || ' ' || last_name || ' III'
            |     WHEN k % 5 = 3 THEN first_name || ' ' || last_name
            |     ELSE 'MS ' || first_name || ' ' || last_name || ' 2ND' END""".stripMargin
        s"""$withPersons,
           |named AS (SELECT k, $fullSql AS full_name FROM persons),
           |${Preprocess.parseNameSqlCte("named")},
           |nick AS (SELECT * FROM (VALUES ${Preprocess.nicknamesSqlValues}) t(name, alt))
           |SELECT k, full_name, name_prefix, first_p, middle_p, last_p, suffix_std,
           |       first_p AS name_variant, 'orig' AS variant_type
           |FROM named_parsed
           |UNION ALL
           |SELECT k, full_name, name_prefix, first_p, middle_p, last_p, suffix_std,
           |       alt AS name_variant, 'nick' AS variant_type
           |FROM named_parsed JOIN nick ON first_p = nick.name""".stripMargin
      }
    )
  )
}
