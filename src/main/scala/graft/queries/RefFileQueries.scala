package graft.queries

import graft.QueryDef
import graft.operators.{Noise, Preprocess}
import graft.ops.{DfOps, Lineage}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.G — reference-file construction (the notebook-02 surface:
  * /root/reference/02_generate_case_study_files.ipynb). A two-era
  * "numident" derives deterministically from `persons` (era 0 clean
  * names, era 1 the messy name variants and a bumped DOB day for k%6),
  * then the lineage operators build the alternate-name file, the
  * name×DOB reference file (all combinations per SSN, each record
  * tracing to every source row that contributed), and the SSN→PIK
  * assignment — cells 62/66/70/114.
  *
  * Spark + DuckDB render from the same construction so the whole chain is
  * hash-verified: group-mins for dedupe ids, parent-id concatenation for
  * merge ids, windowed group mapping for pairings.
  */
object RefFileQueries {

  /** Two rows per person: the SSA-era clean record and a later filing with
    * the messy names (and a shifted DOB day for k%6 — alternate DOBs).
    */
  private def numident(s: SparkSession, d: String): DataFrame = {
    val p = People.persons(s, d)
    val era0 = p.select(
      concat(lit("num0_"), col("k")).as("record_id"),
      col("k").as("ssn"),
      col("first_name"), col("last_name"),
      col("dob_year"), col("dob_month"), col("dob_day"))
    // k%9==0 refiles under the unchanged clean name, so a real fraction of
    // (ssn, name) groups COLLAPSES in the alternate-name dedupe
    // (n_sources 2) rather than every era minting a new alternate.
    val era1 = p.select(
      concat(lit("num1_"), col("k")).as("record_id"),
      col("k").as("ssn"),
      when(pmod(col("k"), lit(9)) === 0, col("first_name"))
        .otherwise(col("messy_first")).as("first_name"),
      when(pmod(col("k"), lit(9)) === 0, col("last_name"))
        .otherwise(col("messy_last")).as("last_name"),
      col("dob_year"), col("dob_month"),
      when(pmod(col("k"), lit(6)) === 0, pmod(col("dob_day"), lit(28)) + 1)
        .otherwise(col("dob_day")).cast("int").as("dob_day"))
    era0.unionByName(era1)
  }

  private val numidentCte: String =
    s"""numident AS (
       |  SELECT 'num0_' || CAST(k AS VARCHAR) AS record_id, k AS ssn,
       |         first_name, last_name, dob_year, dob_month, dob_day
       |  FROM persons
       |  UNION ALL
       |  SELECT 'num1_' || CAST(k AS VARCHAR), k,
       |         CASE WHEN k % 9 = 0 THEN first_name ELSE messy_first END,
       |         CASE WHEN k % 9 = 0 THEN last_name ELSE messy_last END,
       |         dob_year, dob_month,
       |         CAST(CASE WHEN k % 6 = 0 THEN dob_day % 28 + 1 ELSE dob_day END AS INTEGER)
       |  FROM persons)""".stripMargin

  private val base = s"WITH ${People.personsCte},\n$numidentCte"

  /** The q72 construction as reusable pieces: (ndr frame, ndr pairs) via
    * the Lineage operators. q72 reports it directly; q117 merges it with
    * addresses into the GeoBase.
    */
  private def nameDobRef(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val n = numident(s, d)
    val init = Lineage.initPairs(n)
    val (altN, pN) = Lineage.dedupePreservingSourceRecords(
      n, init, Seq("ssn", "first_name", "last_name"), "altn")
    val (altD, pD) = Lineage.dedupePreservingSourceRecords(
      n.select("record_id", "ssn", "dob_year", "dob_month", "dob_day"),
      init, Seq("ssn", "dob_year", "dob_month", "dob_day"), "altd")
    Lineage.mergePreservingSourceRecords(altN, pN, altD, pD, Seq("ssn"), "ndr")
  }

  /** Addresses-by-SSN: one current-address filing per person (street
    * standardized the same way the linkage preprocessing does).
    */
  private def addresses(s: SparkSession, d: String): DataFrame =
    People.persons(s, d).select(
      concat(lit("addr_"), col("k")).as("record_id"),
      col("k").as("ssn"),
      col("street_num"),
      Preprocess.standardizeAddressPart(col("street_raw")).as("street_std"),
      col("city"), col("state"), col("zipcode"))

  private val addrCte: String =
    s"""addr AS (
       |  SELECT 'addr_' || CAST(k AS VARCHAR) AS record_id, k AS ssn,
       |         street_num,
       |         ${Preprocess.standardizeAddressPartSql("street_raw")} AS street_std,
       |         city, state, zipcode
       |  FROM persons)""".stripMargin

  /** The q72 oracle's CTE chain (altn/altd/ndr + the lineage maps),
    * shared verbatim by q117's oracle so the two files cannot drift.
    */
  private val ndrCtes: String =
    s"""altn AS (
       |  SELECT 'altn_' || min(record_id) AS record_id, ssn, first_name, last_name
       |  FROM numident GROUP BY ssn, first_name, last_name),
       |altd AS (
       |  SELECT 'altd_' || min(record_id) AS record_id, ssn, dob_year, dob_month, dob_day
       |  FROM numident GROUP BY ssn, dob_year, dob_month, dob_day),
       |ndr AS (
       |  SELECT 'ndr_' || an.record_id || '_' || coalesce(ad.record_id, 'na') AS record_id,
       |         an.ssn, an.first_name, an.last_name,
       |         ad.dob_year, ad.dob_month, ad.dob_day,
       |         an.record_id AS an_id, ad.record_id AS ad_id
       |  FROM altn an LEFT JOIN altd ad ON an.ssn = ad.ssn),
       |an_map AS (
       |  SELECT record_id AS src,
       |         'altn_' || min(record_id) OVER (PARTITION BY ssn, first_name, last_name) AS an_id
       |  FROM numident),
       |ad_map AS (
       |  SELECT record_id AS src,
       |         'altd_' || min(record_id) OVER (PARTITION BY ssn, dob_year, dob_month, dob_day) AS ad_id
       |  FROM numident),
       |ndr_pairs AS (
       |  SELECT r.record_id, m.src FROM ndr r JOIN an_map m ON r.an_id = m.an_id
       |  UNION
       |  SELECT r.record_id, m.src FROM ndr r JOIN ad_map m ON r.ad_id = m.ad_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      // Alternate-name file (cell 62): dedupe the numident on
      // (ssn, names), each output record carrying how many source rows
      // collapsed into it. One shuffle on the dedupe keys.
      "q71_alternate_names",
      (s, d) => {
        val n = numident(s, d)
        val (alt, pairs) = Lineage.dedupePreservingSourceRecords(
          n, Lineage.initPairs(n), Seq("ssn", "first_name", "last_name"), "altn")
        alt.join(
          pairs.groupBy("record_id")
            .agg(countDistinct("source_record_id").as("n_sources")),
          Seq("record_id"))
          .select("record_id", "ssn", "first_name", "last_name", "n_sources")
      },
      Some(s"""$base
              |SELECT 'altn_' || min(record_id) AS record_id, ssn,
              |       first_name, last_name,
              |       count(DISTINCT record_id) AS n_sources
              |FROM numident
              |GROUP BY ssn, first_name, last_name""".stripMargin)
    ),
    QueryDef(
      // Name×DOB reference file (cells 66/70): alternate names LEFT JOIN
      // alternate DOBs on ssn — every name/DOB combination per person,
      // with the merged record's sources = union of both parents'
      // sources. Joins on ssn only; lineage via two equi-joins + distinct.
      "q72_name_dob_reference",
      (s, d) => {
        val (ndr, pM) = nameDobRef(s, d)
        ndr.join(
          pM.groupBy("record_id")
            .agg(countDistinct("source_record_id").as("n_sources")),
          Seq("record_id"))
          .select("record_id", "ssn", "first_name", "last_name",
            "dob_year", "dob_month", "dob_day", "n_sources")
      },
      Some(s"""$base,
              |$ndrCtes,
              |counts AS (SELECT record_id, count(DISTINCT src) AS n_sources FROM ndr_pairs GROUP BY record_id)
              |SELECT r.record_id, r.ssn, r.first_name, r.last_name,
              |       r.dob_year, r.dob_month, r.dob_day, c.n_sources
              |FROM ndr r JOIN counts c ON r.record_id = c.record_id""".stripMargin)
    ),
    QueryDef(
      // SSN→PIK assignment (cell 114): distinct SSNs across the reference
      // files minted contiguous PIKs — range-partitioned id assignment,
      // no single-partition window.
      "q73_ssn_to_pik",
      (s, d) => {
        val ssns = numident(s, d).select("ssn").distinct()
        DfOps.addContiguousId(ssns, "ssn", "pik").select("ssn", "pik")
      },
      Some(s"""$base
              |SELECT ssn, row_number() OVER (ORDER BY ssn) - 1 AS pik
              |FROM (SELECT DISTINCT ssn FROM numident) t""".stripMargin)
    ),
    QueryDef(
      // The notebook-02 1040 noise chain (cells 24-26): wrong-boundary
      // name re-splits (1%), IRS last-name truncation to 4 chars (40%),
      // name-part shuffles (1%) — hash-gated instead of RNG-gated, so the
      // noise is reproducible under any partitioning and DuckDB renders
      // the identical transform.
      "q74_noise_inject",
      (s, d) => {
        val nameCols = Seq("first_name", "middle_initial", "last_name")
        val base = People.persons(s, d)
          .select("k", "first_name", "middle_initial", "last_name")
        val split = Noise.splitColumnsIncorrectly(base, nameCols, "k", 0.01, 1)
        val trunc = Noise.truncateColumn(split, "last_name", "k", 0.4, 4, 2)
        Noise.shuffleColumns(trunc, nameCols, "k", 0.01, 3)
      }, {
        val nameCols = Seq("first_name", "middle_initial", "last_name")
        val sp = Noise.splitColumnsIncorrectlySql(nameCols, "k", 0.01, 1)
        val tr = Noise.truncateColumnSql("last_name", "k", 0.4, 4, 2)
        val sh = Noise.shuffleColumnsSql(nameCols, "k", 0.01, 3)
        Some(s"""WITH ${People.personsCte},
                |split AS (
                |  SELECT k, ${sp("first_name")} AS first_name,
                |         ${sp("middle_initial")} AS middle_initial,
                |         ${sp("last_name")} AS last_name
                |  FROM persons),
                |trunc AS (
                |  SELECT k, first_name, middle_initial, $tr AS last_name
                |  FROM split)
                |SELECT k, ${sh("first_name")} AS first_name,
                |       ${sh("middle_initial")} AS middle_initial,
                |       ${sh("last_name")} AS last_name
                |FROM trunc""".stripMargin)
      }
    ),
    QueryDef(
      // best_data_from_columns (cell 60) as a hash-checked query: each
      // SSN keeps its best-dated filing — the era-1 refile normally wins,
      // but an invalid filing date (ssn%11) falls back to the least
      // likely date, so the era-0 record survives for those keys. One
      // window over the shuffle on ssn.
      "q86_best_data",
      (s, d) => {
        val n = numident(s, d).withColumn("filing_date",
          when(col("record_id").startsWith("num0_"), lit("20200101"))
            .when(pmod(col("ssn"), lit(11)) === 0, lit("not-a-date"))
            .otherwise(lit("20250101")))
        DfOps.bestDataFromColumns(n, Seq("ssn"), "filing_date")
      },
      Some(s"""$base,
              |dated AS (
              |  SELECT n.*, CASE WHEN record_id LIKE 'num0_%' THEN '20200101'
              |                   WHEN ssn % 11 = 0 THEN 'not-a-date'
              |                   ELSE '20250101' END AS filing_date
              |  FROM numident n),
              |ranked AS (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY ssn
              |             ORDER BY coalesce(try_strptime(filing_date, '%Y%m%d'),
              |                               TIMESTAMP '1900-01-01') DESC,
              |                      record_id DESC) AS rn
              |  FROM dated)
              |SELECT record_id, ssn, first_name, last_name, dob_year, dob_month, dob_day, filing_date
              |FROM ranked WHERE rn = 1""".stripMargin)
    ),
    QueryDef(
      // The notebook-01 pseudopeople column-noise surface at the
      // reference's very_noisy settings (cell 16): make_typos on name
      // columns (cell 0.1, token 0.1; middle initials cell 0.05, token 1),
      // write_wrong_digits on number columns (cell 0.1, token 0.1), plus
      // swap_month_and_day, misreport-age-style year shifts, and
      // leave_blank. Character-level noise runs as a codegen'd Catalyst
      // expression; DuckDB mirrors it with list_transform over the same
      // hash arithmetic, so the oracle hash-verifies every character.
      "q77_pseudopeople_noise",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val base = People.persons(s, d).select("k", "first_name", "last_name",
          "middle_initial", "street_num", "zipcode", "state",
          "dob_day", "dob_month", "dob_year")
        val t1 = Noise.makeTypos(base, "first_name", "k", 0.10, 0.10, 11)
        val t2 = Noise.makeTypos(t1, "last_name", "k", 0.10, 0.10, 13)
        val t3 = Noise.makeTypos(t2, "middle_initial", "k", 0.05, 1.0, 15)
        val t4 = Noise.writeWrongDigits(t3, "street_num", "k", 0.10, 0.10, 17)
        val t5 = Noise.writeWrongDigits(t4, "zipcode", "k", 0.10, 0.10, 19)
        val t6 = Noise.swapColumns(t5, "dob_day", "dob_month", "k", 0.02, 21)
        val t7 = Noise.perturbInt(t6, "dob_year", "k", 0.01,
          Seq(-3, -2, -1, 1, 2, 3), 23)
        val t8 = Noise.leaveBlank(t7, "middle_initial", "k", 0.02, 25)
        val t9 = Noise.chooseWrongOption(t8, "state", "k", People.states, 0.03, 27)
        Noise.omitRows(t9, "k", 0.01, 29)
      }, {
        val sw = Noise.swapColumnsSql("dob_day", "dob_month", "k", 0.02, 21)
        Some(s"""WITH ${People.personsCte},
                |noised AS (
                |  SELECT k,
                |         ${Noise.makeTyposSql("first_name", "k", 0.10, 0.10, 11)} AS first_name,
                |         ${Noise.makeTyposSql("last_name", "k", 0.10, 0.10, 13)} AS last_name,
                |         ${Noise.makeTyposSql("middle_initial", "k", 0.05, 1.0, 15)} AS middle_initial,
                |         ${Noise.writeWrongDigitsSql("street_num", "k", 0.10, 0.10, 17)} AS street_num,
                |         ${Noise.writeWrongDigitsSql("zipcode", "k", 0.10, 0.10, 19)} AS zipcode,
                |         ${Noise.chooseWrongOptionSql("state", "k", People.states, 0.03, 27)} AS state,
                |         ${sw("dob_day")} AS dob_day,
                |         ${sw("dob_month")} AS dob_month,
                |         ${Noise.perturbIntSql("dob_year", "k", 0.01, Seq(-3, -2, -1, 1, 2, 3), 23)} AS dob_year
                |  FROM persons)
                |SELECT k, first_name, last_name,
                |       ${Noise.leaveBlankSql("middle_initial", "k", 0.02, 25)} AS middle_initial,
                |       street_num, zipcode, state, dob_day, dob_month, dob_year
                |FROM noised
                |WHERE ${Noise.omitRowsSql("k", 0.01, 29)}""".stripMargin)
      }
    ),
    QueryDef(
      // The GeoBase reference file build (reference 02 cell 84): the
      // name×DOB reference merged with addresses-by-SSN on ssn via the
      // same lineage-preserving merge — every GeoBase record traces to the
      // numident filings AND the address filing that produced it
      // (n_sources = the union). One equi-join on ssn over the q72 chain;
      // at scale each step is a shuffle on its key, nothing driver-side.
      "q117_geobase_reference",
      (s, d) => {
        val (ndr, pM) = nameDobRef(s, d)
        val addr = addresses(s, d)
        val (geob, pG) = Lineage.mergePreservingSourceRecords(
          ndr, pM, addr, Lineage.initPairs(addr), Seq("ssn"), "geo")
        geob.join(
          pG.groupBy("record_id")
            .agg(countDistinct("source_record_id").as("n_sources")),
          Seq("record_id"))
          .select("record_id", "ssn", "first_name", "last_name",
            "dob_year", "dob_month", "dob_day",
            "street_num", "street_std", "city", "state", "zipcode", "n_sources")
      },
      Some(s"""$base,
              |$ndrCtes,
              |$addrCte,
              |geob AS (
              |  SELECT 'geo_' || r.record_id || '_' || coalesce(a.record_id, 'na') AS record_id,
              |         r.ssn, r.first_name, r.last_name,
              |         r.dob_year, r.dob_month, r.dob_day,
              |         a.street_num, a.street_std, a.city, a.state, a.zipcode,
              |         r.record_id AS ndr_id, a.record_id AS addr_id
              |  FROM ndr r LEFT JOIN addr a ON r.ssn = a.ssn),
              |gpairs AS (
              |  SELECT g.record_id, p.src FROM geob g JOIN ndr_pairs p ON g.ndr_id = p.record_id
              |  UNION
              |  SELECT g.record_id, g.addr_id AS src FROM geob g WHERE g.addr_id IS NOT NULL),
              |gcounts AS (SELECT record_id, count(DISTINCT src) AS n_sources FROM gpairs GROUP BY record_id)
              |SELECT g.record_id, g.ssn, g.first_name, g.last_name,
              |       g.dob_year, g.dob_month, g.dob_day,
              |       g.street_num, g.street_std, g.city, g.state, g.zipcode, c.n_sources
              |FROM geob g JOIN gcounts c ON g.record_id = c.record_id""".stripMargin)
    ),
    QueryDef(
      // ITIN incorporation (reference 02 cells 72-75): people WITHOUT an
      // SSN (the k%5=4 slice the census reference never covers) who filed
      // taxes get an ITIN-range identifier (9 + the filing key), and their
      // IDENTITY DATA comes from the 1040 filing — which carries the IRS
      // noise chain, including the 4-char last-name truncation (q74's
      // machinery; the reference notes ITIN PIKing is exactly where the
      // truncation bites). The combined SSN ∪ ITIN identifier set mints
      // contiguous PIKs the q73 way (range-partitioned, no global window).
      "q118_itin_incorporation",
      (s, d) => {
        val nameCols = Seq("first_name", "middle_initial", "last_name")
        val p = People.persons(s, d)
        val ssa = p.filter(pmod(col("k"), lit(5)) =!= 4)
          .select(col("k").as("id"), lit("ssn").as("id_type"),
            col("first_name"), col("middle_initial"), col("last_name"))
        val filers = p.filter(pmod(col("k"), lit(5)) === 4 && pmod(col("k"), lit(3)) === 0)
          .select("k", "first_name", "middle_initial", "last_name")
        val split = Noise.splitColumnsIncorrectly(filers, nameCols, "k", 0.01, 1)
        val trunc = Noise.truncateColumn(split, "last_name", "k", 0.4, 4, 2)
        val noised = Noise.shuffleColumns(trunc, nameCols, "k", 0.01, 3)
        val itin = noised.select(
          (lit(900000000L) + col("k")).as("id"), lit("itin").as("id_type"),
          col("first_name"), col("middle_initial"), col("last_name"))
        val ids = ssa.unionByName(itin)
        DfOps.addContiguousId(ids, "id", "pik")
          .select("pik", "id", "id_type", "first_name", "middle_initial", "last_name")
      }, {
        val nameCols = Seq("first_name", "middle_initial", "last_name")
        val sp = Noise.splitColumnsIncorrectlySql(nameCols, "k", 0.01, 1)
        val tr = Noise.truncateColumnSql("last_name", "k", 0.4, 4, 2)
        val sh = Noise.shuffleColumnsSql(nameCols, "k", 0.01, 3)
        Some(s"""WITH ${People.personsCte},
                |ssa AS (
                |  SELECT k AS id, 'ssn' AS id_type, first_name, middle_initial, last_name
                |  FROM persons WHERE k % 5 <> 4),
                |split AS (
                |  SELECT k, ${sp("first_name")} AS first_name,
                |         ${sp("middle_initial")} AS middle_initial,
                |         ${sp("last_name")} AS last_name
                |  FROM persons WHERE k % 5 = 4 AND k % 3 = 0),
                |trunc AS (
                |  SELECT k, first_name, middle_initial, $tr AS last_name
                |  FROM split),
                |itin AS (
                |  SELECT 900000000 + k AS id, 'itin' AS id_type,
                |         ${sh("first_name")} AS first_name,
                |         ${sh("middle_initial")} AS middle_initial,
                |         ${sh("last_name")} AS last_name
                |  FROM trunc),
                |allids AS (
                |  SELECT * FROM ssa UNION ALL SELECT * FROM itin)
                |SELECT row_number() OVER (ORDER BY id) - 1 AS pik, id, id_type,
                |       first_name, middle_initial, last_name
                |FROM allids""".stripMargin)
      }
    )
  )
}
