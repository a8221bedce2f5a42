package graft

import graft.operators.Noise
import graft.queries.{People, RefFileQueries}
import org.apache.spark.sql.functions._

class NoiseSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val base = People.persons(spark, sfDir)
    .select("k", "first_name", "middle_initial", "last_name").cache()

  test("truncate: gated cells cut to length, others bit-identical, deterministic") {
    val out = Noise.truncateColumn(base, "last_name", "k", 0.4, 4, 2)
    val joined = base.select(col("k"), col("last_name").as("orig"))
      .join(out.select(col("k"), col("last_name").as("noised")), Seq("k"))
      .withColumn("gated", Noise.gate(col("k"), 0.4, 2))
      .collect()
    joined.foreach { r =>
      val (orig, noised, gated) = (r.getString(1), r.getString(2), r.getBoolean(3))
      if (gated) assert(noised == orig.take(4), s"k=${r.getLong(0)}")
      else assert(noised == orig, s"k=${r.getLong(0)} changed while ungated")
    }
    val n = joined.count(_.getBoolean(3))
    assert(n > joined.length * 0.3 && n < joined.length * 0.5,
      s"gate rate ${n.toDouble / joined.length} far from 0.4")
    val again = Noise.truncateColumn(base, "last_name", "k", 0.4, 4, 2)
      .select("k", "last_name").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    joined.foreach(r => assert(again(r.getLong(0)) == r.getString(2), "nondeterministic"))
  }

  test("shuffle: per-row value multiset preserved, ungated rows unchanged") {
    val cols = Seq("first_name", "middle_initial", "last_name")
    val out = Noise.shuffleColumns(base, cols, "k", 0.5, 3)
    val orig = base.collect()
      .map(r => r.getLong(0) -> Seq(r.getString(1), r.getString(2), r.getString(3))).toMap
    var changed = 0
    out.withColumn("gated", Noise.gate(col("k"), 0.5, 3)).collect().foreach { r =>
      val k = r.getLong(0)
      val now = Seq(r.getString(1), r.getString(2), r.getString(3))
      assert(now.sorted == orig(k).sorted, s"k=$k multiset changed: ${orig(k)} -> $now")
      if (!r.getBoolean(4)) assert(now == orig(k), s"k=$k shuffled while ungated")
      else if (now != orig(k)) changed += 1
    }
    assert(changed > 0, "no gated row actually permuted")
  }

  test("split: token multiset preserved over the joined name, empty parts null") {
    val cols = Seq("first_name", "middle_initial", "last_name")
    val out = Noise.splitColumnsIncorrectly(base, cols, "k", 1.0, 1)
    val orig = base.collect()
      .map(r => r.getLong(0) -> Seq(r.getString(1), r.getString(2), r.getString(3))).toMap
    out.collect().foreach { r =>
      val k = r.getLong(0)
      val now = Seq(r.getString(1), r.getString(2), r.getString(3))
      val origToks = orig(k).filter(_ != null).mkString(" ")
        .split("[ -]+").filter(_.nonEmpty).toSeq
      val nowToks = now.filter(_ != null).mkString(" ")
        .split("[ -]+").filter(_.nonEmpty).toSeq
      assert(nowToks == origToks, s"k=$k tokens changed: $origToks -> $nowToks")
      now.foreach(p => assert(p == null || p.nonEmpty, s"k=$k empty string part"))
    }
  }

  test("q74 runs, changes a bounded fraction of rows, keeps k unique") {
    val out = RefFileQueries.defs.find(_.name == "q74_noise_inject").get
      .query(spark, sfDir).cache()
    assert(out.select("k").distinct().count() == out.count())
    val joined = base.select(col("k"),
      concat_ws("|", col("first_name"), col("middle_initial"), col("last_name")).as("o"))
      .join(out.select(col("k"),
        concat_ws("|", col("first_name"), col("middle_initial"), col("last_name")).as("n")),
        Seq("k"))
    val changed = joined.filter(col("o") =!= col("n")).count().toDouble
    val total = joined.count().toDouble
    // ~40% truncation dominates; split/shuffle add ~1% each.
    assert(changed / total > 0.25 && changed / total < 0.55,
      s"changed fraction ${changed / total} out of expected band")
    out.unpersist()
  }

  test("typos: length preserved, every changed char QWERTY-adjacent, ungated identical") {
    import graft.functions.CharNoiseImpl.adjacency
    graft.functions.GraftFunctions.register(spark)
    val out = Noise.makeTypos(base, "first_name", "k", 0.5, 0.5, 101)
    val joined = base.select(col("k"), col("first_name").as("orig"))
      .join(out.select(col("k"), col("first_name").as("noised")), Seq("k"))
      .withColumn("gated", Noise.gate(col("k"), 0.5, 101))
      .collect()
    var changedChars = 0
    joined.foreach { r =>
      val (k, orig, noised, gated) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3))
      if (!gated) assert(noised == orig, s"k=$k changed while ungated")
      else {
        assert(noised.length == orig.length, s"k=$k length changed")
        orig.zip(noised).foreach { case (o, n) =>
          if (o != n) {
            changedChars += 1
            assert(adjacency.getOrElse(o, "").contains(n),
              s"k=$k '$o'->'$n' not QWERTY-adjacent")
          }
        }
      }
    }
    assert(changedChars > 0, "no character ever mutated")
  }

  test("wrong digits: gated digit chars become different digits, non-digits untouched") {
    graft.functions.GraftFunctions.register(spark)
    val nums = People.persons(spark, sfDir).select("k", "zipcode")
    val out = Noise.writeWrongDigits(nums, "zipcode", "k", 0.5, 0.5, 103)
    val joined = nums.select(col("k"), col("zipcode").as("orig"))
      .join(out.select(col("k"), col("zipcode").as("noised")), Seq("k"))
      .collect()
    var changed = 0
    joined.foreach { r =>
      val (k, orig, noised) = (r.getLong(0), r.getString(1), r.getString(2))
      assert(noised.length == orig.length, s"k=$k length changed")
      orig.zip(noised).foreach { case (o, n) =>
        if (o != n) {
          changed += 1
          assert(o.isDigit && n.isDigit && o != n, s"k=$k '$o'->'$n' invalid digit swap")
        }
      }
    }
    assert(changed > 0, "no digit ever mutated")
  }

  test("wrong option: gated cells change within the domain, omit drops near rate") {
    val src = People.persons(spark, sfDir).select("k", "state")
    val out = Noise.chooseWrongOption(src, "state", "k", People.states, 0.5, 201)
    val joined = src.select(col("k"), col("state").as("orig"))
      .join(out.select(col("k"), col("state").as("noised")), Seq("k"))
      .withColumn("gated", Noise.gate(col("k"), 0.5, 201))
      .collect()
    joined.foreach { r =>
      val (k, orig, noised, gated) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3))
      if (gated) {
        assert(noised != orig, s"k=$k gated cell kept its value")
        assert(People.states.contains(noised), s"k=$k '$noised' outside domain")
      } else assert(noised == orig, s"k=$k changed while ungated")
    }
    val total = src.count()
    val kept = Noise.omitRows(src, "k", 0.1, 203).count()
    val rate = 1.0 - kept.toDouble / total
    assert(rate > 0.05 && rate < 0.15, s"omit rate $rate far from 0.1")
  }

  test("noise config: default config equals the operator chain; alternate config obeys its own entries") {
    import graft.operators.Noise
    import graft.queries.People
    graft.functions.GraftFunctions.register(spark)
    val base = People.persons(spark, sfDir).select("k", "first_name",
      "last_name", "middle_initial", "street_num", "zipcode", "state",
      "dob_day", "dob_month", "dob_year")
    // Interpreting the default config is definitionally the hand-built
    // chain — identical rows (q77's oracle hash pins this end-to-end;
    // here the equality is checked frame-to-frame).
    val viaConfig = Noise.applyConfig(base, "k",
      graft.queries.RefFileQueries.veryNoisyConfig)
    val viaChain = {
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
    }
    assert(viaConfig.except(viaChain).count() == 0 &&
      viaChain.except(viaConfig).count() == 0,
      "config interpretation diverged from the hand-built chain")
    // An ALTERNATE config is just another value: different ops, rates and
    // seeds — untouched columns stay bit-identical to the input, touched
    // columns obey their own entries.
    val alt = Noise.applyConfig(base, "k", Seq(
      Noise.Truncate("last_name", 0.5, 4, 101),
      Noise.Blank("state", 0.10, 103)))
    val joined = alt.as("a").join(base.as("b"), col("a.k") === col("b.k"))
      .select(col("a.first_name").as("fn_a"), col("b.first_name").as("fn_b"),
        col("a.last_name").as("ln_a"), col("b.last_name").as("ln_b"),
        col("a.state").as("st_a"), col("a.dob_year").as("y_a"),
        col("b.dob_year").as("y_b"))
      .collect()
    assert(joined.length == base.count(), "alternate config dropped rows (no OmitRows entry)")
    joined.foreach { r =>
      assert(r.getAs[String]("fn_a") == r.getAs[String]("fn_b"),
        "alternate config touched first_name without an entry for it")
      assert(r.getAs[Int]("y_a") == r.getAs[Int]("y_b"),
        "alternate config touched dob_year without an entry for it")
      val (la, lb) = (r.getAs[String]("ln_a"), r.getAs[String]("ln_b"))
      assert(la == lb || (la.length == math.min(4, lb.length) && lb.startsWith(la)),
        s"truncate entry violated: $lb -> $la")
    }
    val nBlank = joined.count(_.getAs[String]("st_a") == null)
    assert(nBlank > 0 && nBlank < joined.length / 4,
      s"blank-state rate implausible for cell 0.10: $nBlank/${joined.length}")
  }

  test("q77 chain: dob day/month multiset kept, year within ±3, blanks near rate") {
    val persons = People.persons(spark, sfDir)
      .select("k", "dob_day", "dob_month", "dob_year", "middle_initial")
    val out = RefFileQueries.defs.find(_.name == "q77_pseudopeople_noise").get
      .query(spark, sfDir).cache()
    assert(out.select("k").distinct().count() == out.count())
    val joined = persons.select(col("k"), col("dob_day").as("od"),
        col("dob_month").as("om"), col("dob_year").as("oy"))
      .join(out.select(col("k"), col("dob_day"), col("dob_month"),
        col("dob_year"), col("middle_initial")), Seq("k"))
      .collect()
    var blanks = 0
    joined.foreach { r =>
      val k = r.getLong(0)
      def n(i: Int): Int = r.getAs[Number](i).intValue()
      assert(Set(n(1), n(2)) == Set(n(4), n(5)),
        s"k=$k day/month values lost in swap")
      assert(math.abs(n(6) - n(3)) <= 3, s"k=$k year shifted > 3")
      if (r.isNullAt(7)) blanks += 1
    }
    val blankRate = blanks.toDouble / joined.length
    // leave_blank 2% plus typo'd initials never null — band around 0.02.
    assert(blankRate > 0.005 && blankRate < 0.06,
      s"blank rate $blankRate far from 0.02")
    out.unpersist()
  }
}
