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
}
