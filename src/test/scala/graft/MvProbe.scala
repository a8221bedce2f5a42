package graft

import graft.queries.LinkageQueries
import org.apache.spark.sql.SparkSession

/** Dev harness: smoke the movers / zip3-adjacency / mafmatch modules at a
  * dir — planted-class recovery and precision.
  * Run: sbt -batch "Test/runMain graft.MvProbe /root/testdata/sf0.001"
  */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val byName = LinkageQueries.defs.map(d => d.name -> d).toMap
    Seq("q128_movers", "q129_zip3_adjacency", "q130_mafmatch").foreach { q =>
      val rows = byName(q).query(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      val wrong = rows.filter { case (pik, rec, _) => pik != rec }
      println(s"[mv] $q rows=${rows.length} wrong=${wrong.length} " +
        s"sample=${rows.take(8).toSeq}")
      if (wrong.nonEmpty) println(s"[mv] $q WRONG: ${wrong.take(10).toSeq}")
    }
    def hhOf(k: Long): Long = if (k % 200 < 20) k - k % 200 else k - k % 4
    val persons = graft.queries.People.persons(spark, dir)
      .select("k").collect().map(_.getLong(0))
    val mvPlanted = persons.filter(k => hhOf(k) % 52 == 0 &&
      hhOf(k) % 200 != 0 && (hhOf(k) / 52) % 2 == 1)
    val z3Planted = persons.filter(k => k % 61 == 0 && k % 29 != 0 && k % 19 != 0 &&
      !(hhOf(k) % 13 == 0 && hhOf(k) % 200 != 0) &&
      k % 23 != 0 && k % 37 != 0 && k % 41 != 0 && k % 47 != 0 &&
      k % 31 != 0 && k % 43 != 0 && k % 59 != 0 && k % 21 != 0 &&
      k % 17 != 0 && k % 200 >= 20)
    println(s"[mv] planted mv=${mvPlanted.toSeq} (covered: ${mvPlanted.count(_ % 5 != 4)})")
    println(s"[mv] planted z3=${z3Planted.toSeq} (covered: ${z3Planted.count(_ % 5 != 4)})")
    spark.stop()
  }
}
