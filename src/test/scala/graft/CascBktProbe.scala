package graft

import graft.linkage.LinkageCascade
import graft.queries.LinkageQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (not a test): measure what BUCKETED census/input sides buy
  * the pair-volume trio (q27/q28/q31 — the chain's 100× exponent lives
  * in the blocked-pair scoring over the em_zip3 demo blocking). Both
  * arms run the SAME pairs→score→aggregate pipeline; the bucketed arm
  * reads the sides back from tables bucketed on the block key, so its
  * join plans with no shuffle exchange (BucketedJoinSpec proves the
  * plan; this probe prices it). The one-time bucketed write is timed
  * separately — at a real deployment it amortizes over every pass and
  * every EM iteration that blocks on the key.
  *
  *   sbt "Test/runMain graft.CascBktProbe target/scaledata/x30"
  */
object CascBktProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaledata/x30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-casc-bkt-probe").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val pass = LinkageQueries.emPasses.head // blocks on zip3 — the demo/EM key
    val cfg = LinkageQueries.config
    def trioAgg(c: org.apache.spark.sql.DataFrame,
        i: org.apache.spark.sql.DataFrame): (Long, Double) = {
      // The trio's work shape: one blocking join + the full gamma/weight
      // scalar stack + a map-side-combining aggregate (q27 builds these
      // vectors, q28 sums weights, q31 iterates aggregates over them —
      // all linear in the blocked pairs this pipeline materializes).
      val scored = LinkageCascade.score(
        LinkageCascade.pairs(c, i, pass), pass.comparisonsFor(cfg))
      val r = scored.agg(count(lit(1)).as("n"),
        sum(col("match_weight").cast("decimal(30,18)")).cast("double").as("w"))
        .collect()(0)
      (r.getLong(0), r.getDouble(1))
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // Materialize the derived sides once so both arms price ONLY the
    // join+score pipeline, not the preprocessing chains.
    val census = LinkageQueries.census(spark, dir).cache()
    val input = LinkageQueries.input(spark, dir).cache()
    println(s"[cascbkt] $dir census=${census.count()} input=${input.count()}")

    for (round <- 1 to 2) {
      val ((n, w), sec) = time(trioAgg(census, input))
      println(f"[cascbkt] unbucketed round$round pairs=$n wsum=$w%.3f wall=$sec%.1fs")
    }

    val (_, wSec) = time {
      graft.sources.Sources.writeBucketed(census, "cascbkt_census",
        Seq("zip3"), cpus.toInt)
      graft.sources.Sources.writeBucketed(input, "cascbkt_input",
        Seq("zip3"), cpus.toInt)
    }
    println(f"[cascbkt] bucketed write (one-time, amortized) wall=$wSec%.1fs")
    try {
      val cb = spark.table("cascbkt_census")
      val ib = spark.table("cascbkt_input")
      for (round <- 1 to 2) {
        val ((n, w), sec) = time(trioAgg(cb, ib))
        println(f"[cascbkt] bucketed   round$round pairs=$n wsum=$w%.3f wall=$sec%.1fs")
      }
      val plan = LinkageCascade.score(
          LinkageCascade.pairs(cb, ib, pass), pass.comparisonsFor(cfg))
        .queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      println(s"[cascbkt] bucketed-plan hash exchanges=$exchanges")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cascbkt_census")
      spark.sql("DROP TABLE IF EXISTS cascbkt_input")
      ()
    }
    spark.stop()
  }
}
