package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for every (or selected) SparkEntry query
  * to plans/<tag>/<query>.txt — the round's plan-shape evidence. Not a
  * test: run with
  *   sbt "Test/runMain graft.PlanDump <tag> [suffix] [q129,q94,...]"
  * (args: output dir tag, filename suffix — e.g. "_before"/"_after" —
  * and an optional comma-separated query-prefix filter, in that order).
  * Uses the same GraftSession recipe as Bench so the dumped plan is the
  * plan the bench times (AQE initial plan; Exchange/join strategy/
  * PushedFilters are all visible pre-execution).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "r18"
    val suffix = if (args.length > 1) args(1) else ""
    val only = if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-plandump",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get(s"plans/$tag")
    Files.createDirectories(dir)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(dir.resolve(s"$name$suffix.txt"), plan)
          val nEx = "Exchange".r.findAllIn(plan).size
          System.err.println(f"[plandump] $name%-36s exchanges=$nEx")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
