package graft

import org.apache.spark.sql.SparkSession

/** Dev harness (not a test): attributes the reffile_chain /
  * reffile_accuracy warm cost to its stages and separates driver
  * planning from execution for the chain's consumers. Run:
  * sbt -batch "Test/runMain graft.RefChainProbe /root/testdata/sf0.1"
  */
object RefChainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-refchain-probe",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    graft.functions.GraftFunctions.register(spark)
    val steps = graft.queries.RefFileQueries.warmSteps
    steps.foreach { case (name, f) =>
      time(s"warm step $name")(f(spark, dir))
    }
    // Consumers after warm: planning vs execution split (queries read the
    // memoized cached frames; a slow count here on trivial data = driver
    // plan analysis over the deep cached lineage, the q120 lesson).
    Seq("q72_name_dob_reference", "q117_geobase_reference",
      "q119_pik_crosswalk", "q121_multi_simulant_piks").foreach { q =>
      SparkEntry.queries.get(q).foreach { fn =>
        val df = time(s"$q build+analyze")(fn(spark, dir))
        time(s"$q optimize")(df.queryExecution.executedPlan)
        time(s"$q execute")(
          df.write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
