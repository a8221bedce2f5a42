package graft

import graft.functions.GraftFunctions
import graft.linkage.LinkageCascade
import graft.queries.LinkageQueries
import org.apache.spark.sql.SparkSession

/** Dev harness: per-pass wall-clock of the cascade at a given sf dir, to
  * see where q32's time goes (cache build vs join vs checkpoint overhead).
  */
object CascadeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cfg = LinkageQueries.config
    val refs = LinkageQueries.cascadeRefs(spark, dir)
    val census = refs("census")
    val input = LinkageQueries.input(spark, dir).cache()
    t("census cache build")(census.count())
    t("input cache build")(input.count())
    t("namedob cache build")(refs("namedob").count())
    t("geobase cache build")(refs("geobase").count())

    var acc: Option[org.apache.spark.sql.DataFrame] = None
    var remaining = input
    for (pass <- cfg.passes) {
      val links = t(s"pass ${pass.name}") {
        LinkageCascade.predict(refs(pass.ref), remaining, pass, cfg)
          .withColumn("pass", org.apache.spark.sql.functions.lit(pass.name))
          .localCheckpoint()
      }
      acc = Some(acc.fold(links)(_.unionByName(links)))
      remaining = remaining.join(links.select("rec_id"), Seq("rec_id"), "left_anti")
    }
    val hhRef = t("hhcomp reference build") {
      LinkageCascade.hhcompReference(census, input, acc.get).localCheckpoint()
    }
    val rem = remaining.withColumn("hh_geokey", org.apache.spark.sql.functions.col("geokey_blk"))
    var hhRemaining = rem
    for (pass <- cfg.hhPasses) {
      val links = t(s"pass ${pass.name}") {
        LinkageCascade.predict(hhRef, hhRemaining, pass, cfg)
          .withColumn("pass", org.apache.spark.sql.functions.lit(pass.name))
          .localCheckpoint()
      }
      acc = Some(acc.get.unionByName(links))
      hhRemaining = hhRemaining.join(links.select("rec_id"), Seq("rec_id"), "left_anti")
    }
    t("final union count")(println("links: " + acc.get.count()))
    spark.stop()
  }
}
