package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose q134's scale exponent into its stages — fingerprint
  * rows, same-hash candidate pairs, verified gram matches — at the base dir
  * and a scaled dir, so a high wall-clock exponent can be attributed to
  * candidate GROWTH (a design smell) or to linear-volume shuffle/spill (a
  * one-box artifact). Usage: Test/runMain graft.WinnowProbe [x30|x100]
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val scaled = s"target/scaledata/${args.headOption.getOrElse("x100")}"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
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
    Seq("/root/testdata/sf0.1", scaled).foreach { dir =>
      val docs = Tables.documents(spark, dir).select(col("doc_id"),
        concat(col("text"), PipelineQueries.winnowQuote(col("doc_id"))).as("text2"))
      val fp = PipelineQueries.winnowFingerprints(docs, "text2").cache()
      val nFp = fp.count()
      val t0 = System.nanoTime()
      val cand = fp.as("a").join(fp.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .count()
      val tCand = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val verDf = PipelineQueries.winnowVerifiedGrams(docs)
        .select("doc_a", "doc_b").cache()
      val ver = verDf.count()
      val tVer = (System.nanoTime() - t1) / 1e9
      // Same-copy vs cross-copy split (ScaleBench's documents stride):
      // cross-copy matches can only be the planted quote re-colliding
      // across replicas; within-copy matches are the base corpus's own
      // repeated passages scaled linearly.
      val nBase = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").count()
      val stride = ((nBase + 300000L + 199L) / 200L) * 200L
      val cross = verDf
        .filter((col("doc_a") / stride).cast("long") =!=
          (col("doc_b") / stride).cast("long")).count()
      println(f"[winnow] $dir fp=$nFp cand=$cand (${tCand}%.1f s) " +
        f"verified=$ver (${tVer}%.1f s) crossCopy=$cross withinCopy=${ver - cross}")
      verDf.unpersist(); fp.unpersist()
    }
    spark.stop()
  }
}
