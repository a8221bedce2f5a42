package graft

import graft.operators.VectorOps
import graft.queries.PipelineQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: flat vs two-level assignment candidate stage at a dir —
  * wall time, candidate count, recall vs exact — sweeping coarseProbes.
  * Run: sbt -batch "Test/runMain graft.HierProbe target/scaledata/x10"
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaledata/x10")
    // Optional second arg: comma-separated label substrings — run only
    // the matching arms (a full sweep at 30× is ~20 min/arm-set).
    val armFilter = args.lift(1).map(_.split(",").map(_.trim).toSeq)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val e = PipelineQueries.embWithDups(spark, dir)
      .withColumn("nrm", VectorOps.norm(col("embedding"))).cache()
    e.count()
    val fine = PipelineQueries.ivfCentroids(e).cache(); fine.count()
    def candPairs(assign: DataFrame): DataFrame =
      assign.as("a").join(assign.as("b"),
          col("a.label") === col("b.label") && col("a.cid") === col("b.cid") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct()
    val ea = e.select(col("label"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val eb = e.select(col("label"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val exact = ea.join(eb, Seq("label")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos",
        VectorOps.dotFast(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.9 + 1e-6)
      .select("vec_a", "vec_b").cache()
    val nExact = exact.count()
    (Seq(3, 4, 5, 6).map(p => s"flat-p$p" ->
        (() => PipelineQueries.cellAssignments(e, fine, p))) ++
      Seq(2, 3, 4).map(cp => s"hier-cp$cp" ->
        (() => PipelineQueries.hierarchicalCellAssignments(e, fine, cp, 3))) ++
      Seq((2, 3), (3, 3), (4, 3), (4, 5), (6, 5), (8, 6), (8, 7), (8, 8),
          (4, 8), (6, 8))
        .map { case (cp, fp) =>
          s"trained-cp$cp-fp$fp" ->
            (() => PipelineQueries.trainedCellAssignments(e, fine, cp, fp))
        }
    ).filter { case (label, _) => armFilter.forall(_.exists(label.contains)) }
      .foreach { case (label, mk) =>
      val t0 = System.nanoTime()
      val cand = candPairs(mk()).cache()
      val n = cand.count()
      val t = (System.nanoTime() - t0) / 1e9
      val missed = exact.except(cand).count()
      println(f"[hier] $dir $label%-9s candidates=$n%8d missed=$missed%3d / $nExact $t%6.2f s")
      cand.unpersist()
    }
    spark.stop()
  }
}
