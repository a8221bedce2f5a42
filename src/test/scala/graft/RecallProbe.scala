package graft

import graft.operators.VectorOps
import graft.queries.PipelineQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev harness: candidate recall of the celled q51 scheme vs the exact
  * label-join pair set at a given dir, for probe counts 1..4 — quantifies
  * the probe-count lever when the 10× parity audit reports misses, and
  * whether triangle-inequality candidate pruning (bound via shared-cell
  * centroid sims) would pay. Measured at 10×: the bound prunes only
  * ~0.5% of candidates on this geometry — the synthetic vectors all sit
  * far from the centroids (cell sims cluster in a narrow band), so the
  * angle-difference bound almost never clears the threshold. That is why
  * the production q51/q123 DON'T carry the prune: on data with tight
  * clusters (real embedding corpora) it becomes worthwhile, and the
  * conservative-bound + exact-decimal-verify pattern keeps it hash-safe.
  * Run: sbt -batch "Test/runMain graft.RecallProbe target/scaledata/x10"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaledata/x10")
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
    val n = e.count()
    val seeds = PipelineQueries.ivfSeedIdsFor(n)
    println(s"[recall] n=$n derived_k=${seeds.size}")
    val ea = e.select(col("label"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val eb = e.select(col("label"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val exact = ea.join(eb, Seq("label")).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos",
        VectorOps.dotFast(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.9 + 1e-6)
      .select("vec_a", "vec_b").cache()
    val total = exact.count()

    // Same centroid arithmetic as the production query (id-stride pick).
    val stride = math.max(1L, n / math.max(16L, n / 128))
    val cents = e.filter(pmod(col("vec_id"), lit(stride)) === (3L % stride))
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    val byVec = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cid").asc)
    val ranked = e.select("vec_id", "label", "embedding", "nrm")
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"),
        (VectorOps.dotDecimal(col("embedding"), col("ce")) /
          (col("nrm") * col("cn"))).as("csim"), col("cid"))
      .withColumn("arnk", row_number().over(byVec))
      .filter(col("arnk") <= 4).cache()
    ranked.count()

    def sinc(c: org.apache.spark.sql.Column) =
      sqrt(greatest(lit(0.0), lit(1.0) - c * c))
    (1 to 4).foreach { p =>
      Seq(false, true).foreach { prune =>
        val t0 = System.nanoTime()
        val assign = ranked.filter(col("arnk") <= p)
          .select(col("vec_id"), col("label"), col("cid"),
            col("csim").cast("double").as("cs"))
        val bound = col("a.cs") * col("b.cs") + sinc(col("a.cs")) * sinc(col("b.cs"))
        val joinCond = col("a.label") === col("b.label") &&
          col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id") &&
          (if (prune) bound >= lit(0.9) - lit(1e-6) else lit(true))
        val cand = assign.as("a").join(assign.as("b"), joinCond)
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
          .distinct().cache()
        val nc = cand.count()
        val missed = exact.except(cand).count()
        println(f"[recall] probes=$p prune=$prune%-5s candidates=$nc%8d " +
          f"missed=$missed%4d / $total (${(System.nanoTime() - t0) / 1e9}%.1f s)")
        cand.unpersist()
      }
    }
    spark.stop()
  }
}
