package graft

import graft.queries.PipelineQueries
import graft.operators.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (not a test): decompose q149/q152's retrieval recall into
  * its three stacked approximations — derived-probe IVF candidates, ADC
  * shortlist (codebook size × shortlist depth × ranking key), exact
  * rerank — by measuring recall@5 against the brute-force truth for
  * each knob setting at a given dir. Probe-grade double arithmetic
  * (recall measurement only; the production queries keep the decimal
  * cross-engine contract). Run:
  *   sbt "Test/runMain graft.RetrProbe /root/testdata/sf0.1"
  */
object RetrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-retr-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._

    val qids = PipelineQueries.KnnQueryIds
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", VectorOps.norm(col("embedding")))
      .withColumn("label", lit("x"))
      .cache()
    val n = e.count()
    println(s"[retr] $dir n=$n")

    val q = e.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val byQ = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
    val truth = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos",
        VectorOps.dotFast(col("embedding"), col("qe")) / (col("nrm") * col("qn")))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= 5)
      .select("qid", "vec_id").cache()
    truth.count()

    // Derived-probe IVF candidates (the production geometry).
    val cents = PipelineQueries.ivfCentroids(e).cache()
    val k = cents.count()
    val assign = PipelineQueries.cellAssignments(e, cents, 1).cache()
    assign.count()
    println(s"[retr] k=$k")
    // Candidate ceiling as a function of the QUERY-side probe count
    // (data side stays home-cell arnk=1 — standard IVF search).
    def candFor(p: Int): DataFrame = {
      val qprobe = PipelineQueries.cellAssignments(
        e.filter(col("vec_id").isin(qids: _*)), cents, p)
        .select(col("vec_id").as("qid"), col("cid"))
      assign.select(col("vec_id"), col("cid"))
        .join(qprobe, Seq("cid"))
        .filter(col("vec_id") =!= col("qid"))
        .select("qid", "vec_id").distinct()
    }
    // `assign` above is the derived-probe frame used as the DATA side;
    // restrict to home cell for the standard search shape.
    for (p <- Seq(3, 4, 6, 8, 10, 16)) {
      val c = candFor(p).cache()
      val nc = c.count()
      val hit = truth.join(c, Seq("qid", "vec_id")).count()
      println(f"[retr] qprobes=$p%-3d candidates=$nc%7d ceiling=${hit / (qids.size * 5.0)}%.4f")
      c.unpersist()
    }

    def recallFor2(cand: DataFrame, pqK: Int, short: Int): Double = {
      val pqM = 8
      val subDim = VectorOps.Dim / pqM
      val params = e.agg(count(lit(1)).as("n")).select(
        greatest(lit(1L), (col("n") / lit(pqK)).cast("long")).as("cstride"))
      val train = e.crossJoin(broadcast(params))
        .filter(pmod(col("vec_id"), col("cstride")) === pmod(lit(5L), col("cstride")))
        .withColumn("kk", row_number().over(Window.orderBy(col("vec_id").asc)))
        .filter(col("kk") <= pqK)
      val subStructs = (frame: org.apache.spark.sql.Column) =>
        array((0 until pqM).map(m =>
          struct(lit(m).as("m"), slice(frame, m * subDim + 1, subDim).as("sv"))): _*)
      val cb = train
        .select(col("kk"), explode(subStructs(col("embedding"))).as("mc"))
        .select(col("kk"), col("mc.m").as("m"), col("mc.sv").as("cw"))
      val codes = e
        .select(col("vec_id"), explode(subStructs(col("embedding"))).as("ms"))
        .select(col("vec_id"), col("ms.m").as("m"), col("ms.sv").as("sv"))
        .join(broadcast(cb), Seq("m"))
        .select(col("vec_id"), col("m"), col("kk"),
          VectorOps.dist2Decimal(col("sv"), col("cw")).as("d2"))
        .groupBy("vec_id", "m")
        .agg(min(struct(col("d2"), col("kk"))).as("mk"))
        .select(col("vec_id"), col("m"), col("mk.kk").as("kk"))
      val qlut = e.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("qid"), explode(subStructs(col("embedding"))).as("qs"))
        .select(col("qid"), col("qs.m").as("m"), col("qs.sv").as("qsv"))
        .join(broadcast(cb), Seq("m"))
        .select(col("qid"), col("m"), col("kk"),
          VectorOps.dotFast(col("qsv"), col("cw")).as("pdot"))
      val nrms = e.select(col("vec_id"), col("nrm"))
      val adc0 = cand.join(codes, Seq("vec_id"))
        .join(broadcast(qlut), Seq("qid", "m", "kk"))
        .groupBy("qid", "vec_id")
        .agg(sum(col("pdot")).as("adot"))
        .join(nrms, Seq("vec_id"))
      val byAdc = Window.partitionBy("qid").orderBy(col("adot").desc, col("vec_id").asc)
      val shortl = adc0.withColumn("srnk", row_number().over(byAdc))
        .filter(col("srnk") <= short)
        .select("qid", "vec_id")
      val rer = shortl
        .join(e.select("vec_id", "embedding", "nrm"), Seq("vec_id"))
        .join(broadcast(q), Seq("qid"))
        .withColumn("cos",
          VectorOps.dotFast(col("embedding"), col("qe")) / (col("nrm") * col("qn")))
        .withColumn("rnk", row_number().over(byQ))
        .filter(col("rnk") <= 5)
        .select("qid", "vec_id")
      truth.join(rer, Seq("qid", "vec_id")).count() / (qids.size * 5.0)
    }

    // Derived-probe settings: p = the dedup derivedProbes rule, shortlist
    // = 40*p (8*topk*probes — a stable fraction of the ~occupancy*p
    // candidate volume at every decade). Candidates come from the
    // PRODUCTION assignment (productionAssignmentsRanked — flat below
    // LadderK, trained ladder above), so the derived point measures the
    // geometry the queries actually run at this dir.
    val pDer = PipelineQueries.derivedProbesFor(k)
    val ranked = PipelineQueries.productionAssignmentsRanked(e, cents).cache()
    val cDer = ranked.filter(col("arnk") === 1)
      .select(col("vec_id"), col("cid"))
      .join(ranked
        .filter(col("vec_id").isin(qids: _*) && col("arnk") <= col("probes"))
        .select(col("vec_id").as("qid"), col("cid")), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select("qid", "vec_id").distinct().cache()
    val nDer = cDer.count()
    val hitDer = truth.join(cDer, Seq("qid", "vec_id")).count()
    val ceil = hitDer / (qids.size * 5.0)
    println(f"[retr] derived p=$pDer candidates=$nDer ceiling=$ceil%.4f")
    for (short <- Seq(8, 40 * pDer, 80 * pDer)) {
      val r = recallFor2(cDer, 8, short)
      println(f"[retr] p=$pDer short=$short%-4d recall@5=$r%.4f ratio=${r / ceil}%.4f")
    }
    // PQ codebook WIDTH arm (task: the dial a deployment turns first):
    // same candidates, same derived shortlist, K swept to the
    // production FAISS PQ8 width (K=256, 1 byte/subspace). Encode cost
    // is n·K·M·SubDim — linear in n at any K — so the tradeoff is
    // code-width bytes vs recall, measured here.
    for (pqK <- Seq(8, 64, 256)) {
      val t0 = System.nanoTime()
      val r = recallFor2(cDer, pqK, 40 * pDer)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[retr] pqK=$pqK%-4d short=${40 * pDer} recall@5=$r%.4f " +
        f"ratio=${r / ceil}%.4f wall=$sec%.1fs")
    }
    spark.stop()
  }
}
