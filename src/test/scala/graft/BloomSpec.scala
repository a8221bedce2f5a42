package graft

import graft.functions.{BloomImpl, GraftFunctions}
import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

class BloomSpec extends SparkTestBase {

  test("bloom filter has no false negatives under a distributed build") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // repartition(8) forces partial buffers + OR-merge across partitions.
    val keys = (1L to 2000L).toDF("k").repartition(8)
    val filt = keys
      .select(GraftFunctions.bloomBuild(xxhash64(col("k")), 1 << 14, 6).as("f"))
      .head.getAs[Array[Byte]](0)
    val missed = keys
      .filter(!GraftFunctions.bloomMightContain(lit(filt), xxhash64(col("k"))))
      .count()
    assert(missed == 0, s"$missed members rejected — false negatives are impossible by construction")
  }

  test("bloom false-positive rate stays near the sizing formula") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val members = (1L to 1000L).toDF("k")
    val filt = members
      .select(GraftFunctions.bloomBuild(xxhash64(col("k")), 1 << 14, 6).as("f"))
      .head.getAs[Array[Byte]](0)
    // 10k keys disjoint from the member range; fp ≈ (1-e^(-kn/m))^k ≈ 8e-4
    // at n=1000, m=16384, k=6. Allow a loose 1% ceiling.
    val fp = (1000001L to 1010000L).toDF("k")
      .filter(GraftFunctions.bloomMightContain(lit(filt), xxhash64(col("k"))))
      .count()
    assert(fp <= 100, s"false-positive count $fp out of bounds for the sizing")
  }

  test("probe expression agrees with the JVM helper bit-for-bit") {
    val words = new Array[Long](256)
    val keys = Seq(0L, -1L, Long.MinValue, Long.MaxValue, 42L, 123456789L)
    keys.foreach(BloomImpl.set(words, 256 * 64, 4, _))
    val bytes = BloomImpl.toBytes(words, 4)
    keys.foreach(k => assert(BloomImpl.mightContain(bytes, k), s"member $k rejected"))
  }

  test("q104 equals the exact no-bloom computation") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val passage = " shared benchmark passage alpha beta gamma delta epsilon zeta"
    val isBench = pmod(col("doc_id"), lit(97)) === 0
    val planted = concat(col("text"),
      when(isBench || pmod(col("doc_id"), lit(13)) === 0, lit(passage)).otherwise(lit("")))
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.operators.TextOps.wordShingles(planted, 5).as("grams"))
    val bench = sh.filter(isBench).select(explode(col("grams")).as("shingle")).distinct()
    val exact = sh.filter(!isBench)
      .select(col("doc_id"), explode(col("grams")).as("shingle"))
      .join(bench, Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val viaBloom = PipelineQueries.defs.find(_.name == "q104_bloom_prefilter").get
      .query(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(viaBloom.nonEmpty)
    assert(viaBloom.exists(_._3), "no contaminated docs found — planted passage missing?")
    viaBloom.foreach { case (doc, n, flag) =>
      val want = exact.getOrElse(doc, 0L)
      assert(n == want, s"doc $doc: bloom-path hits $n != exact $want")
      assert(flag == (want >= 1))
    }
  }
}
