package graft

import graft.functions.GraftFunctions
import graft.operators.VectorOps
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkTestBase {

  test("native vec_dot_decimal agrees bitwise with the declarative fold") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id"))
      .limit(500)
    val diff = pairs
      .select(
        VectorOps.dotDecimal(col("a"), col("b")).as("native"),
        VectorOps.dotDecimalFold(col("a"), col("b")).as("fold"))
      .filter(col("native") =!= col("fold"))
      .count()
    assert(diff == 0, s"$diff pairs differ between native and fold dot product")
  }

  test("vec_dot_decimal stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val df = e.select(VectorOps.dotDecimal(col("embedding"), col("embedding")).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("vec_dot_decimal")).getOrElse("")
    assert(line.contains("*("), s"vec_dot_decimal not codegen'd:\n$plan")
  }

  test("hyperplanes are deterministic and roughly zero-centered") {
    val hp = VectorOps.hyperplane(3)
    assert(hp == VectorOps.hyperplane(3))
    assert(hp.size == VectorOps.Dim)
    assert(math.abs(hp.sum / hp.size) < 0.2)
  }
}
