package graft

import graft.functions.GraftFunctions
import graft.queries.{People, StringQueries}
import org.apache.spark.sql.functions._

class StringQueriesSpec extends SparkTestBase {

  test("every string query runs and returns rows") {
    StringQueries.defs.foreach { qd =>
      val df = qd.query(spark, sfDir)
      assert(df.count() > 0, s"${qd.name} returned no rows")
    }
  }

  test("jw of identical names is 1.0 and typo'd names score high") {
    val df = StringQueries.defs.find(_.name == "q21_jaro_winkler").get.query(spark, sfDir)
    val untouched = df.filter(pmod(col("k"), lit(4)) === 3)
    assert(untouched.filter(col("jw_first") =!= 1.0).count() == 0)
    val typod = df.filter(pmod(col("k"), lit(4)) =!= 3)
    val minJw = typod.agg(min("jw_first")).head().getDouble(0)
    assert(minJw > 0.5, s"typo'd JW unexpectedly low: $minJw")
  }

  test("jaro_winkler is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val v = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw").head().getDouble(0)
    assert(v == 0.9611111111111111)
    val ny = spark.sql("SELECT nysiis('KNIGHT') AS ny").head().getString(0)
    assert(ny == "NAGT")
  }

  test("jw expression stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = StringQueries.defs.find(_.name == "q21_jaro_winkler").get.query(spark, sfDir)
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage; the
    // jaro_winkler projection must carry one (i.e. not fall back to eval).
    val plan = df.queryExecution.executedPlan.toString
    val jwLine = plan.linesIterator.find(_.contains("jaro_winkler")).getOrElse("")
    assert(jwLine.contains("*("), s"jaro_winkler not codegen'd:\n$plan")
  }

  test("ngram jaccard: identical=1, disjoint=0, bounds hold") {
    import GraftFunctions._
    val df = spark.range(1).select(
      ngramJaccard(lit("HELLO"), lit("HELLO"), 3).as("same"),
      ngramJaccard(lit("ABCDEF"), lit("XYZUVW"), 3).as("disjoint"),
      ngramJaccard(lit("AB"), lit("CD"), 3).as("short"))
    val r = df.head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(2) == 0.0)
  }

  test("people synthesis is deterministic across invocations") {
    val a = People.people(spark, sfDir).orderBy("k").collect()
    val b = People.people(spark, sfDir).orderBy("k").collect()
    assert(a.sameElements(b))
  }
}
