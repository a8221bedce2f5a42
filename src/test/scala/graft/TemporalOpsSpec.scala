package graft

import graft.operators.TemporalOps
import org.apache.spark.sql.functions._

class TemporalOpsSpec extends SparkTestBase {

  test("asofJoin picks the most recent right row at or before each left time") {
    import spark.implicits._
    val left = Seq(
      ("u1", 10L, "l1"), ("u1", 20L, "l2"), ("u1", 5L, "l0"),
      ("u2", 7L, "l3")
    ).toDF("key", "t", "lpay")
    val right = Seq(
      ("u1", 10L, 1.0), ("u1", 15L, 2.0), ("u3", 1L, 9.0)
    ).toDF("key", "t", "rval")

    val out = TemporalOps.asofJoin(left, right, Seq("key"), "t", Seq("rval"))
      .select("key", "t", "lpay", "asof_t", "asof_rval")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSet

    assert(out === Set(
      ("u1", 10L, "l1", Some(10L), Some(1.0)), // inclusive at equal time
      ("u1", 20L, "l2", Some(15L), Some(2.0)), // most recent preceding
      ("u1", 5L, "l0", None, None),            // nothing precedes
      ("u2", 7L, "l3", None, None)             // key with no right rows
    ))
  }

  test("q62 as-of join returns rows and never exceeds left-side count") {
    val ev = Tables.events(spark, sfDir)
    val nClicks = ev.filter(col("event_type") === "click").count()
    val out = SparkEntry.queries("q62_asof_join")(spark, sfDir)
    assert(out.count() === nClicks)
  }
}
