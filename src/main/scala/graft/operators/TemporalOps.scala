package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins. The backward as-of join ("most recent right row at or
  * before each left row's time, per key") is implemented merge-style: union
  * both sides, ONE window carry-forward per key, filter back to left rows.
  * No range join, no per-left-row scan of right — a single shuffle on the
  * key columns, which survives any scale the key cardinality allows.
  */
object TemporalOps {

  /** Backward (inclusive) as-of join, DuckDB `ASOF LEFT JOIN` semantics:
    * each left row picks the right row with the greatest time <= its own,
    * per key. Ties between right rows on (keys, timeCol) are resolved
    * arbitrarily — dedupe the right side first when that matters.
    *
    * @param payloadCols right-side columns to attach (prefixed `asof_`)
    * @return left rows + asof_<timeCol> + asof_<payload...> (nulls when no
    *         right row precedes)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String], timeCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val payload = struct((col(timeCol) +: payloadCols.map(col)).map(c => c): _*)
    // carry the whole left row as a struct so arbitrary left schemas survive
    val leftStruct = struct(left.columns.map(col): _*)
    val rT = right.select(
      keys.map(col) ++ Seq(col(timeCol).as("__t"), lit(0).as("__tag"), payload.as("__p")): _*)
    val lT = left.select(
      keys.map(col) ++ Seq(col(timeCol).as("__t"), lit(1).as("__tag"),
        lit(null).cast(rT.schema("__p").dataType).as("__p"),
        leftStruct.as("__lrow")): _*)
    val merged = rT.withColumn("__lrow",
      lit(null).cast(lT.schema("__lrow").dataType)).unionByName(lT)

    // tag 0 sorts before tag 1 at equal time → inclusive (<=) semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = merged.withColumn("__asof", last("__p", ignoreNulls = true).over(w))
    val leftCols = left.columns.map(c => col(s"__lrow.$c").as(c))
    val asofCols = (timeCol +: payloadCols).map(c => col(s"__asof.$c").as(s"asof_$c"))
    carried.filter(col("__tag") === 1).select(leftCols ++ asofCols: _*)
  }
}
