package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions=graft.GraftExtensions` — injects graft's native
  * functions into every session built on a cluster, the idiomatic way to
  * ship custom expressions without touching application code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.inject(ext)
}
