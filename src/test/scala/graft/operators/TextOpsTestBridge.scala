package graft.operators

import org.apache.spark.sql.DataFrame

/** Test-only accessor for package-private TextOps internals. */
object TextOpsTestBridge {
  def shingleRows(d: DataFrame, k: Int): DataFrame = TextOps.shingleRows(d, k)
}
