package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins `div` truncation-toward-zero on negatives — the engine relies on
  * it matching DuckDB's `//` (both C-style) in evt_dod_change. */
class DivSemanticsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.builder(master = "local[2]", shufflePartitions = 2).getOrCreate()
  test("div truncates toward zero like DuckDB's //") {
    val r = spark.sql("SELECT (-7) div 2 AS a, 7 div 2 AS b").collect().head
    assert(r.getLong(0) === -3L && r.getLong(1) === 3L)
  }
}
