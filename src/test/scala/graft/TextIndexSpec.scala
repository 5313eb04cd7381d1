package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextIndex

/** The positional inverted index (`operators/TextIndex`): postings are
  * exact 0-based token ordinals, and the phrase leg-join counts exactly
  * the sliding-window occurrences — repeated phrases, self-overlapping
  * patterns, absent phrases, and the single-term degenerate case. */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark =
    GraftSession.builder(master = "local[2]", shufflePartitions = 2).getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def hits(d: org.apache.spark.sql.DataFrame, phrase: String*): Map[Long, Long] =
    TextIndex
      .phraseSearch(TextIndex.buildPostings(d, "doc_id", "text"), phrase)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits"))
      .toMap

  test("postings carry exact 0-based positions") {
    val p = TextIndex.buildPostings(docs(1L -> "a b a"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getInt(2))).toSet
    assert(p === Set(("a", 0), ("b", 1), ("a", 2)))
  }

  test("phrase occurrences: repeats counted, absent phrases empty, cross-doc isolation") {
    val d = docs(
      1L -> "x small query line y small query line",
      2L -> "small query line",
      3L -> "query line small", // the terms, wrong order — no match
      4L -> "small line query") // wrong order again
    assert(hits(d, "small", "query", "line") === Map(1L -> 2L, 2L -> 1L))
    assert(hits(d, "never", "present") === Map.empty)
  }

  test("self-overlapping phrase counts every start position") {
    // "a a a a" contains "a a" starting at 0, 1, 2
    assert(hits(docs(7L -> "a a a a"), "a", "a") === Map(7L -> 3L))
  }

  test("single-term phrase degenerates to the term's occurrence count") {
    assert(hits(docs(1L -> "b a b b"), "b") === Map(1L -> 3L))
  }
}
