package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of cross-document boilerplate-span removal: which windows
  * count as boilerplate (doc frequency, not occurrence count), exact
  * reassembly order, and the all-boilerplate / short-doc edges. */
class BoilerplateSpec extends SparkSpec {

  // one 16-token "header" shared by three docs + per-doc unique tails
  private val header = (1 to 16).map(i => s"hdr$i").mkString(" ")
  private def uniq(d: Int) = (1 to 16).map(i => s"doc${d}w$i").mkString(" ")

  test("spans shared by more than maxDf docs are stripped, in-doc order kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$header ${uniq(1)}"),
      (2L, s"$header ${uniq(2)}"),
      (3L, s"$header ${uniq(3)}"),
      (4L, uniq(4))).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplateSpans(docs, "doc_id", "text", span = 16, maxDf = 2)
      .orderBy("id").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 2L, 2L, 1L), "span counts")
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 1L, 1L, 0L), "removals")
    assert(out.map(_.getString(3)).toSeq === Seq(uniq(1), uniq(2), uniq(3), uniq(4)),
      "cleaned text keeps only the unique tail, order intact")
  }

  test("a doc that is pure boilerplate survives as an empty row, not a dropped one") {
    import spark.implicits._
    val docs = Seq(
      (1L, header), (2L, header), (3L, header), (4L, s"$header ${uniq(4)}"))
      .toDF("doc_id", "text")
    val out = Dedup.stripBoilerplateSpans(docs, "doc_id", "text", span = 16, maxDf = 2)
      .orderBy("id").collect()
    assert(out.length === 4, "accounting stays total — no doc silently vanishes")
    assert(out.take(3).forall(_.getString(3) === ""), "pure-boilerplate docs empty out")
  }

  test("df counts documents, not occurrences: in-doc repetition is not boilerplate") {
    import spark.implicits._
    // the same span FIVE times in one doc, nowhere else: doc frequency 1
    val rep = Seq.fill(5)(header).mkString(" ")
    val docs = Seq((1L, rep), (2L, uniq(2)), (3L, uniq(3))).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplateSpans(docs, "doc_id", "text", span = 16, maxDf = 2)
      .orderBy("id").collect()
    assert(out(0).getLong(2) === 0L, "df=1 span must not be stripped")
    assert(out(0).getString(3) === rep)
  }

  test("maxDf = 0 is rejected (would strip every span)") {
    import spark.implicits._
    val docs = Seq((1L, header)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.stripBoilerplateSpans(docs, "doc_id", "text", span = 16, maxDf = 0)
    }
  }
}
