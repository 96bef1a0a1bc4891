package graft.operators

import graft.SparkSpec

class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"k", $"version")
      .collect()
      .map(r => (r.getString(r.fieldIndex("k")), r.getLong(r.fieldIndex("version")),
        r.getString(r.fieldIndex("v")), r.getLong(r.fieldIndex("valid_from")),
        Option(r.get(r.fieldIndex("valid_to"))).map(_.asInstanceOf[Long]),
        r.getLong(r.fieldIndex("n_rows"))))
      .toSeq

  test("scd2 collapses consecutive runs with exclusive upper bounds") {
    val df = Seq(
      ("a", 1L, "open"), ("a", 2L, "open"), ("a", 3L, "closed"),
      ("a", 4L, "open"), // same value as run 1 but NOT consecutive — new run
      ("b", 1L, "open"))
      .toDF("k", "t", "v")
    assert(rows(History.scd2(df, "k", "v", Seq("t"))) == Seq(
      ("a", 1L, "open", 1L, Some(3L), 2L),
      ("a", 2L, "closed", 3L, Some(4L), 1L),
      ("a", 3L, "open", 4L, None, 1L),
      ("b", 1L, "open", 1L, None, 1L)))
  }

  test("scd2: a never-changing key yields one open-ended version") {
    val df = Seq(("a", 1L, "x"), ("a", 2L, "x"), ("a", 3L, "x")).toDF("k", "t", "v")
    assert(rows(History.scd2(df, "k", "v", Seq("t"))) ==
      Seq(("a", 1L, "x", 1L, None, 3L)))
  }

  test("scd2 sequences ties through the secondary order column") {
    // two events at the same t: the id column breaks the tie, so the run
    // structure is deterministic (id 1 "x" precedes id 2 "y")
    val df = Seq(("a", 1L, 2L, "y"), ("a", 1L, 1L, "x"))
      .toDF("k", "t", "id", "v")
    assert(rows(History.scd2(df, "k", "v", Seq("t", "id"))) == Seq(
      ("a", 1L, "x", 1L, Some(1L), 1L),
      ("a", 2L, "y", 1L, None, 1L)))
  }

  test("scd2 treats null values as a distinct state with null-safe run detection") {
    // x → null → null → x: four rows, THREE runs (the null stretch is one
    // run of its own — neither absorbed into the "x" before it, nor split
    // into per-row runs)
    val df = Seq(
      ("a", 1L, Some("x")), ("a", 2L, None), ("a", 3L, None), ("a", 4L, Some("x")))
      .toDF("k", "t", "v")
    val got = History.scd2(df, "k", "v", Seq("t"))
      .orderBy($"version")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("version")),
        Option(r.getString(r.fieldIndex("v"))),
        r.getLong(r.fieldIndex("n_rows"))))
      .toSeq
    assert(got == Seq((1L, Some("x"), 1L), (2L, None, 2L), (3L, Some("x"), 1L)))
  }

  test("scd2 on an empty input returns an empty history") {
    val df = Seq.empty[(String, Long, String)].toDF("k", "t", "v")
    assert(History.scd2(df, "k", "v", Seq("t")).count() == 0)
  }

  test("scd2 fails loudly on a null sequencing value") {
    // nulls sort FIRST under ascending order while min() skips them — a
    // silent run would report a later valid_from than its actual start,
    // so the operator must throw instead
    val df = Seq(("a", Some(1L), "x"), ("a", None, "y"))
      .toDF("k", "t", "v")
    val e = intercept[Exception] {
      History.scd2(df, "k", "v", Seq("t")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null in sequencing column")),
      s"expected the scd2 null-order guard, got: $e")
  }
}
