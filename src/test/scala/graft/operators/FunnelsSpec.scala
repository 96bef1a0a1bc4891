package graft.operators

import graft.SparkSpec

class FunnelsSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    // u1 completes all three stages in strict order
    ("u1", 10L, "view"), ("u1", 20L, "click"), ("u1", 30L, "purchase"),
    // u2: click at EXACTLY the view timestamp — simultaneous events
    // cannot prove ordering, so u2 never reaches the click stage
    ("u2", 10L, "view"), ("u2", 10L, "click"),
    // u3: click BEFORE the first view does not count; the later one does
    ("u3", 5L, "click"), ("u3", 10L, "view"), ("u3", 15L, "click"),
    // u4 never views — absent from the stage relation entirely
    ("u4", 10L, "click"), ("u4", 20L, "purchase"))
    .toDF("k", "t", "et")

  test("orderedStages chains strictly-after first entries") {
    val st = Funnels.orderedStages(events, "k", "t", "et",
      Seq("view", "click", "purchase"))
    val rows = st.orderBy($"k").collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
      .toSeq
    assert(rows == Seq(
      ("u1", Some(10L), Some(20L), Some(30L)),
      ("u2", Some(10L), None, None),
      ("u3", Some(10L), Some(15L), None)))
  }

  test("orderedStages with a single stage returns first entries only") {
    val st = Funnels.orderedStages(events, "k", "t", "et", Seq("purchase"))
    assert(st.columns.toSeq == Seq("k", "ts_purchase"))
    assert(st.count() == 2) // u1 and u4
  }

  test("orderedStages rejects repeated stages") {
    intercept[IllegalArgumentException] {
      Funnels.orderedStages(events, "k", "t", "et", Seq("view", "view"))
    }
  }
}
