package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Misra-Gries guarantee under Spark's partial/merge execution:
  * every item with frequency > n/(k+1) appears in the candidate set,
  * for any partitioning. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish corpus: two planted heavy hitters over a long random tail
  private def corpus(seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val heavy = Seq.fill(3000)("hh_a") ++ Seq.fill(2000)("hh_b")
    val tail = Seq.fill(5000)(s"t_${rnd.nextInt(2000)}")
    rnd.shuffle(heavy ++ tail)
  }

  private def candidates(data: Seq[String], k: Int, partitions: Int): Seq[String] =
    data.toDF("v").repartition(partitions)
      .agg(MisraGries.mgCandidates($"v", k).as("c"))
      .first().getSeq[String](0)

  test("planted heavy hitters survive the sketch at any partitioning") {
    // n=10000; hh_a 30%, hh_b 20% — both far above 1/(k+1) for k=16
    for (parts <- Seq(1, 4, 13)) {
      val c = candidates(corpus(1), 16, parts)
      assert(c.size <= 16, s"capacity exceeded: ${c.size}")
      assert(c.contains("hh_a") && c.contains("hh_b"),
        s"lost a guaranteed heavy hitter at $parts partitions: $c")
    }
  }

  test("candidate set is sorted and null inputs are ignored") {
    val c = (Seq[Option[String]](None, Some("b"), Some("a"), Some("b"), None))
      .toDF("v").agg(MisraGries.mgCandidates($"v", 8)).first().getSeq[String](0)
    assert(c == c.sorted)
    assert(c.toSet == Set("a", "b"))
  }

  test("sketch + exact confirm equals the full exact heavy-hitter set") {
    val data = corpus(7)
    val df = data.toDF("v").repartition(5)
    val n = data.size.toLong
    val k = 16
    val cands = candidates(data, k, 5)
    val viaSketch = df.filter($"v".isin(cands: _*))
      .groupBy($"v").count().filter($"count" * (k + 1) > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (k + 1) > n }.toMap
    assert(viaSketch == exact)
    assert(exact.nonEmpty) // non-vacuous: the planted hitters pass the bar
  }
}
