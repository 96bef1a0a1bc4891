package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests for the tokenizer kernels on RANDOM inputs — the
  * DuckDB gate certifies them on the one corpus; these certify the
  * algorithms themselves against independent in-spec reference
  * implementations (seeded, reproducible). */
class TokenizerPropertiesSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260816L)

  /** All segmentations of `s` over `vocab`, brute force. */
  private def enumerate(s: String, vocab: Set[String]): Seq[List[String]] =
    if (s.isEmpty) Seq(Nil)
    else (1 to s.length).flatMap { l =>
      val p = s.take(l)
      if (vocab.contains(p)) enumerate(s.drop(l), vocab).map(p :: _)
      else Seq.empty
    }

  /** The DP's total order applied to complete segmentations (the
    * space separator sorts below the token alphabet, so join-compare
    * equals element-wise lexicographic for the equal-length tie). */
  private def bestOf(segs: Seq[List[String]],
      score: Map[String, Long]): List[String] =
    segs.sortWith { (a, b) =>
      if (a.length != b.length) a.length < b.length
      else {
        val sa = a.map(score).sum; val sb = b.map(score).sum
        if (sa != sb) sa > sb
        else a.mkString(" ") < b.mkString(" ")
      }
    }.head

  /** Random vocab over alphabet {a,b,c}: all singles + random multis. */
  private def randomVocab(): Seq[(String, Long)] = {
    val singles = Seq("a", "b", "c").map(c => (c, rnd.nextInt(10).toLong + 1))
    val multis = (0 until (2 + rnd.nextInt(6))).map { _ =>
      val len = 2 + rnd.nextInt(3)
      val p = (0 until len).map(_ => "abc" (rnd.nextInt(3))).mkString
      (p, rnd.nextInt(50).toLong + 1)
    }.distinctBy(_._1).filterNot(m => singles.exists(_._1 == m._1))
    singles ++ multis
  }

  test("unigram DP equals brute-force argmin on 60 random (vocab, word) cases") {
    import spark.implicits._
    (1 to 60).foreach { i =>
      val vocab = randomVocab()
      val word = (0 until (1 + rnd.nextInt(9))).map(_ => "abc" (rnd.nextInt(3))).mkString
      val got = Seq(word).toDF("w")
        .select(UnigramLm.segment($"w",
          UnigramLm.Vocab(vocab.map(_._1), vocab.map(_._2))).as("p"))
        .head().getSeq[String](0).toList
      val expected = bestOf(enumerate(word, vocab.map(_._1).toSet),
        vocab.toMap.withDefaultValue(0L))
      assert(got === expected,
        s"case $i: word='$word' vocab=$vocab got=$got expected=$expected")
    }
  }

  test("soft-EM expectation tracks path-enumeration posteriors on 40 random cases") {
    import spark.implicits._
    (1 to 40).foreach { i =>
      val vocab = randomVocab()
      val word = (0 until (1 + rnd.nextInt(7))).map(_ => "abc" (rnd.nextInt(3))).mkString
      val v = UnigramLm.Vocab(vocab.map(_._1), vocab.map(_._2))
      val got = Seq(word).toDF("w")
        .select(explode(UnigramLm.expect($"w", v, UnigramLm.logCosts(v))).as("e"))
        .select($"e.p", $"e.mc").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      // reference: enumerate every path, weight by its exact probability
      val total = vocab.map(_._2).sum.toDouble
      val prob = vocab.map { case (p, c) => p -> (c / total) }.toMap
      val paths = enumerate(word, vocab.map(_._1).toSet)
      val weights = paths.map(_.map(prob).product)
      val z = weights.sum
      val expected = paths.zip(weights)
        .flatMap { case (path, w) => path.map(p => (p, w / z)) }
        .groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }
      expected.foreach { case (p, e) =>
        val g = got.getOrElse(p, 0L) / 1e6
        // per-cell fixed-point quantization bounds the divergence at ~0.5%
        assert(math.abs(g - e) <= math.max(0.005, e * 0.005),
          s"case $i: word='$word' piece='$p' kernel=$g enumeration=$e vocab=$vocab")
      }
    }
  }

  test("wordpiece greedy equals a reference greedy on 60 random cases") {
    import spark.implicits._
    (1 to 60).foreach { i =>
      val vocab = randomVocab()
      val start = vocab.map(_._1)
      val cont = vocab.map(_._1).filter(_ => rnd.nextBoolean()) ++ Seq("a", "b", "c")
      val word = (0 until (1 + rnd.nextInt(9))).map(_ => "abc" (rnd.nextInt(3))).mkString
      val got = Seq(word).toDF("w")
        .select(WordPiece.encode($"w", WordPiece.Vocab(start, cont.distinct)).as("p"))
        .head().getSeq[String](0).toList
      // reference greedy
      val sSet = start.toSet
      val cSet = cont.toSet
      var pos = 0; var first = true
      val ref = scala.collection.mutable.ListBuffer.empty[String]
      while (pos < word.length) {
        val set = if (first) sSet else cSet
        val m = (math.min(6, word.length - pos) to 1 by -1).iterator
          .map(l => word.substring(pos, pos + l)).find(set.contains).get
        ref += (if (first) m else "##" + m)
        pos += m.length; first = false
      }
      assert(got === ref.toList, s"case $i: word='$word'")
    }
  }
}
