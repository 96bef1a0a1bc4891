package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactionChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(s: String): String =
    Seq(s).toDF("t").select(Redaction.redactPii($"t")).first().getString(0)

  test("redactPii masks emails, 12-digit ids, and phone runs") {
    assert(redactOne("mail john.doe+x@sub.example.co.uk now") == "mail [EMAIL] now")
    assert(redactOne("aadhaar 123456789012.") == "aadhaar [ID].")
    assert(redactOne("call +91 98765 43210 or +1-800-555-0199!") ==
      "call [PHONE] or [PHONE]!")
    // order matters: the email keeps its digits, the id is not phone-eaten
    assert(redactOne("a@b.io 123456789012 +44 7700 900123") ==
      "[EMAIL] [ID] [PHONE]")
    // a '+'-prefixed separator-free 12-digit run is a phone, not '+[ID]'
    assert(redactOne("dial +123456789012 now") == "dial [PHONE] now")
  }

  test("redactPii leaves clean text and short digit runs alone") {
    val s = "order 12345 shipped 2024-01-01 to room 101"
    assert(redactOne(s) == s)
  }

  test("email/digit-run counts match what redaction would mask") {
    val row = Seq("a@b.co c@d.org 1234567890 12345678901234 999")
      .toDF("t")
      .select(Redaction.emailCount($"t").as("e"), Redaction.longDigitRunCount($"t").as("d"))
      .first()
    assert(row.getInt(0) == 2)
    assert(row.getInt(1) == 2) // the 10-digit and the 14-digit run; 999 is short
  }

  test("chunkCount/chunkAt cover every token exactly under (32, 24)") {
    val cases = Seq(0, 1, 31, 32, 33, 56, 57, 80, 200)
    val df = cases.map(n => (n, (1 to n).map(i => s"t$i"))).toDF("n", "toks")
      .withColumn("n_chunks", TextAnalysis.chunkCount($"toks", 32, 24))
    val got = df.select($"n", $"n_chunks").collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    // 1 chunk up to 32 tokens, +1 per started stride of 24 beyond
    assert(got == Map(0 -> 1, 1 -> 1, 31 -> 1, 32 -> 1, 33 -> 2, 56 -> 2,
      57 -> 3, 80 -> 3, 200 -> 8))
    // chunks tile the array: concatenating chunk tails (last 24 of each
    // overlap-32 window) reconstructs membership — check total coverage
    val covered = df
      .withColumn("idx", explode(sequence(lit(0), $"n_chunks" - 1)))
      .withColumn("piece", TextAnalysis.chunkAt($"toks", $"idx", 32, 24))
      .groupBy($"n").agg(size(array_distinct(flatten(collect_list($"piece")))).as("cov"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    cases.foreach(n => assert(covered(n) == n, s"n=$n covered=${covered(n)}"))
  }

  test("a short final chunk holds the remainder, not a full window") {
    val piece = Seq((1 to 40).map(_.toString)).toDF("toks")
      .select(TextAnalysis.chunkAt($"toks", lit(1), 32, 24))
      .first().getSeq[String](0)
    assert(piece == (25 to 40).map(_.toString)) // tokens 25..40: 16 tokens
  }

  test("chunkCount rejects a stride wider than the chunk") {
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkCount(lit(Array("a")), 8, 9)
    }
  }
}
