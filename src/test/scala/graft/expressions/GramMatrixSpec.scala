package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The fused Gram/covariance kernel must be a physical-plan swap for the
  * declarative explode formulation — cell-for-cell bit-identical — plus
  * the edge semantics the declarative form can't express (ragged corpus
  * fails loudly, nulls skipped, empty input yields zero rows). */
class GramMatrixSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.01"

  private def declarative(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    def m6(c: org.apache.spark.sql.Column) =
      floor(c.cast(DoubleType) / count(lit(1)) + 0.5) / 1000000.0
    df.select($"v", posexplode($"v").as(Seq("i0", "x")))
      .select($"i0", $"x",
        posexplode(slice($"v", $"i0" + 1, size($"v") - $"i0")).as(Seq("dj", "y")))
      .select(($"i0" + 1).as("i"), ($"i0" + 1 + $"dj").as("j"),
        floor($"x" * $"y" * 1000000.0 + 0.5).as("qxy"),
        floor($"x" * 1000000.0 + 0.5).as("qx"),
        floor($"y" * 1000000.0 + 0.5).as("qy"))
      .groupBy($"i", $"j")
      .agg(count(lit(1)).as("n_vecs"), m6(sum($"qxy")).as("m2"),
        m6(sum($"qx")).as("mean_i"), m6(sum($"qy")).as("mean_j"))
      .select($"i", $"j", $"n_vecs", $"m2",
        (floor(($"m2" - $"mean_i" * $"mean_j") * 1000000.0 + 0.5) / 1000000.0).as("cov"))
  }

  test("kernel matches the declarative explode formulation cell-for-cell") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, Dir)
      .select($"embedding".cast("array<double>").as("v"))
    val fused = emb.agg(GramMatrix.gram($"v").as("g")).select(inline($"g"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val decl = declarative(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(fused.size === 64 * 65 / 2)
    assert(fused.keySet === decl.keySet)
    fused.foreach { case (k, v) => assert(v === decl(k), s"cell $k diverges") }
  }

  test("null vectors are skipped; empty input yields zero rows") {
    import spark.implicits._
    val withNull = Seq(Some(Seq(1.0, 2.0)), None, Some(Seq(3.0, 4.0)))
      .toDF("v").select($"v".cast("array<double>").as("v"))
    val rows = withNull.agg(GramMatrix.gram($"v").as("g")).select(inline($"g")).collect()
    assert(rows.length === 3) // d=2 upper triangle
    assert(rows.forall(_.getLong(2) === 2L), "null vector must not count")
    val empty = Seq.empty[Seq[Double]].toDF("v")
      .select($"v".cast("array<double>").as("v"))
    assert(empty.agg(GramMatrix.gram($"v").as("g")).select(inline($"g")).count() === 0)
  }

  test("a ragged corpus fails loudly") {
    import spark.implicits._
    val ragged = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)).toDF("v")
      .select($"v".cast("array<double>").as("v"))
    val e = intercept[Exception] {
      ragged.agg(GramMatrix.gram($"v").as("g")).select(inline($"g")).collect()
    }
    assert(e.getMessage != null)
  }
}
