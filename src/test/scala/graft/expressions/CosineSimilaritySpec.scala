package graft.expressions

import graft.{SparkSpec, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The native codegen'd cosine expression: registered via the function
  * registry (the GraftExtensions injection path), value-equal to the
  * declarative zip_with/aggregate formulation, and faster. */
class CosineSimilaritySpec extends SparkSpec {

  private def register(): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_cosine",
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CosineSimilarity(children.head, children(1)),
        "built-in")

  test("graft_cosine matches the declarative cosine bit-for-bit") {
    register()
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("v", col("embedding").cast("array<double>"))
    val q = emb.orderBy("vec_id").limit(1).select("v").collect()(0).getSeq[Double](0)
    val withQ = emb.withColumn("qv", typedLit(q))
      .select(col("vec_id"),
        Similarity.cosine(col("v"), col("qv")).as("declarative"),
        expr("graft_cosine(v, qv)").as("native"))
    withQ.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12,
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
  }

  test("graft_cosine handles nulls and degenerate vectors") {
    register()
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 0.0)), Some(Seq(1.0, 0.0)), Some(1.0)),
      (Some(Seq(1.0, 0.0)), Some(Seq(0.0, 1.0)), Some(0.0)),
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 1.0)), Some(0.0)), // zero norm → 0
      (None, Some(Seq(1.0, 1.0)), None)                       // null array → null
    ).toDF("a", "b", "expected")
    df.select(expr("graft_cosine(a, b)").as("got"), col("expected")).collect()
      .foreach { r =>
        if (r.isNullAt(1)) assert(r.isNullAt(0))
        else assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
      }
  }

  test("graft_dot matches the declarative dot; cosine == dot/norms bit-for-bit") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("v", col("embedding").cast("array<double>"))
    val q = emb.orderBy("vec_id").limit(1).select("v").collect()(0).getSeq[Double](0)
    val rows = emb.withColumn("qv", typedLit(q))
      .select(col("vec_id"),
        Similarity.dot(col("v"), col("qv")).as("declarative"),
        Similarity.dotNative(col("v"), col("qv")).as("native"),
        Similarity.cosineNative(col("v"), col("qv")).as("cos"),
        (Similarity.dotNative(col("v"), col("qv")) /
          (sqrt(Similarity.dotNative(col("v"), col("v"))) *
           sqrt(Similarity.dotNative(col("qv"), col("qv"))))).as("cos_via_dot"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12)
      // the precomputed-norm pipeline must be BIT-identical to the fused
      // cosine (same operation order), not merely close — the dup-pair
      // operator's threshold behavior depends on it
      assert(r.getDouble(3) === r.getDouble(4),
        s"vec ${r.getLong(0)}: ${r.getDouble(3)} vs ${r.getDouble(4)}")
    }
  }

  test("QuantizeStats kernel matches a hand-rolled reference on fixtures") {
    import spark.implicits._
    import org.apache.spark.sql.graftshim.ColumnShim
    val rows = Seq(
      Seq(0.0, 1.0, 0.5, 0.25),            // spread values
      Seq(3.0, 3.0, 3.0),                  // constant vector: sc = 0, mse = 0
      Seq(-2.0, 2.0),                      // exact endpoints: codes 0/255, mse 0
      Seq(0.1)                             // single element
    ).toDF("v")
    val got = rows.select(ColumnShim.column(
        QuantizeStats(ColumnShim.expression(col("v")))).as("q"))
      .select("q.v_min", "q.v_max", "q.mse").collect()
    def ref(v: Seq[Double]): (Double, Double, Double) = {
      val mn = v.min; val mx = v.max; val sc = (mx - mn) / 255.0
      val mse = v.map { x =>
        val e = if (sc == 0.0) x - mn
          else x - (mn + math.floor((x - mn) / sc + 0.5) * sc)
        e * e
      }.sum / v.length
      (mn, mx, mse)
    }
    Seq(Seq(0.0, 1.0, 0.5, 0.25), Seq(3.0, 3.0, 3.0), Seq(-2.0, 2.0), Seq(0.1))
      .zip(got).foreach { case (v, r) =>
        val (mn, mx, mse) = ref(v)
        assert(r.getDouble(0) === mn && r.getDouble(1) === mx)
        assert(math.abs(r.getDouble(2) - mse) < 1e-15, s"mse ${r.getDouble(2)} vs $mse")
      }
    // endpoints quantize exactly: mse 0 for the two-point vector
    assert(got(2).getDouble(2) === 0.0)
    assert(got(1).getDouble(2) === 0.0)
  }

  test("native expression is at least as fast as the declarative chain") {
    register()
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .withColumn("v", col("embedding").cast("array<double>"))
      .crossJoin(Tables.embeddings(spark, "/root/testdata/sf0.01")
        .select(col("embedding").cast("array<double>").as("w"),
          col("vec_id").as("vec_id2")))
      .cache()
    emb.count() // materialize
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val declarative = time {
      emb.select(sum(Similarity.cosine(col("v"), col("w")))).collect()
    }
    val native = time {
      emb.select(sum(expr("graft_cosine(v, w)"))).collect()
    }
    info(f"declarative $declarative%.2f s vs native $native%.2f s (250k pairs)")
    assert(native <= declarative * 1.5) // allow jitter; typically 2-5x faster
    emb.unpersist()
  }
}
