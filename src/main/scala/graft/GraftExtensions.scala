package graft

import graft.expressions.{CosineSimilarity, DotProductLong, EqCount,
  ExactQuantiles, IntCosGe, KMeansAssignDyn, KMeansAssignExpr, KmvSketch,
  MinHashSignature, ShingleHashes64, SimHashChunks, UnigramSegment,
  WinnowFingerprints, WordPieceEncode}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions injector: registers the engine's native
  * expressions as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — then e.g.
  * `expr("graft_cosine(a, b)")` or `spark.sql("SELECT graft_simhash(...)")`
  * resolves everywhere (SQL, DataFrame, views), fully codegen'd.
  *
  * Functions taking a static parameter (k, numHashes, percentages…)
  * require a foldable literal argument — they parameterize the kernel,
  * not per-row behavior.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String, arg: String): Int = {
    def bad() = throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $e")
    e match {
      case l: Literal if l.foldable => l.eval() match {
        case n: Number => n.intValue()
        // SQL decimal literals (e.g. 3.0) evaluate to Decimal, not Number
        case d: org.apache.spark.sql.types.Decimal
          if d.toDouble == d.toDouble.floor => d.toDouble.toInt
        case _ => bad()
      }
      case _ => bad()
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: per-key top-k via bounded heaps
    // (logical node graft.plans.TopKPerKeyNode, two-phase physical plan)
    ext.injectPlannerStrategy(_ =>
      org.apache.spark.sql.graftshim.TopKPerKeyStrategy)
    // optimizer rule: rewrite the row_number-window + filter(rn <= k)
    // idiom to prune through TopKPerKeyNode beneath the window
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)

    def register(name: String, clazz: Class[_], usage: String)(
        build: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        (children: Seq[Expression]) => {
          require(children.nonEmpty, usage)
          build(children)
        }))

    register("graft_kmeans_assign", classOf[KMeansAssignExpr],
        "graft_kmeans_assign(v, labels, flatCents)") { c =>
      require(c.length == 3, "graft_kmeans_assign(v, labels, flatCents)")
      KMeansAssignExpr(c.head, c(1), c(2))
    }
    register("graft_kmeans_assign_f64", classOf[graft.expressions.KMeansAssignF64],
        "graft_kmeans_assign_f64(v, labels, flatCents)") { c =>
      require(c.length == 3, "graft_kmeans_assign_f64(v, labels, flatCents)")
      graft.expressions.KMeansAssignF64(c.head, c(1), c(2))
    }
    register("graft_kmeans_assign2", classOf[graft.expressions.KMeansAssign2Expr],
        "graft_kmeans_assign2(v, labels, flatCents)") { c =>
      require(c.length == 3, "graft_kmeans_assign2(v, labels, flatCents)")
      graft.expressions.KMeansAssign2Expr(c.head, c(1), c(2))
    }
    register("graft_kmeans_assign_dyn", classOf[KMeansAssignDyn],
        "graft_kmeans_assign_dyn(v, labels, flatCents)") { c =>
      require(c.length == 3, "graft_kmeans_assign_dyn(v, labels, flatCents)")
      KMeansAssignDyn(c.head, c(1), c(2))
    }
    register("graft_unigram_segment", classOf[UnigramSegment],
        "graft_unigram_segment(word, pieces, scores)") { c =>
      require(c.length == 3, "graft_unigram_segment(word, pieces, scores)")
      UnigramSegment(c.head, c(1), c(2))
    }
    register("graft_unigram_expect", classOf[graft.expressions.UnigramExpect],
        "graft_unigram_expect(word, pieces, costs)") { c =>
      require(c.length == 3, "graft_unigram_expect(word, pieces, costs)")
      graft.expressions.UnigramExpect(c.head, c(1), c(2))
    }
    register("graft_wordpiece_encode", classOf[WordPieceEncode],
        "graft_wordpiece_encode(word, startPieces, contPieces)") { c =>
      require(c.length == 3, "graft_wordpiece_encode(word, startPieces, contPieces)")
      WordPieceEncode(c.head, c(1), c(2))
    }
    register("graft_intcos_ge", classOf[IntCosGe],
        "graft_intcos_ge(dot, naSq, nbSq, tauNum, tauDen)") { c =>
      require(c.length == 5, "graft_intcos_ge(dot, naSq, nbSq, tauNum, tauDen)")
      IntCosGe(c.head, c(1), c(2),
        intLit(c(3), "graft_intcos_ge", "tauNum").toLong,
        intLit(c(4), "graft_intcos_ge", "tauDen").toLong)
    }
    register("graft_eq_count", classOf[EqCount],
        "graft_eq_count(arrayA, arrayB)") { c =>
      require(c.length == 2, "graft_eq_count(arrayA, arrayB)")
      EqCount(c.head, c(1))
    }
    register("graft_dot_long", classOf[DotProductLong],
        "graft_dot_long(arrayA, arrayB)") { c =>
      require(c.length == 2, "graft_dot_long(arrayA, arrayB)")
      DotProductLong(c.head, c(1))
    }
    register("graft_cosine", classOf[CosineSimilarity],
        "graft_cosine(arrayA, arrayB)") { c =>
      require(c.length == 2, "graft_cosine(arrayA, arrayB)")
      CosineSimilarity(c.head, c(1))
    }
    register("graft_shingle_hashes", classOf[ShingleHashes64],
        "graft_shingle_hashes(tokens, k)") { c =>
      require(c.length == 2, "graft_shingle_hashes(tokens, k)")
      ShingleHashes64(c.head, intLit(c(1), "graft_shingle_hashes", "k"))
    }
    register("graft_minhash_sig", classOf[MinHashSignature],
        "graft_minhash_sig(shingleHashes, numHashes)") { c =>
      require(c.length == 2, "graft_minhash_sig(shingleHashes, numHashes)")
      MinHashSignature(c.head, intLit(c(1), "graft_minhash_sig", "numHashes"))
    }
    register("graft_simhash", classOf[SimHashChunks],
        "graft_simhash(tokens)") { c =>
      require(c.length == 1, "graft_simhash(tokens)")
      SimHashChunks(c.head)
    }
    register("graft_winnow", classOf[WinnowFingerprints],
        "graft_winnow(tokens, k, w)") { c =>
      require(c.length == 3, "graft_winnow(tokens, k, w)")
      WinnowFingerprints(c.head, intLit(c(1), "graft_winnow", "k"),
        intLit(c(2), "graft_winnow", "w"))
    }
    register("graft_exact_quantiles", classOf[ExactQuantiles],
        "graft_exact_quantiles(col, p1, p2, ...)") { c =>
      require(c.length >= 2, "graft_exact_quantiles(col, p1, p2, ...)")
      val ps = c.tail.map {
        case l: Literal if l.foldable => l.eval() match {
          // SQL decimal literals (0.25) evaluate to Decimal, not Number
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number                             => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"graft_exact_quantiles: non-numeric percentage $other")
        }
        case other => throw new IllegalArgumentException(
          s"graft_exact_quantiles: percentages must be literals, got $other")
      }
      // ImplicitCastInputTypes on ExactQuantiles coerces the child
      ExactQuantiles(c.head, ps).toAggregateExpression()
    }
    register("graft_kmv_distinct", classOf[KmvSketch],
        "graft_kmv_distinct(col[, k])") { c =>
      require(c.length == 1 || c.length == 2, "graft_kmv_distinct(col[, k])")
      val k = if (c.length == 2) intLit(c(1), "graft_kmv_distinct", "k") else 256
      KmvSketch(c.head, k).toAggregateExpression()
    }
    register("graft_quantize_stats", classOf[graft.expressions.QuantizeStats],
        "graft_quantize_stats(vec)") { c =>
      require(c.length == 1, "graft_quantize_stats(vec)")
      graft.expressions.QuantizeStats(c.head)
    }
    register("graft_jl_project", classOf[graft.expressions.JlProject],
        "graft_jl_project(vec[, nPlanes, dim])") { c =>
      require(c.length == 1 || c.length == 3, "graft_jl_project(vec[, nPlanes, dim])")
      val p = if (c.length == 3) intLit(c(1), "graft_jl_project", "nPlanes") else 16
      val d = if (c.length == 3) intLit(c(2), "graft_jl_project", "dim") else 64
      graft.expressions.JlProject(c.head, p, d)
    }
    register("graft_jaro_winkler", classOf[graft.expressions.JaroWinkler],
        "graft_jaro_winkler(a, b)") { c =>
      require(c.length == 2, "graft_jaro_winkler(a, b)")
      graft.expressions.JaroWinkler(c.head, c(1))
    }
    register("graft_damerau", classOf[graft.expressions.DamerauLevenshtein],
        "graft_damerau(a, b)") { c =>
      require(c.length == 2, "graft_damerau(a, b)")
      graft.expressions.DamerauLevenshtein(c.head, c(1))
    }
    register("graft_hamming", classOf[graft.expressions.HammingDistance],
        "graft_hamming(a, b)") { c =>
      require(c.length == 2, "graft_hamming(a, b)")
      graft.expressions.HammingDistance(c.head, c(1))
    }
    register("graft_char_jaccard", classOf[graft.expressions.CharSetJaccard],
        "graft_char_jaccard(a, b)") { c =>
      require(c.length == 2, "graft_char_jaccard(a, b)")
      graft.expressions.CharSetJaccard(c.head, c(1))
    }
    register("graft_gram_matrix", classOf[graft.expressions.GramMatrix],
        "graft_gram_matrix(vec)") { c =>
      require(c.length == 1, "graft_gram_matrix(vec)")
      graft.expressions.GramMatrix(c.head).toAggregateExpression()
    }
    register("graft_mg_candidates", classOf[graft.expressions.MisraGries],
        "graft_mg_candidates(col[, k])") { c =>
      require(c.length == 1 || c.length == 2, "graft_mg_candidates(col[, k])")
      val k = if (c.length == 2) intLit(c(1), "graft_mg_candidates", "k") else 64
      graft.expressions.MisraGries(c.head, k).toAggregateExpression()
    }
  }
}
