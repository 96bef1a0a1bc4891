package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom top-k-per-key operator must agree with the window
  * formulation it replaces, and its physical plan must show the
  * two-phase (partial heap → exchange → final heap) shape. */
class TopKPerKeySpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.001"

  test("matches row_number window formulation exactly") {
    val orders = Tables.orders(spark, Dir)
    val fast = TopKPerKey.perKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast === ref)
    assert(fast.nonEmpty)
  }

  test("k larger than any group returns everything") {
    val orders = Tables.orders(spark, Dir)
    val n = TopKPerKey.perKey(orders, Seq("o_custkey"),
      Seq(("o_orderkey", true)), 1000000).count()
    assert(n === orders.count())
  }

  test("physical plan: partial heap before the exchange, final after") {
    val df = TopKPerKey.perKey(Tables.orders(spark, Dir), Seq("o_custkey"),
      Seq(("o_totalprice", false)), 2)
    // renders as "TopKPerKey [keys], [orders], k, <partial>" positionally
    val p = df.queryExecution.executedPlan.toString
    val iFinal = p.indexOf("TopKPerKey")
    val iExchange = p.indexOf("Exchange hashpartitioning")
    val iPartial = p.indexOf("TopKPerKey", iFinal + 1)
    assert(iFinal >= 0 && iPartial >= 0, s"two-phase shape missing:\n$p")
    assert(iExchange >= 0, s"no key exchange between phases:\n$p")
    // final phase (printed first) consumes the exchange; partial feeds it
    assert(iFinal < iExchange && iExchange < iPartial,
      s"phases not around the exchange:\n$p")
    assert(p.substring(iFinal, iExchange).contains(", false"), s"top node not final:\n$p")
    assert(p.substring(iPartial).takeWhile(_ != '\n').contains(", true"),
      s"bottom node not partial:\n$p")
  }

  test("multi-column keys and ascending order") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, 10.0), ("a", 1, 5.0), ("a", 1, 7.0),
      ("a", 2, 1.0), ("b", 1, 3.0), ("b", 1, 2.0)
    ).toDF("k1", "k2", "v")
    val got = TopKPerKey.perKey(df, Seq("k1", "k2"), Seq(("v", true)), 2)
      .orderBy("k1", "k2", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toList
    assert(got === List(("a", 1, 5.0), ("a", 1, 7.0), ("a", 2, 1.0),
      ("b", 1, 2.0), ("b", 1, 3.0)))
  }

  test("pre-partitioned input skips the final exchange (outputPartitioning preserved)") {
    val pre = Tables.orders(spark, Dir).repartition(col("o_custkey"))
    val df = TopKPerKey.perKey(pre, Seq("o_custkey"), Seq(("o_totalprice", false)), 2)
    df.collect()
    // AQE prints Final and Initial plans — count only the final one
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected only the repartition exchange:\n$p")
  }

  test("optimizer rule rewrites the window idiom to prune through the operator") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val idiom = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    // the rule fires during optimization: TopKPerKeyNode appears UNDER
    // the window, which still computes the rank column
    val opt = idiom.queryExecution.optimizedPlan.toString
    assert(opt.contains("TopKPerKey"), s"rule did not fire:\n$opt")
    assert(opt.contains("row_number"), s"window was dropped — ranks lost:\n$opt")
    // results identical to the unrewritten semantics (rank col intact)
    val rows = idiom.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(rows.head.fieldIndex("rn")) <= 3))
    val perKey = rows.groupBy(_.getLong(rows.head.fieldIndex("o_custkey")))
    assert(perKey.values.forall(_.length <= 3))
  }

  test("optimizer rule turns GLOBAL row_number top-k into TakeOrderedAndProject") {
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val idiom = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
    idiom.collect()
    val p = idiom.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"global top-k still sorts everything in one partition:\n$p")
    // rank column survives and is correct
    val rows = idiom.orderBy(col("rn")).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getInt(rows.head.fieldIndex("rn"))).toSeq === Seq(1, 2, 3, 4, 5))
    // and matches the top-5 by direct sort
    val direct = Tables.orders(spark, Dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5).select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(rows.map(_.getLong(rows.head.fieldIndex("o_orderkey"))).toSeq === direct)
  }

  test("optimizer rule elides the window entirely when the rank is dropped") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val dropped = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val opt = dropped.queryExecution.optimizedPlan.toString
    assert(opt.contains("TopKPerKey"), s"elision did not fire:\n$opt")
    assert(!opt.contains("Window ") && !opt.contains("row_number"),
      s"window survived though the rank is unused:\n$opt")
    // same rows as the idiom that keeps the rank
    val ref = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(_.toSeq).toSet
    assert(dropped.collect().map(_.toSeq).toSet === ref)
  }

  test("elision keeps non-bound conjuncts as a residual filter") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val mixed = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("o_totalprice") > 100000)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val opt = mixed.queryExecution.optimizedPlan.toString
    assert(opt.contains("TopKPerKey"), s"rewrite did not fire:\n$opt")
    assert(!opt.contains("row_number"), s"window survived:\n$opt")
    // the price predicate must survive the elision
    assert(opt.contains("100000"), s"residual conjunct dropped:\n$opt")
    val ref = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .filter(col("o_totalprice") > 100000)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(_.toSeq).toSet
    assert(ref.nonEmpty, "fixture degenerate: no rows pass the residual")
    assert(mixed.collect().map(_.toSeq).toSet === ref)
    // and strictly fewer rows than the bound alone — residual is active
    val boundOnly = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).count()
    assert(ref.size < boundOnly)
  }

  test("pagination (rn >= 2 and rn <= 3) is never elided and stays correct") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val page = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") >= 2 && col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
    // rn >= 2 references the rank: the window must survive (heap prune
    // below it is fine), and row 1 of each key must be excluded
    val opt = page.queryExecution.optimizedPlan.toString
    assert(opt.contains("row_number"), s"window elided under an rn residual:\n$opt")
    val ref = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") >= 2).filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey").collect().map(_.toSeq).toSet
    assert(ref.nonEmpty)
    assert(page.collect().map(_.toSeq).toSet === ref)
  }

  test("optimizer rule guards: huge k stays untouched; random order is materialized") {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    val hugeK = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 100000)
    assert(!hugeK.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
    // rand() in a window order is materialized by the analyzer into a
    // _w0 projection BELOW the window, so the order spec the rule (and
    // the heap comparator) sees is a plain deterministic attribute — the
    // rewrite fires and is safe; assert the materialization assumption
    val wRand = Window.partitionBy(col("o_custkey")).orderBy(rand(7))
    val nondet = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(wRand)).filter(col("rn") <= 3)
    val opt = nondet.queryExecution.optimizedPlan.toString
    assert(opt.contains("rand(7) AS _w0"), s"analyzer stopped materializing:\n$opt")
    assert(nondet.count() > 0)
  }

  test("optimizer rule leaves non-matching windows alone") {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    // percent_rank is not a row-count limiter; filter on a non-window
    // column; no filter at all
    val r1 = Tables.orders(spark, Dir)
      .withColumn("pr", percent_rank().over(w)).filter(col("pr") <= 0.5)
    assert(!r1.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
    val r2 = Tables.orders(spark, Dir)
      .withColumn("rn", row_number().over(w)).filter(col("o_totalprice") > 0)
    assert(!r2.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
    val r3 = Tables.orders(spark, Dir).withColumn("rn", row_number().over(w))
    assert(!r3.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
  }

  test("rank()/dense_rank() idioms rewrite with tie-keeping semantics") {
    // o_orderpriority has few distinct values → guaranteed heavy ties
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderpriority"))
    for ((fn, name) <- Seq((rank(), "rank"), (dense_rank(), "dense_rank"))) {
      val idiom = Tables.orders(spark, Dir)
        .withColumn("rk", fn.over(w)).filter(col("rk") <= 2)
      val opt = idiom.queryExecution.optimizedPlan.toString
      assert(opt.contains("TopKPerKey"), s"$name rewrite did not fire:\n$opt")
      // ground truth: full builtin window (no rank filter → no rewrite),
      // bound applied driver-side
      val ref = Tables.orders(spark, Dir)
        .withColumn("rk", fn.over(w))
        .select("o_custkey", "o_orderkey", "rk")
        .collect().filter(_.getInt(2) <= 2)
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val got = idiom.select("o_custkey", "o_orderkey", "rk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === ref, s"$name results diverge from builtin window")
      assert(got.nonEmpty)
    }
  }

  test("rank mode keeps boundary ties; dense mode keeps top distinct values") {
    import spark.implicits._
    val df = Seq(
      ("a", 10), ("a", 10), ("a", 9), ("a", 9), ("a", 8),
      ("b", 5), ("b", 5), ("b", 5), ("b", 4)
    ).toDF("k", "v")
    // rank() <= 2 over v desc: a → ranks 1,1,3,3,5 keeps the two 10s;
    // b → ranks 1,1,1,4 keeps the three tied 5s (boundary ties kept)
    val byRank = TopKPerKey.perKey(df, Seq("k"), Seq(("v", false)), 2,
        TopKMode.Rank)
      .groupBy("k").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byRank === Map("a" -> 2L, "b" -> 3L))
    // dense_rank() <= 2: top two DISTINCT values per key
    val byDense = TopKPerKey.perKey(df, Seq("k"), Seq(("v", false)), 2,
        TopKMode.Dense)
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(byDense.toSet === Set(("a", 10), ("a", 9), ("b", 5), ("b", 4)))
    assert(byDense.length === 8) // 10,10,9,9 for a; 5,5,5,4 for b
  }

  test("unknown column raises a clear error") {
    val e = intercept[IllegalArgumentException] {
      TopKPerKey.perKey(Tables.orders(spark, Dir), Seq("nope"), Seq(("x", true)), 1)
    }
    assert(e.getMessage.contains("not in"))
  }
}
