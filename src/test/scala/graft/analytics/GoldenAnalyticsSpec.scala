package graft.analytics

import graft.SparkSpec
import graft.schema.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Validate the analytics queries against the reference's CHECKED-IN
  * artifacts: the reports CSVs + summary_stats + EDA_INSIGHTS numbers, all
  * computed from the checked-in clean_data.csv (391 rows). */
class GoldenAnalyticsSpec extends SparkSpec {

  private val RefDir = "/root/reference"

  private lazy val clean: DataFrame = {
    val g = spark.read
      .option("header", "true").option("multiLine", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(s"$RefDir/clean_data.csv")
    val denan = g.select(g.columns.map { c =>
      when(col(c) === "NaN", lit(null)).otherwise(col(c)).as(c)
    }.toSeq: _*)
    Schemas.clean.fields.foldLeft(denan) { (d, f) =>
      d.withColumn(f.name, col(f.name).try_cast(f.dataType))
    }.select(Schemas.finalColumns.map(col): _*).cache()
  }

  test("summaryKpis matches reports/summary_stats.csv") {
    val r = ListingQueries.summaryKpis(clean).collect()(0)
    assert(r.getAs[Long]("total_rows") === 391L)
    assert(r.getAs[Long]("unique_suppliers") === 314L)
    assert(r.getAs[Long]("unique_cities") === 46L)
    assert(r.getAs[Long]("unique_states") === 11L)
    assert(r.getAs[Double]("median_price") === 25250.0)
    assert(r.getAs[Double]("avg_price") === 64809.64)
  }

  test("state/city counts match EDA_INSIGHTS.md") {
    val states = ListingQueries.valueCountsTopN(clean, "state", 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(states === Seq(("Tamil Nadu", 265L), ("Karnataka", 50L), ("Kerala", 28L),
      ("Delhi", 16L), ("Maharashtra", 10L)))
    val cities = ListingQueries.valueCountsTopN(clean, "city", 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // ties at 16 broken by label asc: Chennai, New Delhi, Tiruppur
    assert(cities === Seq(("Coimbatore", 195L), ("Bengaluru", 48L), ("Chennai", 16L),
      ("New Delhi", 16L), ("Tiruppur", 16L)))
  }

  test("priceBuckets matches EDA_INSIGHTS.md mix with preferred order") {
    val r = ListingQueries.priceBuckets(clean).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r === Seq(("Low (<10k)", 101L), ("Mid (10k-50k)", 106L),
      ("High (50k+)", 79L), ("Unknown", 105L)))
  }

  test("missingPriceByKeyword matches reports/missing_price_by_keyword.csv") {
    val golden = spark.read.option("header", "true")
      .csv(s"$RefDir/reports/missing_price_by_keyword.csv")
      .collect().map(r => r.getString(0) -> r.getString(1).toDouble).toMap
    val ours = ListingQueries.missingPriceByKeyword(clean).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours === golden)
  }

  test("unknownLocationShare matches reports/unknown_location_share.csv") {
    val r = ListingQueries.unknownLocationShare(clean).collect()(0)
    assert(r.getDouble(0) === 0.0)
    assert(r.getDouble(1) === 0.0)
  }

  test("topProductTokens matches reports/top_product_tokens.csv") {
    val golden = spark.read.option("header", "true")
      .csv(s"$RefDir/reports/top_product_tokens.csv")
      .collect().map(r => r.getString(0) -> r.getString(1).toLong)
    val ours = ListingQueries.topProductTokens(clean, 2000).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    golden.foreach { case (tok, n) => assert(ours.get(tok).contains(n), s"token $tok") }
  }

  test("eda missingness matches reports/eda_summary.csv") {
    val golden = spark.read.option("header", "true")
      .csv(s"$RefDir/reports/eda_summary.csv")
      .collect().map(r => r.getString(0) -> r.getString(2).toLong).toMap
    val ours = ListingQueries.edaSummary(clean).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // golden has an extra __DATASET__ summary row; compare the real columns
    golden.filter(g => ours.contains(g._1))
      .foreach { case (c, miss) => assert(ours(c) === miss, s"column $c") }
    assert(golden.keySet.intersect(ours.keySet).size >= 14)
  }

  test("rating/price correlation matches EDA_INSIGHTS.md (-0.037)") {
    val r = ListingQueries.ratingPriceCorr(clean).collect()(0)
    assert(r.getDouble(0) === -0.037)
  }

  test("outliersTopPrices matches reports/outliers_top_prices.csv") {
    val golden = spark.read.option("header", "true")
      .option("multiLine", "true").option("quote", "\"").option("escape", "\"")
      .csv(s"$RefDir/reports/outliers_top_prices.csv")
      .select(col("product_name"), col("price_numeric").cast("double")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val ours = ListingQueries.outliersTopPrices(clean, golden.length).collect()
      .map(r => (r.getAs[String]("product_name"), r.getAs[Double]("price_numeric")))
    // compare as multisets: the reference's tie order is pandas row order
    assert(ours.sorted.toSeq === golden.sorted.toSeq)
    val top1 = ListingQueries.outliersTopPct(clean).collect()
    assert(top1.length === 3) // reports/outliers_top_1pct_prices.csv rows
  }

  test("priceHist p99-clip bins sum to clipped row count") {
    val h = ListingQueries.priceHist(clean).collect()
    assert(h.length <= 12)
    val total = h.map(_.getAs[Long]("count")).sum
    // 286 priced rows, minus those above p99
    assert(total >= 280 && total <= 286)
    assert(h.head.getAs[String]("bin").contains("-"))
  }

  test("scatter sample bounded and deterministic") {
    val a = ListingQueries.scatterRatingPrice(clean, maxPoints = 50).collect()
    val b = ListingQueries.scatterRatingPrice(clean, maxPoints = 50).collect()
    assert(a.length === 50)
    assert(a.map(r => (r.getDouble(0), r.getDouble(1))).toSeq ===
      b.map(r => (r.getDouble(0), r.getDouble(1))).toSeq)
  }

  test("filters + filterValues behave like the dashboard") {
    val tn = ListingQueries.applyFilters(clean,
      ListingQueries.Filters(state = Some("tamil nadu")))
    assert(tn.count() === 265L)
    val states = ListingQueries.filterValues(clean, "state").collect().map(_.getString(0))
    assert(states.length === 11)
    assert(states.sorted.sameElements(states))
    val donut = ListingQueries.keywordShareTopOthers(clean).collect()
    assert(donut.length === 6)
    assert(donut.map(_.getLong(1)).sum === 391L)
    val combo = ListingQueries.comboListingsAvgPrice(clean).collect()
    assert(combo.length === 8)
  }
}
