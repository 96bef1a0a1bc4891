package graft.etl

import graft.SparkSpec
import graft.schema.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity harness: run the REFERENCE implementation (etl.py, via python3 +
  * pandas, both available in this container) on its checked-in raw CSV into
  * a temp dir, then assert our Spark pipeline produces identical output on
  * the SAME input.
  *
  * Note: the reference's checked-in clean_data.csv (391 rows) was produced
  * from an older scrape, not from the checked-in raw CSV (403 rows) — the
  * reference run itself emits 403 rows on this input (verified directly),
  * so same-input parity is the correct golden, not the stale artifact.
  * The checked-in artifacts are instead used by GoldenAnalyticsSpec to
  * validate the analytics queries over clean_data.csv.
  */
class GoldenEtlSpec extends SparkSpec {

  private val RefDir = "/root/reference"
  private val RunDir = "/tmp/graft_refrun"

  /** Runs the reference ETL once per machine state; emits clean_ref.csv,
    * data_profile_report.csv and the mtime string the reference backfills
    * scraped_at with. Returns false if python/pandas are unavailable. */
  private lazy val refRunOk: Boolean = {
    import scala.sys.process._
    val script =
      s"""set -e
         |mkdir -p $RunDir && cd $RunDir
         |cp $RefDir/etl.py .
         |python3 etl.py --input $RefDir/indiamart_21_keywords_products.csv \\
         |  --no-sqlite --output $RunDir/clean_ref.csv >/dev/null 2>&1
         |python3 -c "import os,datetime;print(datetime.datetime.fromtimestamp(os.path.getmtime('$RefDir/indiamart_21_keywords_products.csv'),tz=datetime.timezone.utc).isoformat())" > $RunDir/mtime.txt
         |""".stripMargin
    (Seq("bash", "-c", script).! == 0) &&
      new java.io.File(s"$RunDir/clean_ref.csv").exists()
  }

  private lazy val fallbackMtime: String = {
    val src = scala.io.Source.fromFile(s"$RunDir/mtime.txt")
    try src.mkString.trim finally src.close()
  }

  private lazy val result: CleanPipeline.EtlResult = {
    val raw = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .schema(Schemas.raw)
      .csv(s"$RefDir/indiamart_21_keywords_products.csv")
    CleanPipeline.run(raw, Some(fallbackMtime), exactPythonTitle = true)
  }

  private lazy val golden: DataFrame = {
    val g = spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(s"$RunDir/clean_ref.csv")
    // pandas wrote literal "NaN" sentinels (etl.py:419); normalize + type
    val denan = g.select(g.columns.map { c =>
      when(col(c) === "NaN", lit(null)).otherwise(col(c)).as(c)
    }.toSeq: _*)
    Schemas.clean.fields.foldLeft(denan) { (d, f) =>
      d.withColumn(f.name, col(f.name).try_cast(f.dataType))
    }.select(Schemas.finalColumns.map(col): _*)
  }

  test("clean output matches the reference run row-for-row") {
    assume(refRunOk, "reference python run unavailable")
    val ours = result.clean
    val key = Schemas.finalColumns.map(col)
    val a = ours.orderBy(key: _*).collect()
    val b = golden.orderBy(key: _*).collect()
    assert(a.length === b.length)
    val mismatches = a.zip(b).zipWithIndex.filter { case ((x, y), _) => x != y }
    assert(mismatches.isEmpty,
      s"${mismatches.size} mismatches; first: ${mismatches.take(3).map { case ((x, y), i) => s"#$i\n  ours=$x\n  gold=$y" }.mkString("\n")}")
  }

  test("profile stats match the reference run's data_profile_report.csv") {
    assume(refRunOk, "reference python run unavailable")
    val goldenProfile = spark.read.option("header", "true")
      .csv(s"$RunDir/data_profile_report.csv")
      .select(col("column"), col("non_null").cast("long"), col("nulls").cast("long"),
        col("null_pct").cast("double"), col("unique").cast("long"))
      .collect().map(r => r.getString(0) -> r).toMap
    val ours = result.profile.collect()
    assert(ours.length === goldenProfile.size)
    ours.foreach { r =>
      val c = r.getAs[String]("column")
      val g = goldenProfile(c)
      assert(r.getAs[Long]("non_null") === g.getLong(1), s"non_null($c)")
      assert(r.getAs[Long]("nulls") === g.getLong(2), s"nulls($c)")
      assert(r.getAs[Double]("null_pct") === g.getDouble(3), s"null_pct($c)")
      assert(r.getAs[Long]("unique") === g.getLong(4), s"unique($c)")
    }
  }

  test("quality issues output matches the reference run (empty)") {
    assume(refRunOk, "reference python run unavailable")
    assert(result.issues.count() === 0L)
  }

  /** The real input has no duplicates / critical-missing rows, so those
    * paths are exercised on a constructed fixture: keep-FIRST semantics,
    * imputation, critical drop, validation side-output. */
  test("dedup keep-first, imputation, critical drop on fixture") {
    import spark.implicits._
    val raw = Seq(
      // (keyword, name, url, supplier, price, city, state, dispid, rating)
      ("led tv", "TV A", "https://x.com/a", "S1", "₹ 1,000/Piece", "chennai", "tamilnadu", "1", "4.0"),
      ("led tv", "TV A dup", "https://x.com/a", "S1", "₹ 2,000/Piece", null, null, "1", "9.9"), // dup key (url,dispid) → dropped, keep-first
      ("led tv", null, "https://x.com/b", "S2", "Ask Price", null, null, "2", null),            // missing product_name → issue + dropped
      ("oven", "Oven Z", "notaurl", "S3", "₹ 0/Unit", "pune", "maharashtra", "3", "-1")          // invalid url + price<=0 + rating<0 issues
    ).toDF("search_keyword", "product_name", "product_url", "supplier_name",
      "price", "city", "state", "dispid", "rating")
    val r = CleanPipeline.run(raw, None)
    val clean = r.clean.orderBy($"dispid").collect()
    assert(clean.length === 2) // dup dropped, missing-name dropped
    val first = clean(0)
    assert(first.getAs[Double]("price_numeric") === 1000.0) // keep-FIRST, not the 2000 dup
    assert(first.getAs[String]("state") === "Tamil Nadu")
    assert(first.getAs[String]("supplier_region") === "South")
    val last = clean(1)
    assert(last.getAs[String]("city") === "Pune")
    assert(last.getAs[String]("price_bucket") === "Low (<10k)")
    val issues = r.issues.orderBy($"row_index", $"issue").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSeq
    // validation runs BEFORE dedup (run_pipeline order) — the dup row's
    // out-of-range rating is still reported
    assert(issues === Seq(
      (1L, "rating_out_of_range"), (2L, "missing_product_name"),
      (3L, "invalid_product_url"), (3L, "non_positive_price"), (3L, "rating_out_of_range")))
  }

  test("scraped_at backfill when column entirely null (etl.py:243-252)") {
    import spark.implicits._
    val raw = Seq(("a", "P", "S", null: String), ("b", "Q", "T", null: String))
      .toDF("search_keyword", "product_name", "supplier_name", "scraped_at")
    val r = CleanPipeline.run(raw, Some("2026-02-01T08:53:01.165824+00:00"))
    val ts = r.clean.select($"scraped_at".cast("string")).distinct().collect()
    assert(ts.length === 1)
    assert(ts(0).getString(0) === "2026-02-01 08:53:01.165824")
  }
}
