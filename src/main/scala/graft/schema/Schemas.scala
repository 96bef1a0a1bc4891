package graft.schema

import org.apache.spark.sql.types._

/** Declared-and-enforced schemas (SURVEY.md §1.3): a hand-written
  * StructType per stage is the single source of truth; never inferSchema,
  * mirroring the reference's enforce-don't-infer stance
  * (scraper.py:523-529, etl.py:403-408). */
object Schemas {

  /** RawListing — 24 columns, all ingested as strings
    * (CrawlConfig.schema, scraper.py:128-154). */
  val rawColumns: Seq[String] = Seq(
    "search_keyword", "product_name", "product_url", "supplier_name",
    "supplier_url", "price", "phone", "city", "state", "locality",
    "location_ui", "rating", "image", "catid", "mcatid", "itemid",
    "dispid", "brand", "capacity", "power", "ac_type", "function_type",
    "isq_attributes", "scraped_at")

  val raw: StructType =
    StructType(rawColumns.map(StructField(_, StringType, nullable = true)))

  /** CleanListing — 17 columns (ETLConfig.final_columns, etl.py:48-66). */
  val finalColumns: Seq[String] = Seq(
    "search_keyword", "product_name", "supplier_name", "city", "state",
    "supplier_region", "rating", "price_numeric", "price_unit",
    "price_bucket", "product_url", "supplier_url", "catid", "mcatid",
    "itemid", "dispid", "scraped_at")

  val clean: StructType = StructType(Seq(
    StructField("search_keyword", StringType),
    StructField("product_name", StringType),
    StructField("supplier_name", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("supplier_region", StringType),
    StructField("rating", DoubleType),
    StructField("price_numeric", DoubleType),
    StructField("price_unit", StringType),
    StructField("price_bucket", StringType),
    StructField("product_url", StringType),
    StructField("supplier_url", StringType),
    StructField("catid", LongType),
    StructField("mcatid", LongType),
    StructField("itemid", LongType),
    StructField("dispid", LongType),   // reaches 2.86e12 — Long, not Int
    StructField("scraped_at", TimestampType)))

  /** Quality-issues side output (etl.py:315-346). */
  val issues: StructType = StructType(Seq(
    StructField("row_index", LongType, nullable = false),
    StructField("issue", StringType, nullable = false)))
}
