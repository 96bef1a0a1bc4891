package graft.sources

import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The reference's source/sink surface (SURVEY.md §2.1) on Spark readers
  * and writers. Parquet is the canonical interchange (columnar scans,
  * pushdown, pruning); CSV/JSONL are kept for reference fidelity.
  */
object Sources {

  /** S1 — raw listing CSV scan with the declared 24-column schema
    * (never inferSchema; pandas-style quoting). */
  def readRawCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true").option("multiLine", "true")
      .option("quote", "\"").option("escape", "\"")
      .schema(Schemas.raw)
      .csv(path)

  /** S1 — clean CSV scan: "NaN" sentinels → null, then declared types. */
  def readCleanCsv(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val g = spark.read
      .option("header", "true").option("multiLine", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("nullValue", "NaN")
      .csv(path)
    Schemas.clean.fields.foldLeft(g) { (d, f) =>
      if (d.columns.contains(f.name)) d.withColumn(f.name, col(f.name).try_cast(f.dataType))
      else d
    }
  }

  /** S1 robustness variant: PERMISSIVE parse capturing malformed lines in
    * `_corrupt_record` instead of nulling them silently — at 100 TB of
    * scraped CSV, quarantining bad rows (write the corrupt column to a
    * side table) beats both failing the job (FAILFAST) and losing rows
    * (DROPMALFORMED). */
  def readRawCsvPermissive(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField}
    val withCorrupt = org.apache.spark.sql.types.StructType(
      Schemas.raw.fields :+ StructField("_corrupt_record", StringType))
    spark.read
      .option("header", "true").option("multiLine", "true")
      .option("quote", "\"").option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
  }

  /** S2 — CSV sink with the reference's literal-"NaN" missing convention
    * (etl.py:419). Quotes escape by DOUBLING (escape = quote), matching
    * both the pandas writer this mirrors and every reader in this file —
    * Spark's default backslash escape would round-trip clean through
    * Spark alone but mis-parse under readRawCsv/readCleanCsv and any
    * RFC-4180 consumer. */
  def writeCsvNaN(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("nullValue", "NaN")
      .option("quote", "\"").option("escape", "\"")
      .csv(path)

  /** S3 — append-mode sink (the scraper's incremental per-keyword writes,
    * scraper.py:568-573). On parquet, append is transactional per task via
    * the file-commit protocol — no header-if-new-file dance needed. */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** S4 — JSONL sink (scraper.py:532-536): one JSON object per line. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** S4 read side — JSONL scan with a DECLARED schema (the twin of
    * [[readRawCsv]]; never inferSchema — a schema-inference pass over
    * 100 TB of JSONL is a full extra scan). */
  def readJsonl(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S5 — DB-table sink (the reference's SQLite `to_sql("products",
    * if_exists="replace")`, etl.py:428-435): a managed catalog table,
    * replace ≡ overwrite. */
  def writeTable(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).saveAsTable(table)

  /** S5 literal variant — JDBC sink (the reference writes through a DB
    * driver; `saveAsTable` above maps the SEMANTICS, this maps the
    * mechanism). `overwrite` + truncate-off reproduces
    * `if_exists="replace"` exactly: drop, recreate, insert. No JDBC
    * driver ships in this environment, so the spec covers the builder
    * wiring via the writer's format/options (the execution path is
    * Spark's own jdbc connector). */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    props.foldLeft(w) { case (b, (k, v)) => b.option(k, v) }.save()
  }

  /** Columnar-sink alternative — ORC (same writer surface as parquet;
    * useful when the downstream warehouse is ORC-native). Round-trips
    * through the declared schema like every other source here. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** The 100 TB fact-table layout: write partitioned by a low-cardinality
    * derived key (e.g. event date) so date-bounded queries PRUNE
    * partitions at planning time instead of scanning and filtering.
    * `PartitionedLayoutSpec` asserts the pruning (PartitionFilters
    * non-empty, unselected partitions never read). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** S6 — SQL scan over the catalog (check_db.py:7-16). */
  def tableCounts(spark: SparkSession, table: String): (Long, DataFrame) = {
    val n = spark.sql(s"SELECT COUNT(*) AS n FROM $table").collect()(0).getLong(0)
    (n, spark.sql(s"SELECT * FROM $table LIMIT 5"))
  }
}
