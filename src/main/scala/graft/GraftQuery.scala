package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark implementation plus (when SQL-expressible)
  * a DuckDB-runnable oracle over the same parquet tables.
  *
  * Determinism contract (driver hash-compares sorted-by-name columns):
  *  - every query ends in a total ORDER BY (full tie-break) in BOTH engines;
  *  - aggregate sums go through DECIMAL (exact, order-independent) and are
  *    cast back to DOUBLE so the value AND the schema match DuckDB's;
  *  - every computed column is aliased identically in both engines;
  *  - timestamps are emitted as formatted strings (parquet UTC-adjusted
  *    timestamps vs DuckDB naive timestamps would otherwise diverge).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
