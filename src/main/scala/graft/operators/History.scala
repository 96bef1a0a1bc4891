package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-history operators: assemble slowly-changing-dimension
  * views from append-only event logs.
  */
object History {

  /** Type-2 history: collapse consecutive equal values of `valueCol`
    * per `keyCol` into versioned validity runs. Rows are sequenced by
    * `orderCols` — pass a TOTAL order (e.g. timestamp + unique id):
    * under a partial order, run boundaries depend on physical row order,
    * which is not a distributed concept. Sequencing values must also be
    * NON-NULL: nulls sort FIRST under Spark's ascending order while
    * `min(orderCols.head)` skips them, so a run whose first row has a
    * null sequencing value would report a later valid_from than its
    * actual start (and the neighboring run's exclusive valid_to bound
    * would disagree with the run boundary). A null sequencing value
    * therefore FAILS LOUDLY at runtime (per-row raise_error guard, map
    * side, no extra pass) — filter or coalesce null timestamps upstream.
    *
    * Returns (keyCol, version, valueCol, valid_from, valid_to, n_rows):
    * version numbers runs 1..k per key, valid_from is the run's first
    * `orderCols.head` value, valid_to the NEXT run's (null for the open
    * current run — gaps-and-islands with exclusive upper bounds).
    *
    * Null values are a DISTINCT state, not absorbed into neighbors:
    * change detection is null-safe (`<=>`), so the four rows
    * x→null→null→x yield THREE runs of sizes 1/2/1 — a nullable
    * dimension value gets consistent history regardless of what precedes
    * a null stretch.
    *
    * Scale: two windows and one aggregate, all partitioned by `keyCol` —
    * per-key data volume bounds the sort, never the corpus. The second
    * window runs over the collapsed (key, version) relation, which is at
    * most runs-per-key rows. */
  def scd2(df: DataFrame, keyCol: String, valueCol: String,
      orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must name at least one sequencing column")
    // null sequencing values silently corrupt run boundaries (see doc
    // above) — guard each order column with a raise_error that fires on
    // the first null row it meets, before any window runs
    val guarded = orderCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c).isNull,
        raise_error(lit(s"History.scd2: null in sequencing column '$c' — " +
          "null order values are unsupported (nulls sort first and break " +
          "run boundaries); filter or coalesce them upstream")))
        .otherwise(col(c)))
    }
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val prev = lag(col(valueCol), 1).over(w)
    // row_number distinguishes "first row of the key" from "previous
    // value was null" — prev.isNull conflates them, silently folding a
    // null run into its predecessor while splitting consecutive nulls
    val runs = guarded
      .withColumn("_chg",
        when(row_number().over(w) === 1 || !(prev <=> col(valueCol)), 1).otherwise(0))
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("version"))
      .agg(min(col(valueCol)).as(valueCol), // constant within a run
        min(col(orderCols.head)).as("valid_from"),
        count(lit(1)).as("n_rows"))
    val wv = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .select(col(keyCol), col("version"), col(valueCol),
        col("valid_from"), col("valid_to"), col("n_rows"))
  }
}
