package graft.quality

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** build_profile_report (etl.py:379-400) — per-column dtype, null and
  * distinct stats plus 3 sample values, sorted by null% desc.
  *
  * The stats for ALL columns are computed in ONE distributed aggregate job
  * (count/countDistinct per column in a single `agg`), not a per-column
  * loop — the reference's O(columns) pandas passes collapse into one scan.
  * Samples (3 values per column) are one TakeOrdered job per column when an
  * order column is given (full scan per column, no sort materialization) —
  * fine for report-sized use; at 100 TB drop the ordering (arbitrary
  * `limit(3)` short-circuits on the first file split) or sample upstream.
  */
object Profiler {

  def profile(df: DataFrame, orderCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val cols = df.columns.filterNot(orderCol.contains).toSeq

    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"uq_$c"))
    } :+ count(lit(1)).as("rows")
    val stat = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = stat.getAs[Long]("rows")

    val samples: Map[String, String] = cols.map { c =>
      val base = df.filter(col(c).isNotNull)
      val ordered = orderCol.fold(base)(oc => base.orderBy(col(oc)))
      val vals = ordered.select(col(c).cast(StringType)).limit(3)
        .collect().map(_.getString(0))
      c -> vals.mkString(" | ")
    }.toMap

    val rows = cols.map { c =>
      val nonNull = stat.getAs[Long](s"nn_$c")
      val nulls = n - nonNull
      val nullPct =
        if (n == 0) 0.0
        else BigDecimal(nulls.toDouble / n * 100).setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble
      Row(c, df.schema(c).dataType.simpleString, n, nonNull, nulls, nullPct,
        stat.getAs[Long](s"uq_$c"), samples(c))
    }

    val schema = StructType(Seq(
      StructField("column", StringType), StructField("dtype", StringType),
      StructField("rows", LongType), StructField("non_null", LongType),
      StructField("nulls", LongType), StructField("null_pct", DoubleType),
      StructField("unique", LongType), StructField("sample_values", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.sortBy(r => -r.getDouble(5)), 1), schema)
  }
}
