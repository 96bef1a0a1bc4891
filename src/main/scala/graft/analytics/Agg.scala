package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared oracle-parity aggregate helpers (see GraftQuery's determinism
  * contract): exact decimal summation so results are independent of
  * partition/accumulation order and bit-identical to DuckDB's. */
private[analytics] object Agg {

  /** Exact order-independent sum: double -> decimal -> sum -> double.
    * Double summation order varies with partitioning; decimal summation is
    * exact so the result is bit-identical to DuckDB's same-shaped SUM. */
  def sumDec(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Mean with deterministic float math: exact decimal sum, one double
    * division, one round — the same three steps the oracle SQL does. */
  def avgDec(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(DecimalType(18, scale))).cast(DoubleType) / count(lit(1)), 6)

  /** TPC-H revenue: exact decimal sum of price·(1−discount), as double.
    * One definition — a precision change here reaches every query AND
    * must be mirrored in each query's oracle SQL. */
  def revenueDec(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) - discount.cast(DecimalType(18, 2))))
      .cast(DoubleType)
}
