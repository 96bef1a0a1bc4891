package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel assembly over an event log. */
object Funnels {

  /** Per-key first-entry timestamps through an ordered stage chain: a
    * key enters stage i+1 only with an event STRICTLY AFTER its stage-i
    * entry (an event sharing the previous stage's timestamp does not
    * count — simultaneous events cannot prove ordering). Returns one row
    * per key that completed stage 1, with one nullable timestamp column
    * `ts_<stage>` per stage.
    *
    * Scale: one partial-aggregated groupBy per stage, all on the SAME
    * key shuffle; stage i+1's input joins stage i's (per-key, 1-row)
    * relation, so each later stage shrinks. No windows, no sort. */
  def orderedStages(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "stages must name at least one event type")
    require(stages.distinct == stages, s"stages repeat: $stages")
    def stageTs(s: String) = s"ts_$s"
    // fail fast, not with an AMBIGUOUS_REFERENCE mid-chain: a pre-
    // enriched log already carrying a ts_<stage> column would collide
    // with the generated stage columns at the join
    val clash = stages.map(stageTs).filter(events.columns.contains)
    require(clash.isEmpty,
      s"events already has column(s) ${clash.mkString(", ")} — rename them " +
        "or the generated stage columns would be ambiguous")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as(stageTs(stages.head)))
    stages.sliding(2).foldLeft(first) {
      case (acc, Seq(prev, next)) =>
        val nextTs = events.filter(col(typeCol) === next)
          .join(acc.select(col(keyCol), col(stageTs(prev))), keyCol)
          .filter(col(tsCol) > col(stageTs(prev)))
          .groupBy(col(keyCol)).agg(min(col(tsCol)).as(stageTs(next)))
        acc.join(nextTs, Seq(keyCol), "left")
      case (acc, _) => acc // single-stage chain: sliding emits the lone head
    }
  }
}
