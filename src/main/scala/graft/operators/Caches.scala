package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Registry for DataFrames the operators cache internally (minhash/simhash
  * sketches, shingle sets, LSH buckets). The pair operators cache an
  * intermediate that feeds both sides of a self-join; the returned plan is
  * lazy, so the operator itself can never know when it is safe to
  * unpersist. Long-lived sessions call [[unpersistAll]] between queries
  * (Verify and Bench do) — otherwise cached partitions accumulate until
  * memory/disk pressure evicts them.
  *
  * What the registry holds matters: the Dataset object an operator caches
  * is often unreachable the moment the operator returns (the returned
  * plan references only its LOGICAL PLAN), while Spark's CacheManager
  * pins the cached data regardless — so a weak reference to the Dataset
  * would silently make unpersistAll a no-op after any GC. The registry
  * therefore keeps the logical plan (small, strongly held) and uncaches
  * by plan through the cache manager. Sessions are weak KEYS only — a
  * stopped session must not be pinned.
  */
object Caches {

  private val refs =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.ArrayBuffer[LogicalPlan]]()

  /** Cache `df` and remember its plan for later [[unpersistAll]]. */
  def register(df: DataFrame): DataFrame = synchronized {
    var buf = refs.get(df.sparkSession)
    if (buf == null) {
      buf = scala.collection.mutable.ArrayBuffer.empty[LogicalPlan]
      refs.put(df.sparkSession, buf)
    }
    // the ANALYZED plan — CacheManager matches cache entries by analyzed-
    // plan sameResult, which is what Dataset.unpersist passes it too
    buf += df.queryExecution.analyzed
    df.cache()
  }

  /** Uncache every operator-cached plan of every live session registered
    * so far. */
  def unpersistAll(blocking: Boolean = false): Unit = synchronized {
    refs.forEach { (spark, plans) =>
      plans.foreach(p =>
        org.apache.spark.sql.graftshim.ColumnShim.uncache(spark, p, blocking))
    }
    refs.clear()
  }

  /** Uncache only the given session's operator caches. */
  def unpersistAll(spark: SparkSession, blocking: Boolean): Unit = synchronized {
    val buf = refs.remove(spark)
    if (buf != null) buf.foreach(p =>
      org.apache.spark.sql.graftshim.ColumnShim.uncache(spark, p, blocking))
  }
}
