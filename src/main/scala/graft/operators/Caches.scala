package graft.operators

import java.lang.ref.WeakReference

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for DataFrames the operators cache internally (minhash/simhash
  * sketches, shingle sets, LSH buckets). The pair operators cache an
  * intermediate that feeds both sides of a self-join; the returned plan is
  * lazy, so the operator itself can never know when it is safe to
  * unpersist. Long-lived sessions call [[unpersistAll]] between queries
  * (Verify and Bench do) — otherwise cached partitions accumulate until
  * memory/disk pressure evicts them.
  *
  * The registry is keyed per SparkSession (weakly — it must never pin a
  * stopped session) and holds WEAK references to the DataFrames: a user
  * who never calls unpersistAll leaks no plans through this object, and
  * collected DataFrames' cached blocks are reclaimed by Spark's
  * ContextCleaner as usual.
  */
object Caches {

  private val refs =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.ArrayBuffer[WeakReference[DataFrame]]]()

  /** Cache `df` and remember it for later [[unpersistAll]]. */
  def register(df: DataFrame): DataFrame = synchronized {
    var buf = refs.get(df.sparkSession)
    if (buf == null) {
      buf = scala.collection.mutable.ArrayBuffer.empty[WeakReference[DataFrame]]
      refs.put(df.sparkSession, buf)
    }
    buf += new WeakReference(df)
    df.cache()
  }

  /** Unpersist every still-reachable operator-cached DataFrame of every
    * session registered so far. */
  def unpersistAll(blocking: Boolean = false): Unit = synchronized {
    refs.values.forEach(_.foreach(r => Option(r.get).foreach(_.unpersist(blocking))))
    refs.clear()
  }

  /** Unpersist only the given session's operator caches. */
  def unpersistAll(spark: SparkSession, blocking: Boolean): Unit = synchronized {
    val buf = refs.remove(spark)
    if (buf != null) buf.foreach(r => Option(r.get).foreach(_.unpersist(blocking)))
  }
}
