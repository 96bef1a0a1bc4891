package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry for DataFrames the operators cache internally (minhash/simhash
  * sketches, shingle sets, LSH buckets). The pair operators cache an
  * intermediate that feeds both sides of a self-join; the returned plan is
  * lazy, so the operator itself can never know when it is safe to
  * unpersist. Long-lived sessions call [[unpersistAll]] between queries
  * (Verify and Bench do) — otherwise cached partitions accumulate until
  * memory/disk pressure evicts them.
  */
object Caches {

  private val refs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Cache `df` and remember it for later [[unpersistAll]]. */
  def register(df: DataFrame): DataFrame = synchronized {
    refs += df
    df.cache()
  }

  /** Unpersist every operator-cached DataFrame registered so far. */
  def unpersistAll(blocking: Boolean = false): Unit = synchronized {
    refs.foreach(_.unpersist(blocking))
    refs.clear()
  }
}
