package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ — the PERSISTED form of the IVFADC architecture
  * (Jégou et al., "Product quantization for nearest neighbor search")
  * that `q_ivfpq_search` runs in-session: a coarse inverted file whose
  * cells become parquet partition directories, with each vector stored
  * as M small subspace codes instead of 4·d vector bytes. At 100 TB
  * this is the artifact that makes ANN serving cheap twice over — a
  * probe of c cells is a PARTITION-PRUNED directory scan (never the
  * corpus), and the scanned bytes are codes, not vectors (the ~64×
  * storage cut at M = 4, d = 64); true vectors are fetched only for
  * the shortlist ids the ADC scan survives, from whatever (id → vector)
  * store the caller keeps.
  *
  * Everything runs in the exact shifted-integer arithmetic of
  * [[FixedPointKMeans]] (same coarse Lloyd, same residual shift
  * [[FixedPointKMeans.RShift]], same fused argmin kernels), so the
  * codes this object writes are bit-identical to the ones the
  * oracle-gated q_ivfpq_search computes at the same parameters —
  * the persisted layout adds storage shape, not new semantics. */
object IvfPq {

  /** The trained model: coarse centroids, per-subspace residual
    * codebooks, subspace width. Driver-bounded (k·d + M·k·subD longs —
    * the BPE-merge collect discipline); broadcastable to any search. */
  final case class Model(coarse: Seq[(Int, Seq[Long])],
      books: Seq[Seq[(Int, Seq[Long])]], subD: Int) {
    def m: Int = books.length
  }

  /** The SHIFTED residual of a quantized vector against its assigned
    * coarse centroid — one map-side zip against a k×d literal map. */
  private def residual(vCol: Column, clusterCol: Column,
      coarse: Seq[(Int, Seq[Long])]): Column =
    zip_with(vCol,
      element_at(typedLit(coarse.map { case (j, c) => j -> c }.toMap),
        clusterCol),
      (a, b) => a - b + lit(FixedPointKMeans.RShift))

  /** The `m` subspace codebook fits over `vCol` slices of `rel` —
    * independent job chains submitted CONCURRENTLY (the scheduler
    * interleaves their stages; wall-clock of one fit, not `m`).
    * `rel` must carry (vec_id, `vCol`). */
  def fitBooks(rel: DataFrame, vCol: String, m: Int, subD: Int,
      k: Int, rounds: Int): Seq[Seq[(Int, Seq[Long])]] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(
      Future.sequence((0 until m).toList.map { mm => Future {
        FixedPointKMeans.fit(
          rel.select(col("vec_id"),
            slice(col(vCol), mm * subD + 1, subD).as("v")),
          "vec_id", "v", k, rounds)
      }}), scala.concurrent.duration.Duration(600, "s"))
  }

  /** Train coarse quantizer + residual codebooks over an
    * already-quantized (idCol, vCol) relation (cache it — the coarse
    * fit, the assignment and every codebook fit scan it). */
  def fit(quant: DataFrame, idCol: String, vCol: String, kCoarse: Int,
      m: Int, subD: Int, kCodes: Int, rounds: Int): Model = {
    val coarse = FixedPointKMeans.fit(quant, idCol, vCol, kCoarse, rounds)
    val res = Caches.register(FixedPointKMeans.assign(quant, vCol, coarse)
      .select(col(idCol).as("vec_id"),
        residual(col(vCol), col("cluster"), coarse).as("rv")))
    Model(coarse, fitBooks(res, "rv", m, subD, kCodes, rounds), subD)
  }

  /** (original columns, cluster, c0..c{M-1}): primary cell + the M
    * subspace codes — one map-side pass of fused argmins. */
  def encode(quant: DataFrame, vCol: String, model: Model): DataFrame = {
    val asg = FixedPointKMeans.assign(quant, vCol, model.coarse).drop("dist")
    val withR = asg.withColumn("rv",
      residual(col(vCol), col("cluster"), model.coarse))
    (0 until model.m).foldLeft(withR) { (df, mm) =>
      df.withColumn(s"c$mm", FixedPointKMeans.bestOf(
        slice(col("rv"), mm * model.subD + 1, model.subD),
        model.books(mm))("j"))
    }.drop("rv")
  }

  /** Write the compressed inverted file: (id, c0..c{M-1}) partitioned
    * by `ivf_cell` — the "inverted file" as directories, the codes as
    * the only per-vector payload. NO vector bytes land in the index. */
  def writeIndex(quant: DataFrame, idCol: String, vCol: String,
      model: Model, path: String): Unit =
    encode(quant, vCol, model)
      .select(col(idCol) +:
        (0 until model.m).map(mm => col(s"c$mm")) :+
        col("cluster").as("ivf_cell"): _*)
      .write.partitionBy("ivf_cell").mode("overwrite").parquet(path)

  /** ADC search over a [[writeIndex]] layout: probe the query's
    * `nProbe` nearest cells (a pruned directory scan — the cell list
    * is a partition predicate), score codes through per-(cell,
    * subspace) lookup tables built driver-side from the model
    * (nProbe·M·k entries — query-bounded, the classical ADC table
    * build), shortlist by table-sum distance, then exact integer-L2
    * re-rank against `vectors` (an (idCol, vCol) quantized relation —
    * the caller's id → vector store) for the final k. Returns
    * (idCol, adc_dist, dist) ordered by (dist, id). */
  def searchIndex(spark: SparkSession, path: String, model: Model,
      query: Seq[Long], nProbe: Int, shortlistN: Int,
      vectors: DataFrame, idCol: String, vCol: String, k: Int): DataFrame = {
    require(nProbe >= 1 && shortlistN >= k,
      s"nProbe=$nProbe shortlist=$shortlistN k=$k")
    val cells = model.coarse
      .map { case (j, c) => (j, FixedPointKMeans.sqDistLocal(query, c)) }
      .sortBy { case (j, d) => (d, j) }.take(nProbe).map(_._1)
    val idx = spark.read.parquet(path)
      .filter(col("ivf_cell").isin(cells: _*))
    // LUT key packs (cell, code) into one long; k ≤ codebook size keeps
    // the packing collision-free for any cell id below the multiplier
    val packW = (model.books.map(_.size).max + 1).toLong
    val adc = (0 until model.m).map { mm =>
      val entries = cells.flatMap { cell =>
        val cent = model.coarse.find(_._1 == cell).get._2
        val qres = query.zip(cent)
          .map { case (a, b) => a - b + FixedPointKMeans.RShift }
        val qs = qres.slice(mm * model.subD, (mm + 1) * model.subD)
        model.books(mm).map { case (j, c) =>
          (cell.toLong * packW + j, FixedPointKMeans.sqDistLocal(qs, c)) }
      }
      element_at(
        map_from_arrays(typedLit(entries.map(_._1).toArray),
          typedLit(entries.map(_._2).toArray)),
        col("ivf_cell").cast("long") * packW + col(s"c$mm").cast("long"))
    }.reduce(_ + _)
    val short = idx.select(col(idCol), adc.as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol)).limit(shortlistN)
    short.join(vectors.select(col(idCol), col(vCol)), Seq(idCol))
      .select(col(idCol), col("adc_dist"),
        FixedPointKMeans.bestOf(col(vCol), Seq((0, query)))("d").as("dist"))
      .orderBy(col("dist"), col(idCol)).limit(k)
  }
}
