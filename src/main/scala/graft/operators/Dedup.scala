package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operator family for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale notes (100 TB):
  *  - exact dedup is one shuffle on the 16-byte fingerprint — the text
  *    itself never shuffles;
  *  - MinHash/LSH shuffles (id, band-hash) pairs, O(docs × bands) small
  *    rows; candidate verification touches only bucket-mates;
  *  - SimHash is map-only per doc (64-bit sketch), pairs come from
  *    banding the sketch the same way;
  *  - everything is expression-level — no UDF, no driver collect.
  */
object Dedup {

  /** Default document-frequency cap for the blocked pair generators: a
    * blocking key (shingle / fingerprint / LSH bucket) occurring in more
    * than this many docs is dropped before the self-join. Rationale: a
    * key shared by f docs contributes f·(f-1)/2 candidate rows ON ONE
    * REDUCER — at 10k that is ~5·10⁷ rows from a single key, the classic
    * skewed-corpus scale-killer — while a key common to 10k documents
    * (boilerplate, stop-shingles) carries no near-duplicate signal. */
  val DefaultMaxDf = 10000

  /** Drop rows whose blocking key occurs more than `maxDf` times.
    * `maxDf <= 0` disables the cap. One partial-aggregated pass computes
    * per-key frequency (tiny: map-side combine reduces to distinct keys),
    * then a semi-join on the same key — which the subsequent self-join
    * also shuffles on, so the exchange is reused. Hot keys are never
    * buffered anywhere (no window over the key). */
  private[operators] def dropHotKeys(
      keyed: DataFrame, keyCols: Seq[String], maxDf: Int): DataFrame =
    if (maxDf <= 0) keyed
    else {
      val kept = keyed.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= maxDf)
        .select(keyCols.map(col): _*)
      keyed.join(kept, keyCols, "left_semi")
    }

  /** Exact near-duplicate groups via normalized-content fingerprint:
    * keep the min-id doc per group, count members. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Survivors of exact dedup (the keep side of [[exactGroups]]). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextAnalysis.fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash signatures as a DataFrame (id, sig):
    *  1. shingle hashes materialize ONCE per doc (native ShingleHashes64
    *     kernel — xxhash64 of the space-joined shingle bytes);
    *  2. the `numHashes` functions derive from the base hash via cheap
    *     long re-hashing (universal-hash style, native MinHashSignature
    *     kernel) — never re-tokenizing.
    * Both steps are fused imperative loops (graft.expressions
    * .TextHashKernels), bit-identical to the declarative HOF formulation
    * but without its per-element interpretation cost. */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int, portable: Boolean = false): DataFrame =
    df.select(col(idCol).as("id"),
        graft.expressions.TextHashExprs.minhashSignature(
          graft.expressions.TextHashExprs.shingleHashes64(
            TextAnalysis.tokens(col(textCol)), k, portable),
          numHashes, portable).as("sig"))

  /** LSH candidate pairs from a signature DF: band the signature (`bands`
    * bands of rowsPerBand rows), bucket-join docs sharing any band hash.
    * Buckets with more than `maxBucket` members are dropped before the
    * join ([[dropHotKeys]]): a bucket of f docs yields f²/2 candidates on
    * one reducer, and an over-full bucket means the band hash has
    * degenerated (boilerplate corpus) — it no longer separates near-dups
    * from the crowd. Returns (id_a, id_b) with id_a < id_b, distinct. */
  def lshCandidates(sig: DataFrame, bands: Int, rowsPerBand: Int,
      maxBucket: Int = DefaultMaxDf, portable: Boolean = false): DataFrame = {
    require(bands > 0 && rowsPerBand > 0,
      s"bands=$bands rowsPerBand=$rowsPerBand must be positive")
    // band key: xxhash64 of the slice by default; in PORTABLE mode a
    // base-131 fold of the slots seeded with the band index — the same
    // arithmetic DuckDB runs as list_reduce(list_prepend(band, slice),
    // (acc, s) -> (acc*131 + s) % 1000000007)
    val bandKey: Int => Column =
      if (portable) b =>
        aggregate(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand),
          lit(b.toLong),
          (acc, v) => (acc * lit(131L) + v) % lit(graft.expressions.TextHashKernels.PortableMod))
      else b =>
        xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b))
    val banded = dropHotKeys(
      sig.select(col("id"), posexplode(array((0 until bands).map(bandKey): _*)))
        .toDF("id", "band", "bhash"),
      Seq("band", "bhash"), maxBucket)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Compatibility wrapper: signatures + banded candidates. */
  def minhashLshCandidates(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 32, bands: Int = 8,
      maxBucket: Int = DefaultMaxDf, portable: Boolean = false): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands=$bands must divide numHashes=$numHashes (trailing slots would be silently ignored)")
    lshCandidates(minhashSignatures(df, idCol, textCol, k, numHashes, portable), bands,
      numHashes / bands, maxBucket, portable)
  }

  /** MinHash-estimated Jaccard for candidate pairs (fraction of agreeing
    * signature positions), filtered at `threshold`. The signature DF is
    * cached — it feeds the banding AND both sides of the verify join
    * (numDocs × numHashes longs; small relative to the corpus even at
    * billions of docs). */
  def minhashDedupPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.6, maxBucket: Int = DefaultMaxDf,
      portable: Boolean = false): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands=$bands must divide numHashes=$numHashes (trailing slots would be silently ignored)")
    val sig = Caches.register(minhashSignatures(df, idCol, textCol, k, numHashes, portable))
    minhashPairsFromSignatures(sig, numHashes, bands, threshold, maxBucket, portable)
  }

  /** Banding + verification over an EXISTING signature relation (id,
    * sig) — the path a maintained minhash INDEX takes: signatures are
    * the persisted artifact (numHashes longs per doc, not the text), so
    * an incremental batch bands against index + batch signatures without
    * ever re-shingling history. Same candidate/verify semantics as
    * [[minhashDedupPairs]], which now delegates here. */
  def minhashPairsFromSignatures(
      sig: DataFrame, numHashes: Int, bands: Int,
      threshold: Double, maxBucket: Int = DefaultMaxDf,
      portable: Boolean = false): DataFrame = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands=$bands must divide numHashes=$numHashes (trailing slots would be silently ignored)")
    val cand = lshCandidates(sig, bands, numHashes / bands, maxBucket, portable)
    cand
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      // signature agreement via the fused native kernel — the HOF fold
      // (zip_with + when + aggregate) paid an interpreted lambda per
      // candidate pair × numHashes slots; identical integer result
      .withColumn("est_jaccard",
        call_function("graft_eq_count", col("sig_a"), col("sig_b"))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }


  /** Exact n-gram Jaccard for all pairs sharing at least one shingle:
    * explode-join-count — integer arithmetic end to end, so it doubles as
    * a DuckDB-comparable oracle query. Blocking by shared shingle keeps it
    * far below the full cross product.
    *
    * Shingles present in more than `maxDf` docs are removed from the
    * fingerprint space FIRST (stop-shingle removal, [[dropHotKeys]]):
    * both the intersection and the union are computed over the capped
    * set, so the Jaccard stays internally consistent. A shingle common
    * to thousands of docs is corpus boilerplate — it inflates every
    * pair's similarity equally while generating df² join rows on a
    * single reducer. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, minJaccard: Double = 0.5,
      maxDf: Int = DefaultMaxDf): DataFrame = {
    // cache BOTH sides of the cap: the raw exploded set feeds the df
    // pass AND the semi-join left side (tokenize + shingle-hash would
    // otherwise run twice), and the capped set feeds the self-join
    // (twice) plus the per-doc sizes — shingle 64-bit hashes shuffle
    // instead of strings throughout. Storage tradeoff: the raw (id,
    // hash) set is ~16 B/shingle; at corpus sizes where that exceeds
    // cluster cache+spill capacity, drop THIS cache and pay the second
    // kernel pass instead (the capped cache below is what the join
    // performance depends on)
    val raw = Caches.register(df.select(col(idCol).as("id"),
      explode(graft.expressions.TextHashExprs.shingleHashes64(
        TextAnalysis.tokens(col(textCol)), k)).as("shingle")))
    val sh = Caches.register(dropHotKeys(raw, Seq("shingle"), maxDf))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .filter(col("inter") * lit(100) >= col("uni") * lit((minJaccard * 100).toInt))
      .select(col("id_a"), col("id_b"), col("inter").cast(LongType),
        col("uni").cast(LongType))
  }

  /** CONTAINMENT near-dup pairs (asymmetric Jaccard): inter/|smaller| —
    * detects a document INCLUDED in a larger one (quoting, expansion,
    * aggregation pages), which symmetric Jaccard structurally misses: a
    * 100-shingle doc fully contained in a 10000-shingle doc has
    * containment 1.0 but Jaccard < 0.01. Same df-capped shared-shingle
    * blocking and integer arithmetic as [[ngramJaccardPairs]] (the
    * filter cross-multiplies, so no engine compares a derived float);
    * emits (id_a, id_b, inter, n_a, n_b) with id_a < id_b and
    * containment = inter / least(n_a, n_b) ≥ minContainment. */
  def containmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, minContainment: Double = 0.8,
      maxDf: Int = DefaultMaxDf): DataFrame = {
    val raw = Caches.register(df.select(col(idCol).as("id"),
      explode(graft.expressions.TextHashExprs.shingleHashes64(
        TextAnalysis.tokens(col(textCol)), k)).as("shingle")))
    val sh = Caches.register(dropHotKeys(raw, Seq("shingle"), maxDf))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .filter(col("inter") * lit(100) >=
        least(col("n_a"), col("n_b")) * lit((minContainment * 100).toInt))
      .select(col("id_a"), col("id_b"), col("inter").cast(LongType),
        col("n_a").cast(LongType), col("n_b").cast(LongType))
  }

  /** Cross-source content overlap matrix: for every pair of sources, the
    * exact Jaccard of their df-capped k-shingle sets — which providers
    * mirror each other (and therefore double-count under per-source
    * quotas), reported at the SOURCE grain rather than the doc grain of
    * [[ngramJaccardPairs]]. The ground-truth counterpart of the
    * KMV-sketch estimate (q_source_similarity): run this exactly on a
    * sample or per-shard, the sketch everywhere.
    *
    * Scale: the (source, shingle-hash) relation after the doc-level
    * df-cap and per-source distinct is AT MOST sources × distinct
    * shingles but in practice ~the shingle vocabulary; the self-join
    * shuffles on the 8-byte hash, and a shingle surviving the cap joins
    * at most min(maxDf, sources)² source pairs — the same bound that
    * protects the pair generators. Output is ≤ sources²/2 rows; the
    * per-source set sizes broadcast back for the union term. */
  def sourceOverlap(
      df: DataFrame, idCol: String, textCol: String, srcCol: String,
      k: Int = 3, maxDf: Int = DefaultMaxDf): DataFrame = {
    val raw = df.select(col(idCol).as("id"), col(srcCol).as("src"),
      explode(graft.expressions.TextHashExprs.shingleHashes64(
        TextAnalysis.tokens(col(textCol)), k)).as("shingle"))
    // the cap counts DOC-frequency (raw is distinct (doc, shingle) by
    // kernel construction), exactly like the pair generators
    val srcSh = Caches.register(
      dropHotKeys(raw, Seq("shingle"), maxDf)
        .select(col("src"), col("shingle")).distinct())
    val sizes = srcSh.groupBy(col("src")).agg(count(lit(1)).as("n"))
    srcSh.as("a").join(srcSh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("src").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("src").as("src_b"), col("n").as("n_b"))), "src_b")
      .withColumn("jaccard",
        floor(col("n_shared") * lit(1000000.0) / (col("n_a") + col("n_b") - col("n_shared"))
          + lit(0.5)) / 1000000.0)
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("n_a"), col("n_b"), col("jaccard"))
  }

  /** Winnowing-fingerprint near-dup pairs (Schleimer et al., SIGMOD'03):
    * each doc keeps only its window-minimum shingle hashes (~2/(w+1) of
    * them), pairs form on shared fingerprints — the same explode-join as
    * [[ngramJaccardPairs]] over a deterministically-thinned subset, so at
    * 100 TB both the shuffle volume AND the candidate count shrink ~4x at
    * w=7 while any shared run of ≥ w+k-1 tokens is still guaranteed to
    * collide. Returns pairs with the shared-fingerprint count. */
  def winnowPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, minShared: Int = 2,
      maxDf: Int = DefaultMaxDf, portable: Boolean = false): DataFrame = {
    // fingerprints in > maxDf docs are boilerplate, not near-dup signal —
    // drop them before the self-join (see dropHotKeys). The raw explode
    // is cached too: it feeds the df pass and the semi-join left side
    val raw = Caches.register(df.select(col(idCol).as("id"),
      explode(graft.expressions.TextHashExprs.winnowFingerprints(
        TextAnalysis.tokens(col(textCol)), k, w, portable)).as("fp")))
    val fp = Caches.register(dropHotKeys(raw, Seq("fp"), maxDf))
    fp.as("a").join(fp.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_fp"))
      .filter(col("shared_fp") >= minShared)
  }

  /** Connected components over a near-dup pair list: assembles the pairs
    * any of the generators above emit into DEDUP CLUSTERS — (id,
    * component) where component = the minimum id reachable through the
    * pair graph. The min-id member is the canonical survivor; everything
    * else in the component is a duplicate to drop.
    *
    * Min-label propagation: each round every vertex takes the min of its
    * own and its neighbors' labels — one join + one partial-aggregated
    * groupBy on the (tiny relative to the corpus) pair graph, converging
    * in graph-diameter rounds. Near-dup graphs are quasi-cliques, so the
    * convergence count typically stops the loop after 2-3 rounds;
    * `maxIter` bounds adversarial chains — hitting it THROWS, because
    * unconverged labels split real clusters. (Pointer-jumping would give
    * O(log d) rounds but requires a self-join of the checkpointed round
    * result, which trips Spark's relation dedup on LogicalRDD constraint
    * rewrite — not worth it at these diameters.) Only ids appearing in
    * `pairs` are labeled (singletons are their own component trivially).
    *
    * Graphs of at most `driverMaxEdges` UNDIRECTED edges close on the
    * DRIVER via union-find instead (identical labels, O(E α(E)), no
    * rounds; ~16 B of driver heap per edge plus one output Row per
    * vertex — the result relation itself) — see [[driverComponents]];
    * the distributed loop is the above-bound path.
    *
    * SINGLE-WRITER session assumption (loop path only): the rounds run
    * under a session-global spark.sql.shuffle.partitions override
    * (restored in a finally) — a concurrent query planned on the SAME
    * SparkSession during the loop would pick up the graph-sized value.
    * Durable mode additionally repoints the CONTEXT-global checkpoint
    * directory per generation — a concurrent job's checkpoints would
    * land in (and be reclaimed from) this operator's subdirectories.
    * The sequential Verify/Bench harness satisfies this; concurrent use
    * needs a dedicated session. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10,
      driverMaxEdges: Long = 5000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter > 0, s"maxIter=$maxIter must be positive")
    // `checkpointDir = Some(dir)` switches the loop's lineage truncation
    // from executor-memory localCheckpoint to DURABLE checkpoint() on
    // cluster storage: a long multi-round job on a real cluster survives
    // executor loss (localCheckpoint blocks die with their executor and
    // the truncated plan cannot recompute them). Identical labels either
    // way — only the storage of the per-round materialization moves.
    //
    // STORAGE HYGIENE: each checkpoint generation gets its own
    // subdirectory (setCheckpointDir before every checkpoint) and a
    // superseded generation is DELETED as soon as the next one is
    // materialized — Spark never cleans reliable checkpoints itself
    // (spark.cleaner...cleanCheckpoints defaults to false), so a
    // d-round graph would otherwise leave d+2 copies of graph-sized
    // state on cluster storage, unbounded across invocations. Only the
    // returned relation's own checkpoint (and, while the loop runs, the
    // edge set) stays on disk.
    val spark = pairs.sparkSession
    var ckptGen = 0
    def ckptSubdir(gen: Int) = checkpointDir.map(d => s"$d/gen-$gen")
    def rmCkptGen(gen: Int): Unit = ckptSubdir(gen).foreach { d =>
      val path = new org.apache.hadoop.fs.Path(d)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(path, true) // idempotent; false if absent
    }
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointDir.isEmpty) df.localCheckpoint()
      else {
        spark.sparkContext.setCheckpointDir(ckptSubdir(ckptGen).get)
        ckptGen += 1
        df.checkpoint()
      }
    // ids normalize to LongType UP FRONT so both closure paths (driver
    // union-find and distributed loop) return the identical (id long,
    // label long) schema — without this the output type would depend on
    // which path the GRAPH SIZE selected. Non-integral id columns are
    // rejected loudly: a string→long cast yields nulls, which would
    // silently corrupt labels instead of failing.
    Seq("id_a", "id_b").foreach { c =>
      val t = pairs.schema(c).dataType
      require(Seq[org.apache.spark.sql.types.DataType](
          org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
          org.apache.spark.sql.types.IntegerType, LongType).contains(t),
        s"connectedComponents: pair column $c must be an integral id type, got $t")
    }
    // LINEAGE TRUNCATION is the load-bearing detail of the loop: a cached
    // DataFrame still carries its full logical plan, and each round
    // references the previous round TWICE (jump join) — without
    // truncation the plan tree doubles per round and the driver spends
    // seconds re-optimizing it (measured: round 1 cost 11 s on a
    // 256-pair graph). Eager localCheckpoint() pins the rows and cuts
    // the plan to the materialized RDD; a durable `checkpoint()` to
    // cluster storage is the fault-tolerant variant for long jobs.
    val edges = pairs.select(col("id_a").cast(LongType).as("src"),
        col("id_b").cast(LongType).as("dst"))
      .union(pairs.select(col("id_b").cast(LongType).as("src"),
        col("id_a").cast(LongType).as("dst")))
      .distinct()
    val edgesCk = ckpt(edges)
    val nEdges = edgesCk.count() // free — edges is already materialized
    // SMALL-GRAPH FAST PATH: the pair graph is a post-blocking artifact,
    // orders of magnitude smaller than the corpus (a df-capped near-dup
    // pair list, not the documents). Up to `driverMaxEdges` UNDIRECTED
    // edges (~80 MB of primitive longs at the 5M default — one direction
    // streamed into two long arrays, boxing bounded to one partition at a
    // time) a driver-side union-find closes it in one pass + O(E α(E)) —
    // versus ~diameter distributed rounds each paying multi-stage job
    // overhead. Same bounded-driver-state pattern as IvfIndex's sampled
    // Lloyd; the distributed loop below remains the path for graphs that
    // outgrow the bound (specs pin both paths to identical output via
    // driverMaxEdges = 0).
    // ceil: self-loops appear once in the directed relation, and floor
    // division would route a 1-edge graph down the driver path even
    // under driverMaxEdges = 0 (the spec hook that pins the loop path)
    if ((nEdges + 1) / 2 <= driverMaxEdges) {
      // driverComponents materializes into driver arrays and returns a
      // local-rows relation — the edge checkpoint is dead once it returns
      val out = driverComponents(spark, edgesCk)
      rmCkptGen(0)
      return out
    }
    // size the ROUND shuffles to the graph, not the corpus: each of the
    // ~diameter rounds pays per-partition task overhead on every shuffle.
    // One partition per ~250k edges, capped at the session setting so a
    // genuinely huge graph still spreads out.
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val graphParts = math.max(1L, math.min(sessionParts.toLong,
      nEdges / 250000L + 1L)).toInt
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    var labels = ckpt(edgesCk.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")))
    var labelsGen = ckptGen - 1 // the generation holding `labels`
    // convergence detection without a per-round join: the id set is fixed
    // (the union keeps every labeled id in play) and labels only ever
    // DECREASE under min-propagation, so "any label moved" ⇔ "the exact
    // decimal sum of all labels strictly dropped". One tiny aggregate on
    // the just-checkpointed relation replaces a join+filter+count job per
    // round. Decimal(38,0), not long: at corpus scale, billions of ids ×
    // 10^12 magnitudes overflow an int64 sum.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val row = df.agg(count(lit(1)),
        sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      val d = row.getDecimal(1)
      // a null SUM means EITHER an empty graph OR a Decimal(38,0)
      // overflow (sum semantics return null on overflow here) — only the
      // former may read as ZERO: two consecutive overflowed rounds would
      // compare equal and report convergence with wrong labels
      if (d == null) {
        if (row.getLong(0) == 0L) java.math.BigDecimal.ZERO
        else throw new ArithmeticException(
          "connectedComponents: label sum overflowed Decimal(38,0) — " +
            "id magnitudes are too large for sum-based convergence detection")
      } else d
    }
    var prevSum = labelSum(labels)
    var changed = true
    var i = 0
    // maxIter bounds LABEL-MOVING rounds; one extra round runs to CONFIRM
    // convergence (a graph of diameter exactly maxIter converges on its
    // final permitted round, which is only observable one round later)
    try {
      spark.conf.set("spark.sql.shuffle.partitions", graphParts.toString)
      while (changed && i < maxIter + 1) {
        val next = ckpt(edgesCk.join(labels, edgesCk("src") === labels("id"))
          .select(col("dst").as("id"), col("label"))
          .union(labels)
          .groupBy(col("id")).agg(min(col("label")).as("label")))
        val nextSum = labelSum(next)
        changed = nextSum.compareTo(prevSum) != 0
        prevSum = nextSum
        labels = next
        // `next` is materialized (checkpoint is eager) — the previous
        // round's generation is now unreferenced; reclaim it
        rmCkptGen(labelsGen)
        labelsGen = ckptGen - 1
        i += 1
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    // unconverged labels are WRONG labels (one cluster reported as
    // several) — a dedup pipeline must fail loudly, not keep duplicates
    if (changed) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        "— the pair graph has chains longer than maxIter; raise maxIter")
    // the loop is done: the edge set's generation is dead too. Only the
    // final labels' generation remains on disk — it backs the returned
    // relation until the caller consumes it.
    rmCkptGen(0)
    labels
  }

  /** Driver-side closure of a small pair graph: union-find with path
    * compression, unioning the larger root UNDER the smaller — so every
    * root is its component's minimum id by construction, matching the
    * distributed loop's min-label semantics exactly. Ids surface as
    * LongType (every caller keys by a long doc id). */
  private def driverComponents(
      spark: org.apache.spark.sql.SparkSession, edges: DataFrame): DataFrame = {
    // one direction suffices for union-find (half the transfer); keep
    // src == dst self-loops so their vertex still surfaces. The stream
    // lands in primitive long arrays — toLocalIterator bounds the boxed
    // Row footprint to one partition at a time, so peak driver heap is
    // ~16 B/edge, not hundreds of bytes of GenericRow per edge.
    val sb = new scala.collection.mutable.ArrayBuilder.ofLong
    val db = new scala.collection.mutable.ArrayBuilder.ofLong
    val it = edges.filter(col("src") <= col("dst"))
      .select(col("src"), col("dst"))
      .toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      if (r.isNullAt(0) || r.isNullAt(1)) throw new IllegalArgumentException(
        "connectedComponents: null id in pair list — drop null-id rows upstream")
      sb += r.getLong(0); db += r.getLong(1)
    }
    val srcA = sb.result(); val dstA = db.result()
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    var i = 0
    while (i < srcA.length) {
      val a = find(srcA(i)); val b = find(dstA(i))
      if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      i += 1
    }
    // vertex set as a primitive sort + adjacent dedup — a boxed tree set
    // here would cost ~50 B/vertex and dwarf the edge arrays. The output
    // Rows (one per vertex) are the one unavoidable boxed allocation:
    // they ARE the result relation handed to createDataFrame.
    val all = new Array[Long](srcA.length + dstA.length)
    System.arraycopy(srcA, 0, all, 0, srcA.length)
    System.arraycopy(dstA, 0, all, srcA.length, dstA.length)
    java.util.Arrays.sort(all)
    val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
    i = 0
    while (i < all.length) {
      if (i == 0 || all(i) != all(i - 1))
        out.add(org.apache.spark.sql.Row(all(i), find(all(i))))
      i += 1
    }
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("label", LongType, nullable = false))))
  }

  /** Cross-document boilerplate-span removal (the line-level dedup of
    * CCNet/RefinedWeb, over fixed token windows since this corpus has no
    * newlines): split each doc into non-overlapping `span`-token windows,
    * count each window's DOCUMENT frequency across the corpus, strip
    * windows present in more than `maxDf` docs, and reassemble the doc
    * from the surviving windows in order. Navigation chrome, cookie
    * banners, and license headers repeat verbatim across pages — at the
    * window grain they are removable without dropping the whole doc.
    *
    * Returns (id, n_spans, n_removed, cleaned) — the TRANSFORMED corpus
    * with its removal accounting, not just a report.
    *
    * Scale: the df aggregate shuffles one small row per (window, doc);
    * the hot-window set (df > maxDf) is tiny by construction — it is
    * the boilerplate vocabulary, not the corpus — so it BROADCASTS into
    * the flagging join, and the only corpus-sized shuffle is the per-doc
    * reassembly groupBy. Window text itself shuffles once (reassembly
    * needs it); the df pass could key on xxhash64(window) instead, but
    * the reassembly shuffle dominates either way. */
  def stripBoilerplateSpans(
      df: DataFrame, idCol: String, textCol: String,
      span: Int = 16, maxDf: Int = 2): DataFrame = {
    require(span > 0, s"span=$span must be positive")
    require(maxDf >= 1, s"maxDf=$maxDf must be at least 1 (0 would strip everything)")
    val toks = TextAnalysis.tokens(col(textCol))
    val spans = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        posexplode(transform(
          sequence(lit(0), TextAnalysis.chunkCount(toks, span, span) - 1),
          i => array_join(slice(toks, i * span + 1, lit(span)), " "))))
      .toDF("id", "idx", "span")
    val hot = spans.groupBy(col("span"))
      .agg(countDistinct(col("id")).as("_df"))
      .filter(col("_df") > maxDf)
      .select(col("span"), lit(1).as("_hot"))
    spans.join(broadcast(hot), Seq("span"), "left")
      .withColumn("is_hot", coalesce(col("_hot"), lit(0)))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("is_hot")).cast(LongType).as("n_removed"),
        array_join(transform(
          filter(sort_array(collect_list(struct(col("idx"), col("span"), col("is_hot")))),
            s => s.getField("is_hot") === 0),
          s => s.getField("span")), " ").as("cleaned"))
  }

  /** 64-bit SimHash sketch as FOUR 16-bit chunks (array<long>). Per
    * token, bit i's ±1 vote is bit i of the token's xxhash64 (64
    * independent vote streams from one hash); sketch bit i is set when
    * the vote sum is positive. Native fused kernel
    * (graft.expressions.SimHashChunks) — one pass over the tokens, a
    * 64-int vote array, no per-token allocation; the equivalent
    * declarative aggregate/zip_with tree cost ~7 s interpreted per 5k
    * docs. Map-only. */
  def simhashChunks(textCol: Column, portable: Boolean = false): Column =
    graft.expressions.TextHashExprs.simhashChunks(TextAnalysis.tokens(textCol), portable)

  /** The declarative HOF formulation of [[simhashChunks]], kept as the
    * cross-check oracle for the native kernel (DedupSimilaritySpec
    * asserts bit-identical output). */
  def simhashChunksDeclarative(textCol: Column): Column = {
    val baseHashes = transform(TextAnalysis.tokens(textCol), t => xxhash64(t))
    val voteArr = aggregate(
      baseHashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map { i =>
          when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))
        }: _*),
        (a, b) => a + b))
    // fold each 16-bit slice MSB-first into a chunk value
    transform(sequence(lit(0), lit(3)), c =>
      aggregate(slice(voteArr, c * 16 + 1, lit(16)), lit(0L),
        (acc, v) => acc * 2 + when(v > 0, 1L).otherwise(0L)))
  }

  /** Hamming distance between two chunked sketches. */
  def hammingChunks(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, v) => acc + v)

  /** SimHash near-dup candidate pairs: band the sketch by its 4 16-bit
    * chunks (any equal chunk → candidate, catches hamming<=3 with high
    * probability), verify with the exact hamming distance. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = DefaultMaxDf,
      portable: Boolean = false): DataFrame = {
    // cache: the sketch feeds both sides of the self-join (8 longs/doc)
    val sk = Caches.register(
      df.select(col(idCol).as("id"), simhashChunks(col(textCol), portable).as("sk")))
    // over-full (band, chunk) buckets are degenerate blocking keys
    // (boilerplate corpus) — drop before the f² self-join
    val chunks = dropHotKeys(
      sk.select(col("id"), col("sk"), posexplode(col("sk")))
        .toDF("id", "sk", "band", "chunk"),
      Seq("band", "chunk"), maxBucket)
    chunks.as("a").join(chunks.as("b"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingChunks(col("a.sk"), col("b.sk")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
