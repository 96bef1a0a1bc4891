package graft.analytics

/** The DuckDB replay of the portable minhash chain
  * ([[graft.operators.Dedup.minhashSignatures]] → banding →
  * signature-overlap verify) as shared CTE builders — ONE definition of
  * the base-31 shingle hash, the (48271 + 2j) minhash family, and the
  * base-131 band fold. A change to the portable kernels lands in every
  * consuming oracle at once instead of drifting across copies (the
  * [[CorpusStatsQueries]] `kmeansOracleCtes` discipline applied to the
  * dedup family). Consumers: q_minhash_pairs, q_minhash_precision,
  * q_lsh_scurve, q_split_leakage, q_cross_source_dup.
  */
private[analytics] object MinhashOracle {

  /** CTEs `t, sg, hs, sig`: lowercase alnum tokens → 3-token shingles →
    * DISTINCT base-31 shingle hashes (`hs.hv`) → the 32-slot portable
    * minhash signature (`sig.sig`). */
  val sigCtes: String =
    """t AS (SELECT doc_id,
        list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents),
      sg AS (SELECT doc_id,
        CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
             ELSE list_transform(range(len(toks) - 2),
               i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) END AS shingles
      FROM t),
      hs AS (SELECT doc_id,
        list_distinct(list_transform(shingles, s ->
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(regexp_extract_all(s, '.'), c -> CAST(ord(c) AS BIGINT))),
            (acc, x) -> (acc * 31 + x) % 1000000007))) AS hv
      FROM sg),
      sig AS (SELECT doc_id,
        list_transform(range(32), j ->
          list_min(list_transform(hv, h -> ((48271 + 2*j) * h + j) % 1000000007))) AS sig
      FROM hs)"""

  /** Banding chain over `sig` — 32 hashes in 32/r bands of `r` rows:
    * CTEs `banded/kept/cand/ver` (suffixed with `tag`), where
    * `ver$tag(id_a, id_b, est_jaccard)` carries the UNthresholded
    * signature-overlap estimate for every df-capped bucket-mate pair.
    * Consumers apply their own `est_jaccard >= threshold` filter. */
  def bandCtes(r: Int, maxBucket: Int = 100, tag: String = ""): String = {
    require(32 % r == 0, s"rows-per-band $r must divide 32")
    val b = 32 / r
    s"""banded$tag AS (SELECT doc_id, band,
        list_reduce(list_prepend(CAST(band AS BIGINT), sig[band*$r+1 : band*$r+$r]),
          (acc, v) -> (acc * 131 + v) % 1000000007) AS bhash
      FROM sig CROSS JOIN (SELECT unnest(range($b)) AS band)),
      kept$tag AS (SELECT band, bhash FROM banded$tag GROUP BY band, bhash HAVING COUNT(*) <= $maxBucket),
      cand$tag AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded$tag a JOIN kept$tag k ON a.band = k.band AND a.bhash = k.bhash
        JOIN banded$tag b ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
      ver$tag AS (SELECT id_a, id_b,
        ROUND(CAST(list_sum(list_transform(range(32),
          i -> CASE WHEN sa.sig[i+1] = sb.sig[i+1] THEN 1 ELSE 0 END)) AS DOUBLE) / 32, 6)
          AS est_jaccard
      FROM cand$tag JOIN sig sa ON cand$tag.id_a = sa.doc_id
        JOIN sig sb ON cand$tag.id_b = sb.doc_id)"""
  }
}
