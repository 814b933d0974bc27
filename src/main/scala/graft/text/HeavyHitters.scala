package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate heavy hitters — top-k tokens WITHOUT the exact global
  * hash-agg over the full vocabulary. The exact q_token_topk plan
  * shuffles one row per DISTINCT token (after map-side combine); on a
  * web-scale corpus the vocabulary itself — hapax typos, urls, code
  * identifiers — is billions of keys, and that shuffle dwarfs the top-k
  * it feeds. This operator caps the expensive shuffle at a CONSTANT
  * `numBuckets` rows per task, independent of vocabulary size.
  *
  * Two phases (two corpus passes, both cheap-per-row):
  *  1. BUCKET PASS: count `xxhash64(token) mod numBuckets` — partial
  *     (map-side) aggregation collapses each task's output to ≤
  *     numBuckets rows before the exchange, whatever the vocab; the
  *     top `k·candidateFactor` buckets by count are the candidates
  *     (TakeOrderedAndProject — never a global sort), a driver-sized
  *     id list inlined into phase 2's filter.
  *  2. RESOLVE PASS: exact-count ONLY tokens hashing into a candidate
  *     bucket — the filter runs per row BEFORE any shuffle, so the
  *     hash-agg sees just the colliding sliver of the corpus — then
  *     top-k of those.
  *
  * Accuracy: reported counts are EXACT (phase 2 recounts; bucket
  * collisions only add candidates, they never corrupt a count — unlike
  * count-min upper bounds). A true top-k token is missed only when
  * `k·candidateFactor` whole buckets each out-count the token's own
  * bucket, which (bucket count ≥ token count) needs that many buckets
  * heavier than the k-th heaviest token — rare at the default 8× slack
  * and measured ≥0.9 recall in the spec vs the exact aggregate.
  * Deterministic end to end (xxhash64 + count-then-token tie order):
  * rows-only under the driver (xxhash64 isn't portable SQL).
  */
object HeavyHitters {

  /** Top-k (token, cnt) from a frame with a `token` column.
    * `numBuckets` bounds the phase-1 shuffle (rows per task);
    * `candidateFactor` is the recall slack — candidates kept =
    * k·candidateFactor buckets. */
  def topTokens(toks: DataFrame, k: Int,
                numBuckets: Int = 1 << 16,
                candidateFactor: Int = 8): DataFrame = {
    val bucket = pmod(xxhash64(col("token")), lit(numBuckets.toLong))
    // driver-sized by construction: k·candidateFactor bucket ids
    val heavyBuckets = toks
      .select(bucket.as("bkt"))
      .groupBy("bkt").agg(count(lit(1)).as("bcnt"))
      .orderBy(desc("bcnt"), asc("bkt")).limit(k * candidateFactor)
      .select("bkt").collect().map(_.getLong(0))
    toks
      .filter(bucket.isin(heavyBuckets.toIndexedSeq: _*))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token")).limit(k)
  }
}
