package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Byte-pair-encoding merge training (Sennrich et al. 2016) — the
  * tokenizer-induction step of an LLM data pipeline, split the way real
  * tokenizer training splits it:
  *
  *  - the CORPUS pass is distributed: word frequencies are one
  *    partial-aggregable groupBy over billions of tokens, capped to the
  *    top-`maxVocab` words by a TakeOrderedAndProject (count desc, token
  *    asc — total order, deterministic cap);
  *  - the MERGE loop runs on the driver over that capped vocabulary —
  *    driver-sized BY CONTRACT (every production BPE trainer holds the
  *    word-frequency table in memory; it is the corpus scan, not the
  *    vocab loop, that needs a cluster).
  *
  * Fully deterministic: integer pair counts, argmax ties broken by
  * (count desc, left asc, right asc), greedy left-to-right merging
  * within each word. Not ANSI-SQL-expressible (iterative rewriting), so
  * the registry entry is rows-only; the spec pins the classic
  * lowest/newest/widest fixture's merge sequence.
  */
object Bpe {

  /** @param tokens   one row per token OCCURRENCE, column `token`
    * @param numMerges number of merge rules to learn
    * @param maxVocab  cap on distinct words entering the merge loop
    * @return (rank, left, right, merged, pair_count) — one row per merge
    */
  def train(spark: SparkSession, tokens: DataFrame, numMerges: Int,
      maxVocab: Int = 100000): DataFrame = {
    val vocab: Array[(Array[String], Long)] = tokens
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1)))

    var words = vocab
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    while (rank <= numMerges) {
      val pairCounts = mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) {
        rank = numMerges + 1 // vocabulary fully merged — stop early
      } else {
        val ((l, r), c) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((rank, l, r, l + r, c))
        words = words.map { case (syms, cnt) =>
          val out = mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += l + r; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, cnt)
        }
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Apply trained merges to a word: start from characters, repeatedly
    * merge the LOWEST-RANK adjacent pair (all its occurrences, left to
    * right) until none applies — the standard BPE apply rule, consistent
    * with [[train]]'s per-rank greedy rewriting, so encoding the
    * training corpus reproduces the training segmentation. Unknown
    * characters pass through as singleton pieces; concatenating the
    * pieces always reproduces the word (spec-pinned losslessness). */
  def encodeWord(w: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: mutable.ArrayBuffer[String] =
      mutable.ArrayBuffer.from(w.split("").filter(_.nonEmpty))
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val pl = syms(bi); val pr = syms(bi + 1)
        val out = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == pl && syms(j + 1) == pr) {
            out += pl + pr; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out
        done = syms.length < 2
      }
    }
    syms.toSeq
  }

  /** Distributed BPE ENCODING with trained merges — the inference side
    * of [[train]], shaped for scale: the merge table is collected once
    * (driver-sized by contract — it IS the tokenizer) and broadcast;
    * each DISTINCT token is encoded exactly once in a mapPartitions
    * pass (the per-word merge loop is genuinely imperative — the
    * documented last-resort tier of the operator ladder); occurrences
    * then pick up their piece arrays through an equality join on the
    * token — dictionary-sized work + one shuffle, never a per-occurrence
    * re-encode. Returns `tokens` with an added `pieces` array column. */
  def encode(spark: SparkSession, tokens: DataFrame, merges: DataFrame): DataFrame = {
    import spark.implicits._
    val ranks: Map[(String, String), Int] = merges
      .select("rank", "left", "right").collect()
      .map(r => ((r.getString(1), r.getString(2)), r.getInt(0))).toMap
    val bRanks = spark.sparkContext.broadcast(ranks)
    val encoded = tokens.select("token").distinct().as[String]
      .mapPartitions { it =>
        val m = bRanks.value
        it.map(w => (w, encodeWord(w, m)))
      }
      .toDF("token", "pieces")
    tokens.join(encoded, "token")
  }
}
