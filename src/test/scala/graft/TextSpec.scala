package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextFunctions

class TextSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("tokens: trims and splits on whitespace runs, no empty tokens") {
    val r = Seq("  a  b\tc ").toDF("text")
      .select(TextFunctions.tokens($"text").as("t")).head().getSeq[String](0)
    assert(r == Seq("a", "b", "c"))
  }

  test("shingles3: n-3+1 distinct shingles, empty under 3 tokens") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TextFunctions.shingles3(TextFunctions.tokens($"text")).as("s"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1).isEmpty)
  }

  test("stopword ratio and quality score bounds") {
    val df = Seq("the a data word other").toDF("text")
      .select(
        TextFunctions.stopwordRatio(TextFunctions.tokens($"text")).as("r"),
        TextFunctions.qualityScore(TextFunctions.tokens($"text")).as("q"))
    val row = df.head()
    assert(math.abs(row.getDouble(0) - 0.6) < 1e-9)
    assert(row.getDouble(1) >= 0.0 && row.getDouble(1) <= 1.0)
  }

  test("fingerprint: deterministic, order-sensitive") {
    val fp = (t: String) => Seq(t).toDF("text")
      .select(TextFunctions.fingerprint($"text")).head().getLong(0)
    assert(fp("abc") == fp("abc"))
    assert(fp("abc") != fp("cba"))
    // manual polynomial: ((0*31+97)*31+98)*31+99 mod 1e9+7
    assert(fp("abc") == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("langId picks profile with most matching n-grams") {
    val r = Seq("the thing and the rest").toDF("text")
      .select(TextFunctions.langId($"text")).head().getString(0)
    assert(r == "en")
  }

  test("redact: emails, urls (incl. their digits), long numbers") {
    val r = Seq(
      "write to a.b+c@x-mail.org today",
      "see https://example.com/path?id=9999999 now",
      "order 12345678 shipped, pin 12345 stays",
      "clean text stays untouched").toDF("text")
      .select(TextFunctions.redact($"text").as("r")).collect().map(_.getString(0))
    assert(r(0) == "write to <EMAIL> today")
    assert(r(1) == "see <URL> now")
    assert(r(2) == "order <NUM> shipped, pin 12345 stays")
    assert(r(3) == "clean text stays untouched")
  }

  test("BPE-ish token count: 1 unit per short word, more for long") {
    val r = Seq("ab abcdefgh").toDF("text")
      .select(TextFunctions.tokenCountBpeIsh(TextFunctions.tokens($"text"))).head().getLong(0)
    assert(r == 1 + 2)
  }

  test("heavy hitters: >=0.9 recall vs exact top-k, reported counts are exact") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokens($"text")).as("token"))
    val k = 20
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token")).limit(k)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val approx = graft.text.HeavyHitters.topTokens(toks, k)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(approx.length == k)
    val recall = exact.map(_._1).count(approx.map(_._1).toSet).toDouble / k
    assert(recall >= 0.9, s"recall $recall vs exact top-$k")
    // counts are EXACT, not estimates: every reported pair must match
    // the true global count (collisions add candidates, never inflate)
    val truth = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (t, c) => assert(truth(t) == c, s"count off for '$t'") }
  }

  test("heavy hitters: survives tiny bucket budget (collision-heavy) with exact counts") {
    // 64 buckets over a ~10k-token vocab: every bucket collides; counts
    // must STILL be exact (phase 2 recounts tokens, not buckets), and the
    // result keeps the requested arity. Recall may drop — that's the
    // documented accuracy/shuffle trade.
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokens($"text")).as("token"))
    val approx = graft.text.HeavyHitters
      .topTokens(toks, 10, numBuckets = 64, candidateFactor = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(approx.length == 10)
    val truth = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (t, c) => assert(truth(t) == c) }
  }

  test("BPE merges reproduce the Sennrich fixture sequence") {
    import spark.implicits._
    // the classic low/lower/newest/widest example: 'es' and 'st' tie at
    // 9 (tie-break left asc picks es), then (es,t)=9, then lo/ow tie at
    // 7 (picks lo)
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val toks = words.toDF("token")
    val merges = graft.text.Bpe.train(spark, toks, numMerges = 3)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(merges.toSeq == Seq(
      ("e", "s", "es", 9L), ("es", "t", "est", 9L), ("l", "o", "lo", 7L)),
      merges.toSeq.toString)
  }

  test("BPE encode applies merges in rank order, losslessly, unknowns pass through") {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val merges = graft.text.Bpe.train(spark, words.toDF("token"), numMerges = 3)
    val ranks = merges.select("rank", "left", "right").collect()
      .map(r => ((r.getString(1), r.getString(2)), r.getInt(0))).toMap
    // merges learned: es, est, lo — "newest" → n, e, w, est; "low" → lo, w
    assert(graft.text.Bpe.encodeWord("newest", ranks) == Seq("n", "e", "w", "est"))
    assert(graft.text.Bpe.encodeWord("low", ranks) == Seq("lo", "w"))
    // the 'e' of "lower" is NOT merged (es needs a following s)
    assert(graft.text.Bpe.encodeWord("lower", ranks) == Seq("lo", "w", "e", "r"))
    // unseen word with unseen chars: singletons except learned pairs
    assert(graft.text.Bpe.encodeWord("zest", ranks) == Seq("z", "est"))
    // losslessness on every corpus word + the distributed path agrees
    // with the driver-side function
    val enc = graft.text.Bpe.encode(spark, words.toDF("token"), merges)
    enc.collect().foreach { r =>
      val w = r.getString(0)
      val pieces = r.getSeq[String](1)
      assert(pieces.mkString("") == w, s"lossy encode of $w: $pieces")
      assert(pieces == graft.text.Bpe.encodeWord(w, ranks))
    }
  }

  test("BPE training is deterministic across runs and stops when fully merged") {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextFunctions.tokens($"text")).as("token"))
    val a = graft.queries.Text.qBpeMerges(spark, sfDir).collect()
    val b = graft.queries.Text.qBpeMerges(spark, sfDir).collect()
    assert(a.sameElements(b))
    assert(a.length == 10)
    // a single-word vocab exhausts its pairs: early stop, no crash
    val tiny = graft.text.Bpe.train(spark, Seq("ab").toDF("token"), numMerges = 5)
    assert(tiny.count() == 1)
  }
}
