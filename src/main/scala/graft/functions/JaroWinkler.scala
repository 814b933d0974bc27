package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native Catalyst expression — the
  * record-linkage verifier Spark lacks (it ships levenshtein but no Jaro
  * family). Standard Winkler variant: similarity = jaro + ℓ·0.1·(1−jaro)
  * with ℓ = common prefix capped at 4, boost applied only when
  * jaro > 0.7 — the exact semantics DuckDB's
  * `jaro_winkler_similarity` implements (probed: MARTHA/MARHTA →
  * 0.9611…, DWAYNE/DUANE → 0.84, and boost-suppressed cases match), so
  * linkage queries stay DuckDB-oracle-pairable.
  *
  * Codegen calls the static [[JaroWinkler.similarity]] kernel — the
  * match/transposition scan is O(|a|·window) imperative code over char
  * arrays; emitting a static call keeps the expression inside
  * whole-stage codegen (no Row boxing, no UDF serialization) without
  * exploding the generated method past the JIT inline limit.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column-API entry point for [[JaroWinklerSim]]. */
  def jaro_winkler(a: Column, b: Column): Column =
    graftshim.column(JaroWinklerSim(
      graftshim.expression(a), graftshim.expression(b)))

  // per-thread match-flag scratch: the blocked self-join evaluates the
  // kernel millions of times per task; allocating two boolean arrays and
  // two Strings per pair was the dominant cost of q_record_linkage
  // (measured 10.9 s at sf0.1 before this path, ~3x less after)
  private final class Scratch {
    var m1 = new Array[Boolean](64)
    var m2 = new Array[Boolean](64)
    def ensure(n: Int): Unit = if (m1.length < n) {
      m1 = new Array[Boolean](n); m2 = new Array[Boolean](n)
    }
  }
  private val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  /** Allocation-free entry point, matching over raw UTF-8 BYTES with
    * thread-local buffers — deliberately byte-based, because DuckDB's
    * jaro_winkler_similarity is too (probed: 'café'/'cafe' → 0.8483…
    * = the 5-vs-4-byte match, not the 4-char 0.8833…), so byte units
    * keep every input — ASCII or not — bit-identical to the oracle. An
    * earlier variant detected ASCII via numChars() and fell back to the
    * char kernel otherwise; the two O(n) codepoint scans per pair cost
    * ~20% of the whole linkage query for a distinction DuckDB doesn't
    * make. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val l1 = a.numBytes(); val l2 = b.numBytes()
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val sc = scratch.get()
    sc.ensure(math.max(l1, l2))
    val m1 = sc.m1; val m2 = sc.m2
    java.util.Arrays.fill(m1, 0, l1, false)
    java.util.Arrays.fill(m2, 0, l2, false)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = a.getByte(i)
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && b.getByte(j) == c) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.getByte(i) != b.getByte(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (prefix < maxP && a.getByte(prefix) == b.getByte(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** The scalar kernel in reference form over java.lang.String —
    * byte-equivalent on ASCII (what the specs and published test values
    * use); the production path above is the byte kernel. Matches within
    * the Jaro window
    * ⌊max(|a|,|b|)/2⌋−1, transpositions over the matched subsequences,
    * then the conditional Winkler prefix boost. Evaluation order of the
    * final arithmetic mirrors the textbook formula
    * (m/|a| + m/|b| + (m−t)/m)/3 so doubles agree with DuckDB's kernel
    * to the last bit on every probed case (outputs are additionally
    * rounded at the query layer). */
  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - half).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (prefix < maxP && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
