package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over an array<string> token column — the
  * PER-ROW form of the signature the dedup layer previously built with
  * `explode(tokens) → groupBy(doc_id).agg(64 × sum(when(bit, 1, -1)))`:
  * that route shuffles every token occurrence to its doc's reducer and
  * carries 64 aggregation buffers per group; this expression computes
  * the identical signature in one codegen'd loop per row — no explode,
  * no doc_id exchange, no aggregation state — so signing becomes a pure
  * scan stage at any corpus size (exactly like the MinHash band
  * expression, [[graft.dedup.Dedup.bandBucketArray]]).
  *
  * Bit-identical to the aggregated path (spec-pinned, DedupSimSpec):
  * token hash = Spark's `xxhash64` (XXH64, seed 42) per OCCURRENCE
  * (multiplicity votes, as explode did), bit i of the result set iff
  * the +1/−1 votes on hash-bit i sum positive (ties → 0, matching
  * `sum > 0`). Plain Java long arithmetic — no ANSI overflow anywhere,
  * which is what forced the aggregated path to split words.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // declared (not assumed): the SQL registration makes this expression
  // user-callable, so wrong argument types must fail at ANALYSIS time
  // (AnalysisException), not as a ClassCastException mid-job. Null
  // ELEMENTS inside the array are skipped (no vote) rather than crashing
  // the signing pass; tokens() never emits them, so the aggregated-path
  // parity spec is unaffected.
  // (type inferred — AbstractDataType itself is private[sql])
  override def inputTypes = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(arr.getUTF8String(j), org.apache.spark.sql.types.StringType, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
         |      $a.getUTF8String($j), org.apache.spark.sql.types.DataTypes.StringType, 42L);
         |    for (int $i = 0; $i < 64; $i++) {
         |      if ((($h >>> $i) & 1L) == 1L) $votes[$i]++; else $votes[$i]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0) $out |= (1L << $i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-API entry point for [[SimHash64]]. */
  def simhash64(tokens: Column): Column =
    graftshim.column(SimHash64(graftshim.expression(tokens)))
}
