package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst overlap count over two SORTED array<long> columns —
  * the hot inner loop of set-similarity verification (Jaccard common
  * count on hashed shingle sets).
  *
  * The built-in route (`size(array_intersect(a, b))`) builds a hash set
  * of one side and MATERIALIZES the intersection array just to take its
  * length. For sorted inputs a single merge pass counts the overlap with
  * zero allocation; this expression generates that loop. Callers sort
  * once at set-construction time (array_sort after hashing) — the sets
  * are reused across every candidate pair they appear in, so the sort
  * amortizes while the per-pair merge runs at memory speed.
  *
  * Duplicate semantics: inputs are DISTINCT sets by construction
  * (shingle sets are array_distinct'd); on multiset inputs the count
  * follows merge semantics (min multiplicity), same as array_intersect
  * on distinct arrays. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // registered as a user-callable SQL function, so the type contract is
  // enforced at analysis time (array<int> coerces, arbitrary types fail
  // with a proper error instead of misreading ArrayData); SORTEDNESS
  // remains the caller's contract (hash + array_sort at the Column layer)
  override def inputTypes: Seq[graftshim.AbstractType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-API entry point. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    graftshim.column(SortedIntersectCount(
      graftshim.expression(a), graftshim.expression(b)))
}
