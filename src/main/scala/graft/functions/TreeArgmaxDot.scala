package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, LongType}

/** One level of a hierarchical coarse-quantizer descent as a PER-ROW
  * expression: among the candidate centroids whose `parents` entry equals
  * `want` (a contiguous slice — ids are packed ascending and the parent
  * id is monotone in the child id — located by binary search; `want` < 0
  * scans every entry), return the id maximizing
  * `dot(emb, vecs[i]) / norms[i]`, ties to the LOWEST id.
  *
  * This replaces the broadcast-join + min(struct(−score, id)) aggregate
  * formulation of the same argmax: that shape materializes
  * n × |candidates| joined rows through a hash aggregate whose per-row
  * struct allocation and ordering dominate the actual arithmetic (jstack
  * profile, r12: >95% of semdedup's sf100 CPU inside the struct-min
  * hash agg). Here the candidate arrays ride in ONE broadcast row
  * (12 MB at K = 20k × dim 64) and each input row runs a tight fused
  * multiply-add loop — no fanout, no aggregate, no shuffle.
  *
  * Determinism contract: the dot accumulates left-to-right exactly
  * like [[DotProduct]] and the oracle's
  * `list_sum(list_transform(...))`; the ascending scan with a strict
  * `>` keeps the lowest id on exact ties. NaN handling matches the
  * FORMER Spark min(struct(−score, id)) aggregate this expression
  * replaced — a NaN score never replaces a non-NaN best (struct-min
  * orders NaN largest, so the aggregate never chose NaN either), and
  * if every candidate scores NaN the lowest candidate id wins. Note
  * this is NOT what the DuckDB oracle's `row_number() OVER (ORDER BY
  * score DESC, id ASC)` would do on a NaN: DuckDB sorts NaN above all
  * numbers, so a NaN-scoring centroid (only reachable from a
  * zero-norm centroid ⇒ 0/0) would win rn=1 there — a latent
  * cross-engine divergence that cannot fire on this corpus (centroids
  * are means of unit-normalized vectors; a zero norm would need an
  * exactly-cancelling cluster) and is pinned Spark-side by spec.
  *
  * CodegenFallback: the per-row work is the internal loop (~10³–10⁶
  * fused multiply-adds), so the per-call boxing overhead is noise; a
  * doGenCode variant would only complicate the binary search.
  */
case class TreeArgmaxDot(emb: Expression, ids: Expression,
    parents: Expression, vecs: Expression, norms: Expression,
    want: Expression) extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(emb, ids, parents, vecs, norms, want)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "tree_argmax_dot"

  override def eval(input: InternalRow): Any = {
    val e = emb.eval(input)
    val idsV = ids.eval(input)
    val parV = parents.eval(input)
    val vecV = vecs.eval(input)
    val nrmV = norms.eval(input)
    val wantV = want.eval(input)
    if (e == null || idsV == null || parV == null || vecV == null ||
      nrmV == null || wantV == null) return null
    val ev = e.asInstanceOf[ArrayData]
    val idArr = idsV.asInstanceOf[ArrayData]
    val pArr = parV.asInstanceOf[ArrayData]
    val vArr = vecV.asInstanceOf[ArrayData]
    val nArr = nrmV.asInstanceOf[ArrayData]
    val w = wantV.asInstanceOf[Long]
    val n = idArr.numElements()
    var lo = 0
    var hi = n
    if (w >= 0L) {
      // first index with parent >= w
      var a = 0; var b = n
      while (a < b) {
        val m = (a + b) >>> 1
        if (pArr.getLong(m) < w) a = m + 1 else b = m
      }
      lo = a
      // first index with parent > w
      b = n
      while (a < b) {
        val m = (a + b) >>> 1
        if (pArr.getLong(m) <= w) a = m + 1 else b = m
      }
      hi = a
    }
    // an empty child slice (want absent from parents) is unreachable
    // with the current tree construction — every parent id the level-1
    // argmax can emit owns ≥1 child — so a hit here IS a tree-packing
    // or id-encoding bug. Fail loudly (r14, ADVICE): returning null let
    // the row silently drop through the downstream equi-join, turning
    // an invariant violation into quietly-shrunk dedup output.
    if (lo >= hi) throw new IllegalStateException(
      s"TreeArgmaxDot: no child has parent id $w (packed tree holds $n " +
        "nodes) — tree packing / id encoding violated its invariant")
    var best = Double.NaN
    var bestId = idArr.getLong(lo)
    var i = lo
    val dims = ev.numElements()
    while (i < hi) {
      val v = vArr.getArray(i)
      val d = math.min(dims, v.numElements())
      var acc = 0.0
      var j = 0
      while (j < d) {
        acc += ev.getDouble(j) * v.getDouble(j)
        j += 1
      }
      val s = acc / nArr.getDouble(i)
      // strict > keeps the lowest id on ties; NaN never replaces a
      // number, and a number always replaces the NaN sentinel
      if (s > best || (best != best && s == s)) {
        best = s
        bestId = idArr.getLong(i)
      }
      i += 1
    }
    bestId
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TreeArgmaxDot =
    copy(emb = newChildren(0), ids = newChildren(1),
      parents = newChildren(2), vecs = newChildren(3),
      norms = newChildren(4), want = newChildren(5))
}

object TreeArgmaxDot {
  def tree_argmax_dot(emb: Column, ids: Column, parents: Column,
      vecs: Column, norms: Column, want: Column): Column =
    graftshim.column(TreeArgmaxDot(
      graftshim.expression(emb), graftshim.expression(ids),
      graftshim.expression(parents), graftshim.expression(vecs),
      graftshim.expression(norms), graftshim.expression(want)))
}
