package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Count–min sketch frequency estimation as a [[TypedImperativeAggregate]]
  * (Cormode & Muthukrishnan, J.Alg 2005) — the mergeable-sketch aggregate
  * class: each task builds a local d×w counter grid, partial aggregation
  * merges grids ELEMENTWISE (the linearity that makes the sketch
  * shuffle-friendly: merge traffic is d·w longs per task regardless of
  * input size), and eval answers the probe keys' frequency estimates
  * (min over the d hashed counters — never an underestimate).
  *
  * `cms_estimate(key, probes, depth, width)` → `array<bigint>` of
  * estimates in probe order. probes/depth/width must be foldable.
  *
  * Hashing is splitmix64 finalization over `key + row·φ⁶⁴` — fixed,
  * seed-free, engine-independent, so results are deterministic across
  * runs and partitionings (counts are exact integers; merge order cannot
  * matter). At 100 TB the sketch replaces a key-cardinality-sized exact
  * groupBy with constant memory per task: d·w·8 bytes (default 4×1024 =
  * 32 KB) against billions of distinct keys.
  *
  * `portable = true` switches the slot function to md5 buckets — row
  * r's bucket is hex slice 8r+1..8r+8 of ONE md5(key) digest, mod
  * width (the r8 seeded-md5 discipline, [[graft.queries.Analytics13]]
  * qDpRelease): every engine with md5 replays the identical grid,
  * making the sketch's estimates DuckDB-oracle-certifiable; the
  * 16-byte digest yields four independent 32-bit words, so one digest
  * per input row covers all depth ≤ 4 hash rows. Splitmix64 stays the
  * production default (one multiply-xor chain, no digest, any depth);
  * md5 is the audit/interop mode. Same guarantees (never
  * underestimates, linear merge) — only the bucket permutation
  * differs.
  */
case class CountMinEstimate(
    child: Expression,
    probesExpr: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    portableExpr: Expression =
      org.apache.spark.sql.catalyst.expressions.Literal(false),
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val depth: Int = depthExpr.eval().asInstanceOf[Number].intValue()
  private lazy val width: Int = widthExpr.eval().asInstanceOf[Number].intValue()
  private lazy val probes: Array[Long] = {
    val arr = probesExpr.eval().asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getLong(i)).toArray
  }

  private lazy val portable: Boolean =
    portableExpr.eval().asInstanceOf[Boolean]

  require(depthExpr.foldable && widthExpr.foldable && probesExpr.foldable &&
    portableExpr.foldable,
    "cms_estimate(probes, depth, width[, portable]) must be literals")
  require(portableExpr.dataType == org.apache.spark.sql.types.BooleanType,
    "cms_estimate: the portable flag must be a BOOLEAN literal, got " +
      portableExpr.dataType.simpleString)
  require(!portable || depth <= 4,
    "portable (md5) mode derives one 32-bit word per depth row from a " +
      "single 16-byte digest - depth must be <= 4")

  override def children: Seq[Expression] =
    Seq(child, probesExpr, depthExpr, widthExpr, portableExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def mix(key: Long, row: Int): Long = {
    // splitmix64 finalizer over key offset by row * golden-gamma
    var z = key + row.toLong * 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // MessageDigest is stateful and not thread-safe; local-mode tasks share
  // the expression instance across threads, so the digest is thread-local.
  @transient private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** ONE digest per key serves every row: md5(key) is 16 bytes = four
    * independent 32-bit words, exactly the d ≤ 4 hash functions the
    * sketch needs — hex slice 8·row+1..8·row+8 in SQL terms, so row r's
    * bucket is byte-identical to DuckDB's
    * `CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 8*r + 1, 8)
    *  AS BIGINT) % width`. (The naive digest-per-(row,key) variant
    * measured 4× the digest cost for the same grid.) */
  private def md5Bytes(key: Long): Array[Byte] = {
    val d = md5Local.get()
    d.reset()
    d.digest(key.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def word(bytes: Array[Byte], row: Int): Long = {
    val o = 4 * row
    ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
      ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
  }

  private def slot(key: Long, row: Int): Int =
    if (portable)
      row * width + (word(md5Bytes(key), row) % width.toLong).toInt
    else
      row * width + java.lang.Math.floorMod(mix(key, row), width.toLong).toInt

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Number].longValue()
      if (portable) {
        // hot path: ONE digest per input row covers all depth rows
        val bytes = md5Bytes(k)
        var i = 0
        while (i < depth) {
          buf(i * width + (word(bytes, i) % width.toLong).toInt) += 1; i += 1
        }
      } else {
        var i = 0
        while (i < depth) { buf(slot(k, i)) += 1; i += 1 }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val ests = probes.map { p =>
      var best = Long.MaxValue
      var i = 0
      while (i < depth) {
        val c = buf(slot(p, i))
        if (c < best) best = c
        i += 1
      }
      best
    }
    new GenericArrayData(ests)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): CountMinEstimate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinEstimate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinEstimate =
    copy(child = newChildren(0), probesExpr = newChildren(1),
      depthExpr = newChildren(2), widthExpr = newChildren(3),
      portableExpr = newChildren(4))
  override def prettyName: String = "cms_estimate"
}

object CountMinEstimate {
  import org.apache.spark.sql.{graftshim, Column}
  import org.apache.spark.sql.catalyst.expressions.Literal

  /** DataFrame-side entry: `cmsEstimate(col, probes, 4, 1024)` as an
    * aggregate Column; `portable = true` selects the md5 slot function
    * (engine-replayable, slower). */
  def cmsEstimate(key: Column, probes: Seq[Long], depth: Int, width: Int,
      portable: Boolean = false): Column =
    graftshim.column(CountMinEstimate(
      graftshim.expression(key),
      Literal.create(probes.toArray, ArrayType(LongType, containsNull = false)),
      Literal(depth), Literal(width), Literal(portable)).toAggregateExpression())
}
