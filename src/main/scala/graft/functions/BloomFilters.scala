package graft.functions

import org.apache.spark.sql.{Column, graftshim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column bindings for Spark's internal bloom-filter sketch expressions
  * (the machinery behind runtime row-level filtering, exposed through the
  * same `private[sql]` bridge as the custom codegen expressions).
  *
  * The sketch is an `org.apache.spark.util.sketch.BloomFilter` serialized
  * to a binary column: build it with one aggregation over the (hashed)
  * key set, broadcast the single-row result, and probe with
  * [[might_contain]] — a per-row bit test, no join. The scale story: a
  * 10⁸-key probe set at 1% FPP is a ~120 MB sketch, a broadcastable
  * stand-in for a broadcast semi-join whose build side would be tens of
  * GB of strings. False positives make the filter one-sided (keeps ⊇
  * matches), so compositions must re-verify survivors exactly —
  * [[graft.dedup.Dedup.contaminatedByBloom]] does.
  *
  * SIZING CAVEAT: `BloomFilterAggregate` silently CLAMPS to
  * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default 4M
  * keys) and `...maxNumBits` (default 2²⁶ bits = 8 MB) — no error.
  * Requesting the 10⁸-key sketch above at default confs yields an 8 MB
  * filter at ~0.7 bits/key, FPP → 1, and the pre-filter degrades to a
  * pass-through (output stays correct — the exact verify owns
  * correctness — but the bloom buys nothing). Raise those two confs to
  * the real probe cardinality before building big sketches;
  * [[graft.GraftSession]] sets them as part of the recommended wiring.
  */
object BloomFilters {

  /** Aggregate a long column (hash your keys with xxhash64 first) into a
    * serialized bloom filter sized for `expectedItems`. */
  def bloom_filter_agg(hashed: Column, expectedItems: Long): Column =
    graftshim.column(new BloomFilterAggregate(
      graftshim.expression(hashed), expectedItems).toAggregateExpression())

  /** Aggregate with an explicit bit budget (numBits ≈ items · bitsPerKey;
    * ~9.6 bits/key ⇒ 1% FPP). */
  def bloom_filter_agg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    graftshim.column(new BloomFilterAggregate(
      graftshim.expression(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** True when `hashed` MIGHT be in the sketch (one-sided: false ⇒
    * definitely absent). `bloom` is the binary column produced by
    * [[bloom_filter_agg]]. */
  def might_contain(bloom: Column, hashed: Column): Column =
    graftshim.column(BloomFilterMightContain(
      graftshim.expression(bloom), graftshim.expression(hashed)))

  /** A one-row sketch frame as a SCALAR-SUBQUERY column — the
    * [[might_contain]] attachment that keeps megabytes of sketch bytes
    * OUT of the plan tree (r16): a `lit(bytes)` sketch is re-stringified
    * on every explain/AQE log (a 1.2 MB sketch rendered a 21 MB plan
    * text), serialized into every stage's task binary, and costs a
    * blocking driver job to collect; the subquery is evaluated once by
    * the engine at execution — exactly how SPARK-32268's runtime bloom
    * filters attach. `BloomFilterMightContain` accepts precisely these
    * two forms (foldable or scalar subquery). */
  def bloom_sketch_subquery(sketchOneRow: org.apache.spark.sql.Dataset[_]): Column =
    graftshim.column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      graftshim.analyzed(sketchOneRow)))
}
