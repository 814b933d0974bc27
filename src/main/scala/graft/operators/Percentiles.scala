package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped percentiles via the sort-based window idiom instead of
  * `percentile`/`median` aggregates.
  *
  * Spark's exact `percentile`/`median` plan as ObjectHashAggregate and
  * buffer EVERY value of a group in executor memory — at 100 TB a hot
  * group holds billions of doubles and OOMs with no spill path. This
  * computes the same `quantile_cont` result in two spillable passes:
  *
  *  1. per-group non-null counts (partial-aggregable, tiny result);
  *  2. `row_number` over (group, value) — WindowExec with a running
  *     frame streams rows through an external (spilling) sort, holding
  *     O(1) state per group — then a conditional aggregation keeps only
  *     the two rows bracketing each requested rank.
  *
  * Interpolation matches both Spark's `percentile` and DuckDB's
  * `quantile_cont`: for 1-indexed continuous position h = 1 + p·(n−1),
  * result = v⌊h⌋ + (h − ⌊h⌋)·(v⌊h⌋₊₁ − v⌊h⌋).
  */
object Percentiles {

  /** Exact interpolated percentiles of `valCol` per `grpCol`.
    *
    * @param ps (p, alias) pairs, 0 ≤ p ≤ 1
    * @return one row per group: (grpCol, aliases…), nulls in `valCol`
    *         ignored (SQL percentile semantics); empty groups absent.
    */
  def groupedQuantiles(df: DataFrame, grpCol: String, valCol: String,
      ps: Seq[(Double, String)]): DataFrame = {
    val counts = df.filter(col(valCol).isNotNull)
      .groupBy(grpCol).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(grpCol).orderBy(valCol)
    val ranked = df.select(col(grpCol), col(valCol))
      .filter(col(valCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      // counts has one row per group — always broadcast-sized
      .join(broadcast(counts), grpCol)

    def h(p: Double): Column =
      lit(1.0) + lit(p) * (col("__n") - 1).cast("double")
    // bracketing values at ranks ⌊h⌋ and ⌊h⌋+1; max() over the single
    // matching row (or none → null when h is integral and ⌊h⌋ = n)
    val brackets = ps.zipWithIndex.flatMap { case ((p, _), i) =>
      val lo = floor(h(p)).cast("long")
      Seq(
        max(when(col("__rn") === lo, col(valCol))).as(s"__lo$i"),
        max(when(col("__rn") === lo + 1, col(valCol))).as(s"__hi$i"))
    }
    val agg = ranked.groupBy(grpCol)
      .agg(first(col("__n")).as("__n"), brackets: _*)

    val results = ps.zipWithIndex.map { case ((p, alias), i) =>
      val frac = h(p) - floor(h(p))
      (col(s"__lo$i") +
        frac * (coalesce(col(s"__hi$i"), col(s"__lo$i")) - col(s"__lo$i")))
        .as(alias)
    }
    agg.select(col(grpCol) +: results: _*)
  }

  /** Exact LOWER MEDIAN per group: the value at rank ⌈n/2⌉ of the sorted
    * non-null values — an ACTUAL DATUM, never an interpolation.
    *
    * Use this instead of [[groupedQuantiles]] when the median feeds a
    * downstream strict comparison (robust-outlier thresholds, MAD
    * bands): an interpolated median is an arithmetic result whose last
    * ulp can differ across engines, silently flipping `x > k·median` for
    * rows that tie with the threshold; a datum read from the same
    * parquet bytes is bit-identical everywhere. Same spillable
    * two-pass shape as groupedQuantiles (tiny count aggregate, then one
    * external-sort window) — no per-group value buffer.
    */
  def groupedMedianLow(df: DataFrame, grpCol: String, valCol: String,
      alias: String): DataFrame = {
    val nonNull = df.select(col(grpCol), col(valCol))
      .filter(col(valCol).isNotNull)
    val counts = nonNull.groupBy(grpCol).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(grpCol).orderBy(valCol)
    nonNull
      .withColumn("__rn", row_number().over(w))
      // one row per group — always broadcast-sized
      .join(broadcast(counts), grpCol)
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(col(grpCol), col(valCol).as(alias))
  }

  /** Exact DISCRETE percentiles per group: the datum at 1-based rank
    * max(1, ⌈p·n⌉) of the sorted non-null values — DuckDB's
    * `quantile_disc` rule, pinned empirically (n=4: p=.25→1st,
    * p=.26→2nd; n=5: p=.5→3rd). Like [[groupedMedianLow]] the result
    * is an ACTUAL DATUM read from the source, bit-identical across
    * engines with no interpolation arithmetic at all; `⌈p·n⌉` is
    * deterministic for binary-exact p (.25/.5/.75) since p·n is then
    * an exact product. Same spillable two-pass shape: tiny count
    * aggregate, one external-sort window, conditional-agg pick. */
  def groupedQuantilesDisc(df: DataFrame, grpCol: String, valCol: String,
      ps: Seq[(Double, String)]): DataFrame = {
    val nonNull = df.select(col(grpCol), col(valCol))
      .filter(col(valCol).isNotNull)
    val counts = nonNull.groupBy(grpCol).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(grpCol).orderBy(valCol)
    val ranked = nonNull
      .withColumn("__rn", row_number().over(w))
      // one row per group — always broadcast-sized
      .join(broadcast(counts), grpCol)
    val picks = ps.map { case (p, alias) =>
      val idx = greatest(lit(1L), ceil(lit(p) * col("__n")).cast("long"))
      max(when(col("__rn") === idx, col(valCol))).as(alias)
    }
    ranked.groupBy(grpCol).agg(picks.head, picks.tail: _*)
  }

  /** WEIGHTED lower median: the smallest value whose cumulative INTEGER
    * weight (in value order) reaches half the group total — the
    * importance-weighted center an up/down-weighted corpus needs, where
    * the unweighted median answers the wrong question.
    *
    * Datum-valued and engine-stable despite value ties: tied rows'
    * individual cumulative weights depend on tie order, but the LAST
    * row of a tie run always carries the full (deterministic) sum, so
    * the earliest value whose complete run crosses half-total is
    * selected under every tie order — and `min(value)` over passing
    * rows returns exactly that value. Integer weights keep every
    * cumulative sum exact (`2·cw ≥ tw` is integer arithmetic — no float
    * comparisons anywhere). Same spillable shape as the other
    * order-statistic paths. */
  def groupedWeightedMedian(df: DataFrame, grpCol: String, valCol: String,
      weightCol: String, alias: String): DataFrame = {
    val nonNull = df.select(col(grpCol), col(valCol),
        col(weightCol).cast("long").as("__w"))
      .filter(col(valCol).isNotNull && col("__w").isNotNull)
    val totals = nonNull.groupBy(grpCol).agg(sum("__w").as("__tw"))
    val w = Window.partitionBy(grpCol).orderBy(valCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nonNull
      .withColumn("__cw", sum("__w").over(w))
      .join(broadcast(totals), grpCol)
      .filter(col("__cw") * 2 >= col("__tw"))
      .groupBy(grpCol).agg(min(valCol).as(alias))
  }
}
