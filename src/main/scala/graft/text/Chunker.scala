package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (the rsync/LBFS/FastCDC family): cut each
  * document where a rolling hash of the trailing `w`-char window hits a
  * boundary pattern (`hash mod divisor == 0`). Unlike fixed-width
  * chunking, an insertion early in a document shifts NO later chunk
  * boundaries — chunk-level dedup across document versions keeps
  * matching after edits, which is why CDC is the standard prefilter for
  * near-identical-version storage and crawl-snapshot dedup.
  *
  * Engine shape: per-row higher-order-function expressions — no UDF, no
  * explode until the caller's per-chunk accounting, zero shuffle in the
  * chunker itself. The polynomial window hash is EXACT integer math
  * (max term 0xFFFF·31⁷ ≈ 1.8e15, summed ×8 < 2⁶³), so boundaries are
  * bit-identical in any engine with 64-bit integers — the DuckDB oracle
  * replays the identical polynomial.
  *
  * IMPORTANT construction detail: every intermediate (char codes,
  * boundary list, span list) is BOUND TO ITS OWN COLUMN via successive
  * projections, so lambdas only ever capture attribute references. A
  * naive single expression tree captures the `codes` subtree inside the
  * position-filter lambda and re-evaluates the whole O(n) transform per
  * element — O(n²·w) per document (the repo's known higher-order-lambda
  * pitfall; measured as a ~50× slowdown here). CollapseProject keeps the
  * projections apart because each bound array is referenced more than
  * once by its consumer.
  */
object Chunker {
  val B = 31L          // polynomial base
  val Window = 8       // rolling window chars
  val Divisor = 64L    // boundary when hash % 64 == 0 → ~64-char chunks

  private val powers: Array[Long] =
    Array.iterate(1L, Window)(_ * B) // B^0 .. B^(w-1)

  /** Window hash ending at 1-based position `i` over a BOUND codes
    * column: 8 statically-unrolled element_at reads — no nested
    * aggregate, no captured subtrees. */
  private def hashAt(codes: Column, i: Column): Column =
    (1 to Window).map(j =>
      element_at(codes, (i - Window + j).cast("int")) * lit(powers(j - 1)))
      .reduce(_ + _)

  /** Adds `bounds` (1-based char positions where a chunk ends, always
    * including the doc end) and `chunks` (the chunk texts) for
    * `textCol`. Intermediates are dropped. */
  def withChunks(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    // split("", -1) keeps a trailing empty string in Spark — slice it
    // off (DuckDB's string_split_regex does not produce one)
    df
      .withColumn("__codes",
        transform(slice(split(text, ""), lit(1), length(text)),
          c => ascii(c).cast("long")))
      .withColumn("__n", size(col("__codes")).cast("long"))
      // cut strictly before the end, then append the end — ascending and
      // duplicate-free WITHOUT array_distinct (whose order preservation
      // DuckDB's list_distinct does not guarantee); the oracle replays
      // this construction verbatim
      .withColumn("bounds",
        concat(
          filter(sequence(lit(Window.toLong), greatest(col("__n"), lit(Window.toLong))),
            i => i < col("__n") &&
              pmod(hashAt(col("__codes"), i), lit(Divisor)) === 0),
          array(col("__n"))))
      .withColumn("__spans",
        zip_with(
          concat(array(lit(0L)),
            slice(col("bounds"), lit(1), greatest(size(col("bounds")) - 1, lit(0)))),
          col("bounds"),
          (s, e) => struct(s.as("s"), e.as("e"))))
      .withColumn("chunks",
        transform(col("__spans"),
          sp => text.substr((sp("s") + 1).cast("int"), (sp("e") - sp("s")).cast("int"))))
      .drop("__codes", "__n", "__spans")
  }
}
