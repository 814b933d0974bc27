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
  * The boundary scan is the native codegen'd
  * [[graft.functions.CdcBounds]] expression — ONE compiled O(n·w) pass
  * per document. The first cut of this operator composed Spark's
  * higher-order array functions (transform→filter over a per-position
  * sequence); those never enter whole-stage codegen, and the filter
  * lambda captured the O(n) codes transform and re-evaluated it per
  * position → O(n²·w) interpreted per document, measured >2000 s on ONE
  * sf0.1 bench task. The per-CHUNK assembly below (spans, substrings)
  * stays in higher-order functions deliberately: it is O(#chunks) ≈
  * n/64 per row, where interpreted eval is harmless.
  */
object Chunker {
  val B = 31L          // polynomial base
  val Window = 8       // rolling window chars
  val Divisor = 64L    // boundary when hash % 64 == 0 → ~64-char chunks

  /** Adds `bounds` (1-based char positions where a chunk ends, always
    * including the doc end) and `chunks` (the chunk texts) for
    * `textCol`. Intermediates are dropped. */
  def withChunks(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    df
      // ascending, duplicate-free, end-position-terminated by
      // construction (kernel contract); the DuckDB oracle replays the
      // same polynomial in SQL
      .withColumn("bounds", graft.functions.CdcBoundsFunctions.cdc_bounds(text))
      .withColumn("__spans",
        zip_with(
          concat(array(lit(0L)),
            slice(col("bounds"), lit(1), greatest(size(col("bounds")) - 1, lit(0)))),
          col("bounds"),
          (s, e) => struct(s.as("s"), e.as("e"))))
      .withColumn("chunks",
        transform(col("__spans"),
          sp => text.substr((sp("s") + 1).cast("int"), (sp("e") - sp("s")).cast("int"))))
      .drop("__spans")
  }
}
