package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content-defined chunking (the rsync/LBFS/FastCDC family): cut each
  * document where a rolling hash of the trailing `w`-char window hits a
  * boundary pattern (`hash mod divisor == 0`). Unlike fixed-width
  * chunking, an insertion early in a document shifts NO later chunk
  * boundaries — chunk-level dedup across document versions keeps
  * matching after edits, which is why CDC is the standard prefilter for
  * near-identical-version storage and crawl-snapshot dedup.
  *
  * Engine shape: everything is per-row higher-order-function expressions
  * (`transform`/`filter`/`aggregate` over the char-code array) — no UDF,
  * no explode until the final per-chunk accounting, zero shuffle in the
  * chunker itself. The polynomial window hash is EXACT integer math
  * (max term 0xFFFF·31⁷ ≈ 1.8e15, summed ×8 < 2⁶³), so boundaries are
  * bit-identical in any engine with 64-bit integers — the DuckDB oracle
  * replays the identical polynomial.
  */
object Chunker {
  val B = 31L          // polynomial base
  val Window = 8       // rolling window chars
  val Divisor = 64L    // boundary when hash % 64 == 0 → ~64-char chunks

  private val powers: Array[Long] =
    Array.iterate(1L, Window)(_ * B) // B^0 .. B^(w-1)

  /** 1-based char positions where a chunk ENDS (window hash hits the
    * boundary), always including the document end. */
  def boundaries(text: Column): Column = {
    // split("", -1) keeps a trailing empty string in Spark — slice it off
    // (DuckDB's string_split_regex does not produce one)
    val codes = transform(slice(split(text, ""), lit(1), length(text)),
      c => ascii(c).cast("long"))
    val n = size(codes)
    val hashAt = (i: Column) =>
      aggregate(sequence(lit(1), lit(Window)),
        lit(0L),
        (acc, j) => acc + element_at(codes, (i - Window + j).cast("int")) *
          element_at(array(powers.map(lit): _*), j.cast("int")))
    // cut strictly before the end, then append the end — keeps the list
    // ascending and duplicate-free WITHOUT array_distinct (whose
    // order-preservation DuckDB's list_distinct does not guarantee, and
    // the oracle replays this construction verbatim)
    val cut = filter(sequence(lit(Window), greatest(n, lit(Window))),
      i => i < n && pmod(hashAt(i), lit(Divisor)) === 0)
    concat(cut, array(n.cast("long")))
  }

  /** Array of (start-exclusive, end-inclusive) chunk spans from the
    * boundary positions: zip the 0-prepended bounds with themselves
    * shifted by one. */
  def chunkSpans(bounds: Column): Column = {
    val starts = concat(array(lit(0L)), slice(bounds, lit(1), size(bounds) - 1))
    zip_with(starts, bounds, (s, e) => struct(s.as("s"), e.as("e")))
  }

  /** The chunk texts themselves (substring by char positions). */
  def chunks(text: Column): Column =
    transform(chunkSpans(boundaries(text)),
      sp => text.substr((sp("s") + 1).cast("int"), (sp("e") - sp("s")).cast("int")))
}
