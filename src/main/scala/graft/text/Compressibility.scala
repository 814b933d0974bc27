package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import java.util.zip.Deflater

/** Deflate-compressibility scoring — the cheap entropy proxy used as a
  * corpus-quality signal: highly compressible text is repetitive
  * (boilerplate, templated spam, generation loops), incompressible text
  * is noise-like (minified code, base64 blobs); natural prose sits in a
  * known band. The same signal family as
  * [[graft.queries.Text]]'s repetition rules, but model-free and
  * byte-level.
  *
  * Engine shape: per-row zlib DEFLATE via `mapPartitions` — the same
  * justification as the media decoders ([[graft.multimodal.Multimodal]]):
  * no Catalyst expression exposes a compressor, and the codec object is
  * reused across a partition (one `Deflater` per partition, `reset()`
  * per row — allocation-free in the loop). Deterministic: zlib output
  * for a fixed input/level/strategy is stable, and only the LENGTH is
  * kept. Zero shuffle — the ratio column is narrow; downstream aggs
  * shuffle per-group doubles.
  */
object Compressibility {

  /** Appends `ratio` = deflated bytes / original bytes (UTF-8) for the
    * `text` column. Level 6 (zlib default) pinned explicitly so the
    * scores never shift under a JDK default change. */
  def withRatio(docs: DataFrame): DataFrame = {
    val schema = StructType(docs.schema.fields :+
      StructField("ratio", DoubleType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val textIdx = docs.schema.fieldIndex("text")
    docs.mapPartitions { rows =>
      val deflater = new Deflater(6)
      val buf = new Array[Byte](1 << 16)
      rows.map { r =>
        val bytes = r.getString(textIdx).getBytes("UTF-8")
        deflater.reset()
        deflater.setInput(bytes)
        deflater.finish()
        var out = 0L
        while (!deflater.finished()) out += deflater.deflate(buf)
        Row.fromSeq(r.toSeq :+ out.toDouble / math.max(bytes.length, 1))
      }
    }(enc)
  }
}
