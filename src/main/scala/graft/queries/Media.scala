package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column queries: binary payload + typed metadata plumbing.
  * The decode ladder is graded by what this JVM can actually read:
  * q_image_decode exercises the REAL `javax.imageio` encode→decode round
  * trip end-to-end (oracle-verified); the stub-decode queries keep the
  * schema/partitioning/batching surface for formats with no built-in
  * codec (see graft.multimodal.Multimodal).
  */
object Media {
  type Q = (SparkSession, String) => DataFrame

  /** Decode-metadata extraction over binary payloads (stub decode). */
  val qMultimodalMeta: Q = (s, d) => {
    val decoded = Multimodal.stubDecode(Multimodal.asMediaTable(Tables.documents(s, d)))
    decoded.select(
      col("media_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.n_frames").as("n_frames"))
      .orderBy("media_id")
  }

  /** Batched per-partition feature extraction (mapPartitions decode
    * shape). Oracle-paired: the corpus is pure ASCII (verified), so the
    * payload's unsigned-byte mean equals the mean of per-char code
    * points — an exact integer sum and one IEEE division, replayed in
    * DuckDB over ascii(char). */
  val qMediaFeatures: Q = (s, d) =>
    Multimodal.extractFeatures(s,
        Multimodal.asMediaTable(Tables.documents(s, d)))
      .orderBy("media_id")

  /** REAL image decode round trip: solid-color PNGs are ENCODED on
    * executors with width/height/color pure functions of the id, then
    * DECODED back through `javax.imageio` with per-channel pixel means.
    * The DuckDB oracle recomputes those functions arithmetically — a
    * green row certifies the actual codec round trip (dimensions AND
    * pixel values), not a byte-stat stand-in. Solid color ⇒ the channel
    * means are exact integers, so the float compare is exact. */
  val qImageDecode: Q = (s, d) =>
    Multimodal.decodeImages(s,
        Multimodal.syntheticPngs(s, Tables.documents(s, d)))
      .select(col("media_id"), col("width"), col("height"), col("channels"),
        col("mean_r"), col("mean_g"), col("mean_b"))
      .orderBy("media_id")

  /** REAL audio decode round trip: PCM WAVs are ENCODED on executors
    * with sample rate / frame count / sine frequency pure functions of
    * the id, then DECODED back through `javax.sound.sampled` (in every
    * JVM — no external codec). The DuckDB oracle recomputes the
    * container metadata arithmetically; frame counts are rate/100
    * multiples, so duration_ms is exactly 10·(1 + id mod 5) — an
    * integer-valued double, exact cross-engine. The signal-level RMS
    * check (samples actually decoded, not just the header) lives in the
    * spec (sine RMS = amp/√2). */
  val qAudioDecode: Q = (s, d) =>
    Multimodal.decodeAudio(s,
        Multimodal.syntheticWavs(s, Tables.documents(s, d)))
      .select(col("media_id"), col("sample_rate"), col("channels"),
        col("n_frames"), col("duration_ms"))
      .orderBy("media_id")

  /** Frame sampling: every 2nd frame index per payload (explode shape). */
  val qFrameSample: Q = (s, d) => {
    val decoded = Multimodal.stubDecode(Multimodal.asMediaTable(Tables.documents(s, d)))
    Multimodal.sampleFrames(decoded, 2)
      .orderBy("media_id", "frame_idx")
  }

  /** REAL multi-frame decode + sampling round trip — the video-frame-
    * extraction shape with an actual codec: animated GIFs (the one
    * multi-frame container `javax.imageio` both writes and reads in
    * every JVM) are ENCODED on executors with frame count / dimensions /
    * per-frame solid color pure functions of (id, frame_idx), then every
    * 2nd frame is DECODED back with per-frame pixel means. The oracle
    * recomputes everything arithmetically — a green row certifies frame
    * ENUMERATION (n_frames round-trips), frame SELECTION (sampled
    * indices), and per-frame PIXELS (mean_r exact: solid color survives
    * the GIF palette since each frame has one color). */
  val qGifFrames: Q = (s, d) =>
    Multimodal.decodeGifFrames(s,
        Multimodal.syntheticGifs(s, Tables.documents(s, d)), every = 2)
      .select(col("media_id"), col("n_frames"), col("frame_idx"),
        col("width"), col("height"), col("mean_r"))
      // checkpoint before the global sort: RangePartitioning's sampling
      // pass otherwise EXECUTES the whole encode→decode pipeline a
      // second time just to pick boundaries (r16; measured two ~2 s
      // pipeline runs back to back) — the narrow decoded rows
      // materialize once and both passes read them
      .localCheckpoint()
      .orderBy("media_id", "frame_idx")

  /** Perceptual near-dup image pairs ([[graft.multimodal.Phash]]):
    * id-patterned PNGs where each even/odd id pair renders the same
    * gradient+stripe pattern with a tiny retouch on the odd twin —
    * DCT pHash + 16-bit-band candidate join + exact hamming verify
    * should recover exactly the planted twins. Rows-only (a DCT over
    * decoded pixels has no SQL form); the twin-recovery precision/recall
    * invariant is spec-pinned. */
  val qImagePhash: Q = (s, d) =>
    graft.multimodal.Phash.nearDupPairs(s,
        graft.multimodal.Phash.patternPngs(s, Tables.documents(s, d)))
      .orderBy("a_id", "b_id")

  /** Dominant-tone detection (r7u) over the real WAV payloads: Goertzel
    * argmax over the candidate grid — the fixture plants freq =
    * 200 + (id mod 20)·50, so the oracle replays that arithmetic in
    * SQL and the comparison certifies the whole decode→DSP chain. */
  val qAudioSpectrum: Q = (s, d) =>
    Multimodal.detectTone(s,
        Multimodal.syntheticWavs(s, Tables.documents(s, d)))
      .select(col("media_id"), col("sample_rate"), col("n_frames"),
        col("detected_freq_hz"))
      // same sort-sampler double-execution guard as qGifFrames (r16)
      .localCheckpoint()
      .orderBy("media_id")

  /** Full-oracle pHash over the bounded integer-pattern corpus
    * ([[graft.multimodal.Phash.portablePngs]] — 200 32×32 PNGs whose
    * pixels are exact integer arithmetic of (id, x, y)): per twin pair,
    * both 64-bit hashes and their hamming distance. Runs the REAL
    * decode→sample→luma→DCT→median→bit-pack path (`Phash.phash64`, the
    * same code q_image_phash uses); the DuckDB oracle replays the whole
    * chain arithmetically — cos tables, row-major DCT sums in the
    * identical IEEE order, lower-median datum, bit packing — so a green
    * row certifies the hash function bit-for-bit, upgrading the pHash
    * component from rows-only (r14; the spectrum corpus keeps the
    * recall/precision spec). */
  val qPhashPortable: Q = (s, d) => {
    val hs = graft.multimodal.Phash.hashes(s,
      graft.multimodal.Phash.portablePngs(s, Tables.documents(s, d)))
    hs.groupBy(expr("media_id div 2").as("gid"))
      .agg(min(when(col("media_id") % 2 === 0, col("phash"))).as("phash_even"),
        min(when(col("media_id") % 2 === 1, col("phash"))).as("phash_odd"))
      .withColumn("hamming",
        bit_count(col("phash_even").bitwiseXOR(col("phash_odd"))).cast("long"))
      .orderBy("gid")
  }

  val all: Map[String, Q] = Map(
    "q_audio_spectrum" -> qAudioSpectrum,
    "q_image_phash" -> qImagePhash,
    "q_phash_portable" -> qPhashPortable,
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_media_features" -> qMediaFeatures,
    "q_image_decode" -> qImageDecode,
    "q_audio_decode" -> qAudioDecode,
    "q_frame_sample" -> qFrameSample,
    "q_gif_frames" -> qGifFrames,
  )

  val oracles: Map[String, String] = Map(
    // r14: the full pHash chain replayed arithmetically. Pixels are
    // integers by construction (bit-identical cross-engine); the DCT
    // sums run in the IDENTICAL IEEE order as Phash.phash64 (row-major
    // i ascending, (g·cosU)·cosV per term); the only cross-engine
    // wobble is StrictMath-vs-libm cos at ~1 ulp, ~1e-10 absolute on
    // coefficients whose median margins are O(100) by the corpus
    // design. ct[t] packs cos((2x+1)uπ/64) at t = u·32 + x; the AC list
    // is uv = u·8+v ascending, k = uv−1, threshold strictly-greater
    // against the lower-median datum (sorted[32], 1-based) — exactly
    // the Scala code.
    "q_phash_portable" ->
      """WITH ct AS (
        | SELECT list_transform(range(0, 256), t ->
        |   cos(((2 * (t % 32) + 1) * (t // 32)) * pi() / 64.0)) AS l),
        |px AS (
        | SELECT doc_id AS media_id,
        |  list_transform(range(0, 1024), i -> CAST(
        |    CASE WHEN doc_id % 2 = 1 AND i % 32 < 4 AND i // 32 < 4
        |     THEN least((i % 32 + 1) * (i // 32 + 3) * (doc_id // 2 + 7) % 251 + 45, 255)
        |     ELSE (i % 32 + 1) * (i // 32 + 3) * (doc_id // 2 + 7) % 251
        |    END AS DOUBLE)) AS g
        | FROM documents WHERE doc_id < 200),
        |ac AS (
        | SELECT media_id,
        |  list_transform(range(1, 64), uv ->
        |    list_sum(list_transform(range(0, 1024), i ->
        |      (g[i + 1] * ct.l[(uv // 8) * 32 + (i // 32) + 1])
        |        * ct.l[(uv % 8) * 32 + (i % 32) + 1]))) AS a
        | FROM px, ct),
        |md AS (SELECT media_id, a, list_sort(a)[32] AS med FROM ac),
        |hs AS (
        | SELECT media_id,
        |  CAST(list_sum(list_transform(range(0, 63), k ->
        |    CASE WHEN a[k + 1] > med THEN 1::BIGINT << k ELSE 0::BIGINT END))
        |   AS BIGINT) AS phash
        | FROM md)
        |SELECT media_id // 2 AS gid,
        | min(CASE WHEN media_id % 2 = 0 THEN phash END) AS phash_even,
        | min(CASE WHEN media_id % 2 = 1 THEN phash END) AS phash_odd,
        | CAST(bit_count(xor(min(CASE WHEN media_id % 2 = 0 THEN phash END),
        |   min(CASE WHEN media_id % 2 = 1 THEN phash END))) AS BIGINT) AS hamming
        |FROM hs GROUP BY 1 ORDER BY gid""".stripMargin,
    "q_audio_spectrum" ->
      """SELECT doc_id AS media_id,
        | CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
        | CAST(((8000 + (doc_id % 4) * 4000) // 100) * (1 + doc_id % 5) AS BIGINT) AS n_frames,
        | CAST(200 + (doc_id % 20) * 50 AS DOUBLE) AS detected_freq_hz
        |FROM documents
        |ORDER BY media_id""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id AS media_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
        | CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height,
        | CAST(1 + octet_length(encode(text)) % 16 AS INT) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_media_features" ->
      """SELECT doc_id AS media_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CASE WHEN length(text) = 0 THEN 0.0
        |  ELSE CAST(list_sum(list_transform(string_split(text, ''),
        |         c -> CAST(ascii(c) AS BIGINT))) AS DOUBLE)
        |       / octet_length(encode(text)) END AS mean_byte,
        | CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
        | CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_audio_decode" ->
      """SELECT doc_id AS media_id,
        | CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
        | CAST(1 AS BIGINT) AS channels,
        | CAST(((8000 + (doc_id % 4) * 4000) // 100) * (1 + doc_id % 5) AS BIGINT) AS n_frames,
        | CAST(10 * (1 + doc_id % 5) AS DOUBLE) AS duration_ms
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_image_decode" ->
      """SELECT doc_id AS media_id,
        | CAST(4 + doc_id % 60 AS BIGINT) AS width,
        | CAST(4 + (doc_id * 7) % 60 AS BIGINT) AS height,
        | CAST(3 AS BIGINT) AS channels,
        | CAST(((doc_id * 2654435761) % 16777216) // 65536 AS DOUBLE) AS mean_r,
        | CAST((((doc_id * 2654435761) % 16777216) // 256) % 256 AS DOUBLE) AS mean_g,
        | CAST(((doc_id * 2654435761) % 16777216) % 256 AS DOUBLE) AS mean_b
        |FROM documents ORDER BY media_id""".stripMargin,
    "q_frame_sample" ->
      """SELECT doc_id AS media_id,
        | CAST(unnest(range(0, 1 + octet_length(encode(text)) % 16, 2)) AS INT) AS frame_idx
        |FROM documents ORDER BY media_id, frame_idx""".stripMargin,
    "q_gif_frames" ->
      """WITH f AS (
        | SELECT doc_id, 2 + doc_id % 6 AS n_frames,
        |  unnest(range(0, 2 + doc_id % 6, 2)) AS fi
        | FROM documents)
        |SELECT doc_id AS media_id,
        | CAST(n_frames AS BIGINT) AS n_frames,
        | CAST(fi AS BIGINT) AS frame_idx,
        | CAST(8 + doc_id % 16 AS BIGINT) AS width,
        | CAST(8 + (doc_id * 3) % 16 AS BIGINT) AS height,
        | CAST((((doc_id * 31 + fi) * 2654435761) % 16777216) // 65536 AS DOUBLE) AS mean_r
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
  )
}
