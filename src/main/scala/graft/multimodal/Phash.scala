package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image hashing (the classic DCT pHash) + near-duplicate
  * image pairing — image-level dedup for a multimodal corpus: re-encoded,
  * slightly-retouched, or resized copies of one image land within a few
  * bits of each other, while distinct images differ in ~32 of 64 bits.
  *
  * Pipeline shape (all per-row until the candidate join):
  *  1. decode + hash in ONE `mapPartitions` pass (javax.imageio, same
  *     justification and SPI as [[Multimodal.decodeWith]]): nearest-
  *     sample to 32×32 grayscale, 2-D DCT-II (StrictMath cos table —
  *     bit-stable anywhere), threshold the 63 low-frequency AC
  *     coefficients against their median → one 64-bit long per image.
  *  2. candidate generation by BANDING the hash into 4×16-bit words
  *     (pigeonhole: hamming ≤ 10 pairs collide on ≥ 1 word when bits
  *     spread — the same OR-amplification the SimHash text path uses):
  *     equality join on (band, word), never an all-pairs compare.
  *  3. exact verify: bit_count(xor) ≤ threshold — codegen'd.
  *
  * 100 TB shape: payload bytes never shuffle (hashes are 8 B/row); the
  * join is equality on 8-byte keys; Σ|bucket|² is bounded because a
  * 16-bit word over diverse images spreads across 65 536 buckets.
  */
object Phash {

  private val N = 32 // resample grid; DCT over the full grid, keep 8×8

  private lazy val cosTable: Array[Array[Double]] = {
    // cos((2x+1)·u·π / 2N) via StrictMath: identical bits on every JVM
    Array.tabulate(N, N)((u, x) =>
      StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * N)))
  }

  /** 64-bit perceptual hash of a decoded image. Deterministic: nearest
    * sampling, integer luma, StrictMath DCT, lower-median threshold. */
  def phash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val g = Array.ofDim[Double](N, N)
    var y = 0
    while (y < N) {
      var x = 0
      while (x < N) {
        val p = img.getRGB(x * w / N, y * h / N)
        g(y)(x) = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
          (p & 0xff) * 114) / 1000.0
        x += 1
      }
      y += 1
    }
    // 2-D DCT-II, keeping only the 8×8 low-frequency block
    val dct = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < N) {
          var xx = 0
          while (xx < N) {
            s += g(yy)(xx) * cosTable(u)(yy) * cosTable(v)(xx)
            xx += 1
          }
          yy += 1
        }
        dct(u)(v) = s
        v += 1
      }
      u += 1
    }
    val ac = (for (i <- 0 until 8; j <- 0 until 8 if i != 0 || j != 0)
      yield dct(i)(j)).toArray
    val med = ac.sorted.apply((ac.length + 1) / 2 - 1) // lower median datum
    var bits = 0L
    var k = 0
    for (i <- 0 until 8; j <- 0 until 8 if i != 0 || j != 0) {
      if (dct(i)(j) > med) bits |= (1L << k)
      k += 1
    }
    bits
  }

  /** (media_id, phash) for every decodable payload — one decode+hash
    * pass, unreadable rows dropped (they have no perceptual content). */
  def hashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        Multimodal.disableImageIoFileCache()
        it.flatMap { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null) None else Some((id, phash64(img)))
        }
      }.toDF("media_id", "phash")
  }

  /** Near-duplicate image pairs: banded candidates, exact hamming
    * verify, `maxHamming` bits apart or closer. */
  def nearDupPairs(spark: SparkSession, media: DataFrame,
                   maxHamming: Int = 10): DataFrame = {
    val hs = hashes(spark, media)
    val banded = hs.select(col("media_id"), col("phash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("phash"), b * 16).bitwiseAND(lit(0xffffL)).as("word"))): _*))
          .as("bw"))
      .select(col("media_id"), col("phash"),
        col("bw.band").as("band"), col("bw.word").as("word"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.word") === col("b.word") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"),
        col("a.phash").as("pa"), col("b.phash").as("pb"))
      .distinct()
      .withColumn("hamming", bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Bounded PORTABLE corpus for the full-chain SQL oracle (r14): 200
    * 32×32 PNGs (doc_id < 200 — dense base ids, so the bound holds at
    * every SF and probe corpus) whose every pixel is exact INTEGER
    * arithmetic of (id, x, y): luma = ((x+1)·(y+3)·(gid+7)) mod 251, a
    * non-separable product-mod-prime pattern (pseudo-random spread ⇒
    * every AC coefficient sits hundreds away from the median, vs the
    * ~1e-10 cross-engine wobble from StrictMath-vs-libm cos), odd twin
    * retouched +45 on the 4×4 corner (measured twin hamming 0–10,
    * mean ≈ 4 — real near-dup distances, so the pairing arithmetic is
    * certified on non-trivial values). At 32×32 the phash grid equals
    * the image grid (nearest sampling = identity) and gray pixels make
    * luma exact (c·1000/1000.0), so a DuckDB replay of the DCT +
    * median + bit-pack sees bit-identical pixel input — q_phash_portable
    * holds the REAL decode→hash code path to a full oracle, the
    * q_simhash_portable pattern. The splitmix64 spectrum corpus below
    * stays the recall/precision fixture (its float synthesis has no
    * cheap SQL form). */
  def portablePngs(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    ids.select(col("doc_id")).filter(col("doc_id") < 200)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { it =>
        Multimodal.disableImageIoFileCache()
        it.map { id =>
          val gid = id / 2
          val img = new java.awt.image.BufferedImage(
            32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              val base = (((x + 1).toLong * (y + 3) * (gid + 7)) % 251L).toInt
              val c = if (id % 2 == 1 && x < 4 && y < 4) math.min(base + 45, 255)
                else base
              img.setRGB(x, y, (c << 16) | (c << 8) | c)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }.toDF("media_id", "payload")
  }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Pattern parameters for gid — the 64-bit mixed seed that fully
    * determines the synthetic image's spectrum, split into ints for the
    * spec's equality compare. Distinct gids always have distinct params,
    * so ANY non-twin near-dup pair the banding join surfaces is a hash
    * error by definition (the spec asserts there are none). */
  def patternParams(gid: Long): (Int, Int, Int, Int) = {
    val s = splitmix64(gid)
    ((s >>> 48).toInt, ((s >>> 32) & 0xffff).toInt,
      ((s >>> 16) & 0xffff).toInt, (s & 0xffff).toInt)
  }

  /** Per-gid pseudo-random low-frequency spectrum: one amplitude for
    * every AC coefficient of the 8×8 block the hash keeps, sign uniform,
    * magnitude bounded away from zero (|a| ∈ [0.35, 1]). Every hash bit
    * therefore has solid energy behind it — the property real photos'
    * 1/f spectra give pHash, and exactly what a stripes-only synthetic
    * pattern lacks (its off-axis coefficients hover at the median, so
    * bits flip on any perturbation). */
  private def spectrum(gid: Long): Array[Array[Double]] = {
    val a = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          val h = splitmix64(gid * 64 + u * 8 + v)
          val mag = 0.35 + 0.65 * ((h >>> 11).toDouble / (1L << 53).toDouble)
          a(u)(v) = if ((h & 1L) == 0L) mag else -mag
        }
        v += 1
      }
      u += 1
    }
    a
  }

  /** Patterned synthetic PNGs for the pHash path: consecutive (2k, 2k+1)
    * ids render the SAME gid-derived pattern — an inverse-DCT image of
    * the gid's [[spectrum]] — the odd one with a small corner retouch
    * (+45 luma on a 2×2 patch) — planted near-dup twins; different k →
    * visually distinct patterns ~32/64 hash bits apart. (The solid-color
    * [[Multimodal.syntheticPngs]] corpus is degenerate for a DCT hash:
    * every AC coefficient is zero.) */
  def patternPngs(spark: SparkSession, ids: DataFrame): DataFrame = {
    import spark.implicits._
    // the id column comes from a single small parquet file → 1 scan
    // partition; PNG encode + DCT are CPU-bound per row, so spread the
    // (8-byte) ids across all cores before the heavy mapPartitions
    ids.select(col("doc_id")).repartition(spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions { it =>
      Multimodal.disableImageIoFileCache()
      val w = 64; val h = 64
      // cos(π·u·(2x+1) / 2W) over the synthesis grid (StrictMath: bit-stable)
      val cosW = Array.tabulate(8, w)((u, x) =>
        StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * w)))
      it.map { id =>
        val gid = id / 2
        val a = spectrum(gid)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var s = 0.0
            var u = 0
            while (u < 8) {
              var v = 0
              while (v < 8) {
                s += a(u)(v) * cosW(v)(x) * cosW(u)(y)
                v += 1
              }
              u += 1
            }
            // A=8: coefficient floor ≈ 8·0.35·256 ≈ 700 ≫ the ≤45 retouch
            // delta, so twins land ≤3 bits apart — inside the 4-band
            // pigeonhole recall guarantee (hamming ≤3 → ≥1 clean band)
            var g = 128 + (8.0 * s).toInt
            // the retouch lives on the EVEN sampling grid (phash64 reads
            // x·64/32 = even pixels), so the twin's hash sees exactly one
            // perturbed sample — a delta far below the spectrum floor
            if (id % 2 == 1 && x < 2 && y < 2) g += 45
            val c = if (g < 0) 0 else if (g > 255) 255 else g
            img.setRGB(x, y, (c << 16) | (c << 8) | c)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }
    }.toDF("media_id", "payload")
  }
}
