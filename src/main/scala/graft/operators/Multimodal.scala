package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing (schemas, partition-preserving mapPartitions,
  * batch shapes, deterministic output) is REAL and tested. Two codecs
  * plug into the [[MediaDecoder]] seam: [[ImageIODecoder]] does REAL
  * PNG/JPEG/GIF/BMP decode+resize via the JDK's `javax.imageio` (no
  * extra dependencies); [[StubDecoder]] is the deterministic stand-in
  * the fixture oracle uses, because the fixtures' payload bytes are not
  * actual images (DuckDB recomputes the stub's md5 arithmetic exactly).
  * Audio/video codecs would plug into the same seam (e.g. javacv
  * outside this container).
  *
  * Scale notes: media bytes dominate row size — keep them in their own
  * column so Parquet column pruning skips them unless the stage needs
  * pixels; decode runs mapPartitions (one JVM-side pass, no per-row
  * driver involvement); feature vectors are narrow arrays that shuffle
  * cheaply for the downstream ANN/dedup joins.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque bytes. */
  case class MediaMeta(format: String, width: Int, height: Int, durationMs: Long)
  case class DecodedFrame(index: Int, width: Int, height: Int, pixels: Array[Byte])

  /** The integration point for real codecs. */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): DecodedFrame
    def resize(frame: DecodedFrame, w: Int, h: Int): DecodedFrame
  }

  /** STUB: deterministic fake decode — dimensions derived from the MD5
    * of the input bytes (width from hex chars 1-8, height from 9-16),
    * so the stub is reproducible in ANY engine: DuckDB recomputes it as
    * `('0x'||substr(md5(payload),1,8))::BIGINT % 1920 + 1` — which is
    * what lets the decode stage carry a full correctness oracle despite
    * the codec being a stand-in. Replace with a real codec (e.g.
    * javacv) outside this container. */
  object StubDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): DecodedFrame = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      // hex chars 1-8 = bytes 0-3 big-endian; chars 9-16 = bytes 4-7
      def u32(off: Int): Long = {
        var h = 0L
        var i = off
        while (i < off + 4) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
        h
      }
      val w = (u32(0) % 1920 + 1).toInt
      val ht = (u32(4) % 1080 + 1).toInt
      DecodedFrame(0, w, ht, bytes.take(16))
    }
    def resize(f: DecodedFrame, w: Int, h: Int): DecodedFrame =
      f.copy(width = w, height = h, pixels = f.pixels)
  }

  /** REAL codec: `javax.imageio` ships in the JDK, so PNG/JPEG/GIF/BMP
    * decode and resize need zero extra dependencies. Pixels come back as
    * packed 3-byte RGB rows (TYPE_3BYTE_BGR raster reordered), capped at
    * `maxPixelBytes` so a poison 10k×10k image can't blow an executor —
    * the width/height metadata is always exact, only the pixel payload
    * truncates. The fixture tables' `payload` bytes are NOT real images,
    * so the oracle path keeps [[StubDecoder]]; this decoder is for real
    * corpora and is spec-covered with genuine in-memory PNGs/JPEGs. */
  final class ImageIODecoder(maxPixelBytes: Int = 1 << 24) extends MediaDecoder {
    private def toFrame(img: java.awt.image.BufferedImage): DecodedFrame = {
      val w = img.getWidth; val h = img.getHeight
      val n = math.min(w.toLong * h * 3, maxPixelBytes.toLong).toInt
      val out = new Array[Byte](n)
      val rows = n / 3 / math.max(w, 1)
      // bulk row grab: per-pixel getRGB(x, y) pays color-model
      // conversion per CALL (~10-50× on megapixel images); one
      // getRGB(0, 0, w, rows, …) converts the block in one pass
      val packed =
        if (rows > 0) img.getRGB(0, 0, w, rows, null, 0, w) else Array.empty[Int]
      var p = 0
      while (p < packed.length && p * 3 + 2 < n) {
        val rgb = packed(p)
        out(p * 3) = ((rgb >> 16) & 0xff).toByte
        out(p * 3 + 1) = ((rgb >> 8) & 0xff).toByte
        out(p * 3 + 2) = (rgb & 0xff).toByte
        p += 1
      }
      // the truncation boundary may cut mid-row: finish the tail pixels
      var q = rows * w
      while (q * 3 + 2 < n) {
        val rgb = img.getRGB(q % w, q / w)
        out(q * 3) = ((rgb >> 16) & 0xff).toByte
        out(q * 3 + 1) = ((rgb >> 8) & 0xff).toByte
        out(q * 3 + 2) = (rgb & 0xff).toByte
        q += 1
      }
      DecodedFrame(0, w, h, out)
    }
    def decode(bytes: Array[Byte]): DecodedFrame = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException(
          s"undecodable image payload (${bytes.length} bytes; formats: " +
            javax.imageio.ImageIO.getReaderFormatNames.mkString(",") + ")")
      toFrame(img)
    }
    def resize(f: DecodedFrame, w: Int, h: Int): DecodedFrame = {
      // rebuild an image from the RGB rows we kept, then bilinear-scale
      val srcRows = math.min(f.height, f.pixels.length / 3 / math.max(f.width, 1))
      val src = new java.awt.image.BufferedImage(
        math.max(f.width, 1), math.max(srcRows, 1),
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      // bulk setRGB for the same per-call conversion reason as toFrame
      val packed = new Array[Int](srcRows * f.width)
      var p = 0
      while (p < packed.length) {
        val i = p * 3
        packed(p) = ((f.pixels(i) & 0xff) << 16) |
          ((f.pixels(i + 1) & 0xff) << 8) | (f.pixels(i + 2) & 0xff)
        p += 1
      }
      if (packed.nonEmpty)
        src.setRGB(0, 0, f.width, srcRows, packed, 0, f.width)
      val dst = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
      g.dispose()
      toFrame(dst)
    }
  }

  /** Attach media metadata columns from the binary payload — header
    * sniffing is cheap Column logic (magic bytes), no decode needed, so
    * it pushes down to the scan. */
  def withSniffedFormat(df: DataFrame, binCol: String): DataFrame = {
    val b = col(binCol)
    val head = base64(expr(s"substring($binCol, 1, 4)"))
    df.withColumn("format",
      when(head.startsWith("iVBO"), "png")          // \x89PNG
        .when(head.startsWith("/9j/"), "jpeg")      // \xFF\xD8\xFF
        .when(head.startsWith("R0lG"), "gif")       // GIF8
        .when(head.startsWith("UklG"), "webm/riff") // RIFF
        .otherwise("unknown"))
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pixel_head", BinaryType)))

  /** Decode stage: mapPartitions over (id, bytes) rows. Partitioning is
    * preserved; each partition decodes in one pass. */
  def decodeImages(df: DataFrame, idCol: String, binCol: String,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    val enc = Encoders.row(decodedSchema)
    df.select(col(idCol).cast(LongType), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val f = decoder.decode(r.getAs[Array[Byte]](1))
          org.apache.spark.sql.Row(r.getLong(0), f.width, f.height, f.pixels)
        }
      }(enc)
  }

  /** Resize stage: decode + resize in one partition pass (real
    * mapPartitions plumbing, stub kernel — a production decoder plugs
    * into the same [[MediaDecoder]] seam). */
  def resizeImages(df: DataFrame, idCol: String, binCol: String,
      w: Int, h: Int, decoder: MediaDecoder = StubDecoder): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    df.select(col(idCol).cast(LongType), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val f = decoder.resize(decoder.decode(r.getAs[Array[Byte]](1)), w, h)
          org.apache.spark.sql.Row(r.getLong(0), f.width, f.height, f.pixels)
        }
      }(enc)
  }

  /** Deterministic fake feature extraction: a dim-length Float vector
    * in [0,1) from per-dimension MD5s of the bytes — REAL plumbing
    * (schema, batching, normalization) with a stub kernel that any
    * engine can recompute (component i =
    * uint32(md5(i || ':' || payload)[0:8]) / 2^32). */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String, dim: Int): DataFrame =
    df.select(col(idCol),
      transform(sequence(lit(0), lit(dim - 1)),
        i => conv(substring(md5(concat(i.cast(StringType).cast(BinaryType),
              lit(":".getBytes), col(binCol))), 1, 8), 16, 10)
          .cast(LongType).cast(DoubleType) / 4294967296.0)
        .cast(ArrayType(FloatType)).as("features"))

  /** Frame sampling for "video" payloads: `n` EVENLY SPACED byte-slices
    * stand in for decoded frames (stub kernel, real explode shape) —
    * frame i starts at offset (len−frameBytes)·i / (n−1), the spacing a
    * real frame sampler would use over a timeline. Pure Column logic,
    * so it stays in the scan stage. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, n: Int,
      frameBytes: Int = 8): DataFrame = {
    require(n > 0, "sample at least one frame")
    val maxOff = greatest(length(col(binCol)) - frameBytes, lit(0)).cast(LongType)
    val d = lit(math.max(n - 1, 1).toLong)
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(n - 1)), i => {
          // exact floor division in long arithmetic (Column./ is double
          // division — subtract the remainder first, then the quotient
          // is an exactly-representable integer)
          val prod = maxOff * i
          val off = lit(1L) + (prod - pmod(prod, d)) / d
          col(binCol).substr(off.cast(IntegerType), lit(frameBytes))
        })))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
  }

  /** Perceptual average-hash (aHash) of a media payload: slot sums of
    * RGB byte triplets → bits vs the exact integer mean, one compiled
    * kernel pass per row in the scan stage
    * ([[graft.functions.VectorExpressions.AvgHash64]]). On a real
    * corpus run it over [[resizeImages]](8, 8) pixel bytes (192 bytes
    * = the 8×8 raster), where it is the classic perceptual hash;
    * on the fixture payloads the bytes stand in for the raster, the
    * same stub convention as [[sampleFrames]]/[[audioStats]]. */
  def perceptualHash(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.VectorExpressions.avg_hash64(col(binCol)).as("phash"))

  /** Image near-duplicate pairs by perceptual hash: aHash each payload,
    * then mine pairs with hamming distance <= `maxHamming` via the
    * exact-recall block-permutation banding shared with text SimHash
    * ([[Dedup.hammingPairsOf]] — Manku/Jain/Sarma WWW'07). The
    * re-encoded/re-compressed-copy detector a multimodal pipeline runs
    * where exact byte dedup misses.
    *
    * Scale: one kernel pass per image for the hash; candidates meet
    * only inside chunk-combo buckets (no all-pairs stage); `blocks`
    * trades explode fan-out against bucket crowding exactly as in
    * [[Dedup.simHashPairs]].
    *
    * Pair budgets DEFAULT-ON (exact opt-in by zeroing both):
    *  - `maxClique = 64`: identical-aHash groups over the budget (the
    *    re-encode/copy mass — the sf1 smoke's 9.93M pairs are mostly
    *    blown-up identical groups) emit a min-id STAR (n-1 rows)
    *    instead of a C(n,2) clique and send one representative into
    *    banding. Connected components are IDENTICAL to the exhaustive
    *    list's ([[Dedup.hammingPairsOf]]), so downstream clustering /
    *    apply-dedup see the same result with linear output. Exhaustive
    *    whenever no group exceeds 64 (every driver SF: max group 38 at
    *    sf0.1).
    *  - `maxBucket = 2000`: crowded (combo, key) candidate buckets
    *    sub-band on an extension chunk; identical-hash pairs always
    *    survive, output exact whenever no bucket exceeds the budget. */
  def phashPairs(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int, blocks: Int = 0, maxBucket: Int = 2000,
      maxClique: Int = 64): DataFrame = {
    val k = if (blocks <= 0) maxHamming + 1 else blocks
    require(k > maxHamming && k <= 64,
      s"blocks ($k) must exceed maxHamming ($maxHamming) for pigeonhole recall")
    Dedup.viaPersisted(df.select(col(idCol).as("id"),
        graft.functions.VectorExpressions.avg_hash64(col(binCol)).as("sim"))) {
      base => Dedup.hammingPairsOf(base, maxHamming, k, maxBucket, maxClique)
    }
  }

  /** Build the shippable perceptual-hash index for a media corpus: the
    * narrow (id, sim) aHash frame, parquet-safe — hash every payload
    * ONCE, then mine increments with [[phashPairsDelta]] instead of
    * re-hashing the corpus per batch (the multimodal mirror of
    * [[Dedup.simHashIndex]] / [[Dedup.MinHashIndex]]). */
  def phashIndex(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.VectorExpressions.avg_hash64(col(binCol)).as("sim"))

  /** Delta-mine perceptual near-dup pairs against a stored
    * [[phashIndex]] frame: only the increment's payloads are hashed;
    * output is every pair touching the increment. Budgets default on
    * exactly as in [[phashPairs]]. */
  def phashPairsDelta(indexFps: DataFrame, delta: DataFrame,
      idCol: String, binCol: String, maxHamming: Int, blocks: Int = 0,
      maxBucket: Int = 2000, maxClique: Int = 64): DataFrame = {
    val k = if (blocks <= 0) maxHamming + 1 else blocks
    require(k > maxHamming && k <= 64,
      s"blocks ($k) must exceed maxHamming ($maxHamming) for pigeonhole recall")
    Dedup.viaPersisted(phashIndex(delta, idCol, binCol)) { deltaFps =>
      Dedup.hammingPairsDelta(indexFps, deltaFps, maxHamming, k, maxBucket, maxClique)
    }
  }

  /** Audio-waveform statistics over a PCM-16LE payload: sample count,
    * duration at `rateHz`, RMS amplitude, zero-crossing rate. The byte
    * math is REAL (no codec needed — this is what a production pipeline
    * computes after its decoder), one compiled kernel per row in the
    * scan stage ([[graft.functions.VectorExpressions.PcmStats]]). */
  def audioStats(df: DataFrame, idCol: String, binCol: String,
      rateHz: Int = 16000): DataFrame = {
    require(rateHz > 0, "sample rate must be positive")
    val st = graft.functions.VectorExpressions.pcm_stats(col(binCol))
    df.select(col(idCol), st.as("__s"))
      .select(col(idCol),
        col("__s.n_samples").as("n_samples"),
        // integer `div`, not Column./ (double division)
        expr(s"(__s.n_samples * 1000) div $rateHz").as("duration_ms"),
        round(col("__s.rms"), 4).as("rms"),
        round(col("__s.zcr"), 4).as("zcr"))
  }
}
