package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * Two codec tiers. The synthetic [[MediaCodec]] (a deterministic fake
  * parsing a tiny self-describing header) stands in for audio/video
  * decode, which this container has no libraries for; everything
  * around it is real Spark plumbing — the schema contract, the batched
  * `mapPartitions` execution shape (mirroring `mapInPandas`-style
  * batch UDFs), binary-slice frame sampling, hash-derived feature
  * vectors. For IMAGES the codec is REAL: [[imageAverageHash]] /
  * [[decodeGray8x8]] run javax.imageio (JDK-native, present on every
  * executor) behind the same batched shape and the same hash algebra,
  * so actual PNG bytes from a crawl have an operator to call — the
  * swap the synthetic tier's docs promised, demonstrated in-tree.
  */
object Multimodal {

  /** Media row schema: the 100 TB layout keeps bytes in parquet binary
    * columns (or object-store pointers) partitioned by `kind`, with all
    * metadata in typed columns so pruning/filtering never touches bytes. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),  // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** STUB codec. Fake wire format: "GFT0" magic ++ kind byte ++
    * width:int ++ height:int ++ duration:long ++ payload. Deterministic,
    * pure, and cheap — stands in for a JNI/pandas decode. */
  object MediaCodec {
    val Magic: Array[Byte] = "GFT0".getBytes("UTF-8")

    def encode(kind: String, width: Int, height: Int, durationMs: Long,
        payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 1 + 4 + 4 + 8 + payload.length)
      bb.put(Magic).put(kind.head.toByte)
        .putInt(width).putInt(height).putLong(durationMs).put(payload)
      bb.array()
    }

    /** Decode header → (width, height, format, durationMs); None for
      * malformed bytes (routed to the failure side-output, never thrown —
      * the ST6/K8 failure-routing discipline). */
    def decodeMeta(bytes: Array[Byte]): Option[(Int, Int, String, Long)] = {
      if (bytes == null || bytes.length < 21 ||
          !bytes.take(4).sameElements(Magic)) None
      else {
        val bb = java.nio.ByteBuffer.wrap(bytes)
        bb.position(4)
        val kind = bb.get().toChar match {
          case 'i' => "image"; case 'a' => "audio"; case 'v' => "video"
          case _ => "unknown"
        }
        val w = bb.getInt; val h = bb.getInt; val d = bb.getLong
        Some((w, h, kind, d))
      }
    }
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("format", StringType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("payload_len", IntegerType, nullable = true),
    StructField("decode_ok", BooleanType, nullable = false)))

  /** Batched decode over partitions. The iterator is grouped into
    * fixed-size batches — the same execution shape as `mapInPandas`
    * (arrow batch in, arrow batch out) so a vectorized codec drops in
    * without changing the operator. */
  def decode(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select(col("media_id"), col("kind"), col("bytes"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a vectorized codec would process
          // one arrow RecordBatch
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val kind = r.getString(1)
            val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
            MediaCodec.decodeMeta(bytes) match {
              case Some((w, h, fmt, d)) =>
                Row(id, kind, w, h, fmt, d, bytes.length - 21, true)
              case None =>
                Row(id, kind, null, null, null, null,
                  if (bytes == null) null else bytes.length, false)
            }
          }
        }
      }(enc)
  }

  /** Frame sampling: slice the payload into `frameSize`-byte frames and
    * emit every `stride`-th one, ordinally indexed — the binary-column
    * analog of video frame extraction, expressed as a generator
    * (1→N flatMap), so it parallelizes per-document with no shuffle. */
  def sampleFrames(media: DataFrame, frameSize: Int = 64,
      stride: Int = 4): DataFrame = {
    val frameSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_index", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.select(col("media_id"), col("bytes"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.empty[Byte]
            else r.getAs[Array[Byte]](1)
          // malformed media (bad magic/truncated header) yields NO
          // frames — decode() flags it decode_ok=false, and fabricating
          // "frames" from arbitrary bytes here would hand garbage to a
          // pipeline that filtered on decode_ok but read frames raw
          val payload =
            if (MediaCodec.decodeMeta(bytes).isDefined) bytes.drop(21)
            else Array.empty[Byte]
          payload.grouped(frameSize).zipWithIndex.collect {
            case (frame, i) if i % stride == 0 => Row(id, i, frame)
          }
        }
      }(enc)
  }

  /** Resize: re-target an image/video to `targetW`×`targetH`. The codec
    * math is STUBBED (deterministic byte subsample standing in for real
    * interpolation) but the operator shape is production-true: batched
    * `mapPartitions` over the binary column, header metadata rewritten to
    * the new dimensions, malformed inputs passed through with
    * `resize_ok=false` instead of throwing (ST6 failure routing). */
  def resize(media: DataFrame, targetW: Int, targetH: Int,
      batchSize: Int = 256): DataFrame = {
    val resizedSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("bytes", BinaryType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("resize_ok", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(resizedSchema)
    media.select(col("media_id"), col("kind"), col("bytes"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val kind = r.getString(1)
            val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
            MediaCodec.decodeMeta(bytes) match {
              case Some((_, _, fmt, d)) =>
                val payload = bytes.drop(21)
                val target = targetW * targetH
                // stub interpolation: uniform byte subsample to the
                // target pixel budget (or pad-free truncate if smaller)
                val stride = math.max(1, payload.length / math.max(1, target))
                val out = payload.indices.by(stride).take(target)
                  .map(payload).toArray
                Row(id, kind,
                  MediaCodec.encode(fmt, targetW, targetH, d, out),
                  targetW, targetH, true)
              case None =>
                Row(id, kind, bytes, null, null, false)
            }
          }
        }
      }(enc)
  }

  /** Perceptual average-hash over the decoded payload — the aHash step
    * of image dedup: the first `window` payload bytes stand in for the
    * 8×8 grayscale downsample a real codec would produce (the
    * [[resize]] stub contract), and bit i of the hash is set iff
    * byte i exceeds the integer mean of the window. Runs in the same
    * batched `mapPartitions` shape as [[decode]]; malformed or
    * short-payload media yield NO row (they cannot be perceptually
    * compared — the decode_ok filter discipline).
    *
    * Determinism contract: on ASCII payloads the byte values equal the
    * codepoints an external engine reads with `ascii(substr(...))`, so
    * the full hash is oracle-replayable; a real grayscale codec swaps
    * in at the payload step with no change to the hash algebra. The
    * hash uses at most 63 bits (`window` ≤ 63): bit 63 would make
    * `1 << 63` overflow in engines with checked shifts (DuckDB raises)
    * — 63 sign-safe bits beat 64 engine-specific ones.
    *
    * Returns (media_id, ahash). */
  def averageHash(media: DataFrame, window: Int = 63): DataFrame = {
    require(window >= 1 && window <= 63,
      "window must stay within the 63 sign-safe hash bits")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select(col("media_id"), col("bytes"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          MediaCodec.decodeMeta(bytes) match {
            case Some(_) if bytes.length - 21 >= window =>
              val px = bytes.slice(21, 21 + window).map(_ & 0xFF)
              val mean = px.sum / window
              var h = 0L
              var i = 0
              while (i < window) {
                if (px(i) > mean) h |= (1L << i)
                i += 1
              }
              Some(Row(id, h))
            case _ => None
          }
        }
      }(enc)
  }

  /** Hamming near-dup pairs over perceptual hashes — the q33 SimHash
    * pigeonhole discipline applied to the media hash: 4 chunks of 16
    * bits each become band keys (hamming ≤ 3 guarantees ≥ 1 identical
    * chunk), the banded equi-join generates candidates, and
    * `bit_count(xor)` verifies. Collision-proportional cost, never
    * all-pairs; the only shuffled state is (media_id, chunk, hash).
    *
    * `hashes`: (media_id, ahash). Returns (d1, d2, hamming) with
    * d1 < d2 and hamming ≤ maxHamming. */
  def phashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "pigeonhole with 4 bands guarantees recall only to hamming 3")
    val bands = hashes.select(col("media_id"), col("ahash"),
      explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("chunk", expr("shiftright(ahash, cast(16 * k as int)) & 65535"))
    bands.as("a").join(bands.as("b"),
        col("a.k") === col("b.k") && col("a.chunk") === col("b.chunk") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("d1"), col("b.media_id").as("d2"),
        col("a.ahash").as("h1"), col("b.ahash").as("h2"))
      .distinct()
      .withColumn("hamming", expr("bit_count(h1 ^ h2)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  // -------------------------------------------------------------------
  // REAL image codec path (javax.imageio) — closes the "no operator to
  // call on actual PNG bytes" gap: same batched mapPartitions shape,
  // same aHash mean rule, a real lossless decode at the payload step.
  // -------------------------------------------------------------------

  /** Lossless grayscale PNG encode — the fixture/ingest-side twin of
    * [[decodeGray8x8]]: `pixels` is row-major w×h gray in [0,255],
    * written as TYPE_BYTE_GRAY so the decode side reads back the exact
    * samples (PNG is lossless; JPEG is NOT — a JPEG fixture could
    * never be oracle-predicted, which is why the analytic-oracle
    * discipline pins this path to PNG). */
  def encodePngGray(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == w * h, "pixels must be row-major w*h")
    javax.imageio.ImageIO.setUseCache(false) // no tmp-file spooling
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var p = 0
    while (p < pixels.length) {
      raster.setSample(p % w, p / w, 0, pixels(p) & 0xFF)
      p += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real-codec decode → 8×8 integer gray grid: javax.imageio reads
    * the bytes (PNG/BMP/GIF — whatever the JDK readers accept), gray
    * is the raster sample for grayscale images or the integer Rec.601
    * luma ((299r + 587g + 114b) div 1000) otherwise, and the grid is
    * an integer average-pool (floor block boundaries, floor mean) so
    * the whole chain is exact integer arithmetic an external engine
    * can replay when the source pixels are known. Returns None for
    * null/undecodable bytes (the decode_ok routing discipline — a
    * corrupt image yields no row, never a throw). */
  private[scale] def decodeGray8x8(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes == null || bytes.isEmpty) return None
    // NonFatal, not just IOException: fuzzed/truncated crawl bytes can
    // drive JDK plugin readers into IllegalArgument/IndexOutOfBounds
    // territory, and the decode_ok contract is no-row, never a crashed
    // task (MultimodalSpec fuzzes this path)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val isGray =
        img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      def grayAt(x: Int, y: Int): Int =
        if (isGray) img.getRaster.getSample(x, y, 0)
        else {
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
            (rgb & 0xFF) * 114) / 1000
        }
      val out = new Array[Int](64)
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          val x0 = bx * w / 8
          val x1 = math.max((bx + 1) * w / 8, x0 + 1)
          val y0 = by * h / 8
          val y1 = math.max((by + 1) * h / 8, y0 + 1)
          var s = 0
          var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += grayAt(x, y); n += 1; x += 1 }
            y += 1
          }
          out(by * 8 + bx) = s / n
          bx += 1
        }
        by += 1
      }
      Some(out)
    }
  }

  /** [[averageHash]] over REAL image bytes: javax.imageio grayscale
    * decode → integer 8×8 average-pool ([[decodeGray8x8]]) → the SAME
    * mean rule (bit i set iff pooled pixel i exceeds the integer mean
    * of the first `window` pixels, 63 sign-safe bits). Same batched
    * `mapPartitions` execution shape as [[decode]]; undecodable bytes
    * yield no row. The two paths share the hash algebra by contract:
    * MultimodalSpec pins this function against the rule-predicted hash
    * on a generated PNG fixture — the q41/q130 analytic-oracle
    * discipline with a REAL codec in the loop. */
  def imageAverageHash(images: DataFrame, window: Int = 63,
      batchSize: Int = 256): DataFrame = {
    require(window >= 1 && window <= 63,
      "window must stay within the 63 sign-safe hash bits")
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    images.select(col("media_id"), col("bytes"))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no tmp-file spooling
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            decodeGray8x8(bytes).map { px64 =>
              val px = px64.take(window)
              val mean = px.sum / window
              var hsh = 0L
              var i = 0
              while (i < window) {
                if (px(i) > mean) hsh |= (1L << i)
                i += 1
              }
              Row(id, hsh)
            }
          }
        }
      }(enc)
  }

  /** Hash-derived feature vector (stub for a real embedding model):
    * `dim` floats derived from xxhash64 of the bytes — Column-level, so
    * it runs in codegen and demonstrates the feature-extraction plumbing
    * (binary → fixed-width vector column). */
  def featureVector(media: DataFrame, dim: Int = 8): DataFrame =
    media.select(col("media_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("bytes"), i), lit(1000L)).cast("double") /
          lit(1000.0)).cast("float"))
        .as("features"))
}
