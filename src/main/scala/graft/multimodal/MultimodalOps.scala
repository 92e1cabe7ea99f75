package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q => RQ}
import graft.io.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata (BASELINE.json north_star).
  *
  * The container has no audio/video codecs, so DecodeStub below is a
  * clearly-marked DETERMINISTIC FAKE of that decode step; everything
  * Spark-side — binary column handling, metadata schema, the
  * mapPartitions batch shape (the Scala analog of `mapInPandas`:
  * partition-at-a-time iterator, decoder initialized once per partition,
  * not per row) — is real and oracle-/test-covered. Swapping DecodeStub
  * for a real codec changes no plumbing — and m63 PROVES it, running a
  * genuine PNG encode→decode round trip through the same seam with the
  * JDK's built-in javax.imageio codec.
  */
object MultimodalOps {

  /** One media row after "decode": typed metadata next to the payload. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,   // sniffed from fake magic bytes
      width: Int,
      height: Int,
      channels: Int)

  /** The decode seam. Real pipelines put JNI/codec init in `open()`,
    * called once per PARTITION (see m61), never per row. */
  object DecodeStub {
    /** Deterministic fake decode: dimensions derived from the payload's
      * MD5 so results are stable across runs/partitionings. */
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      def nib(i: Int): Int = (md(i / 2) >> (if (i % 2 == 0) 4 else 0)) & 0xf
      MediaMeta(
        doc_id = docId,
        n_bytes = payload.length.toLong,
        format = if (nib(0) < 8) "png" else "jpeg",
        width = 64 + nib(1) * 8,
        height = 64 + nib(2) * 8,
        channels = if (nib(3) < 12) 3 else 4)
    }
  }

  // ---------------------------------------------------------------- m60
  /** Pure-SQL binary metadata: UTF-8 payload bytes, byte length vs char
    * length (differs on multi-byte text), content hash, hex magic
    * prefix — the scan-side columns a multimodal table carries. */
  private def m60(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        octet_length($"text").cast("bigint").as("n_bytes"),
        length($"text").cast("bigint").as("n_chars"),
        md5($"text").as("content_md5"),
        substring(hex($"text".cast("binary")), 1, 8).as("magic_hex"))
      .orderBy($"doc_id")
  }
  private val m60Sql =
    """SELECT doc_id,
      | CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
      | CAST(LENGTH(text) AS BIGINT) AS n_chars,
      | MD5(text) AS content_md5,
      | SUBSTRING(HEX(ENCODE(text)), 1, 8) AS magic_hex
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The mapPartitions decode pipeline, exposed for reuse + tests. */
  def decoded(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // partition-scoped "decoder" init happens here, once
        it.map { case (id, payload) => DecodeStub.decode(id, payload) }
      }
  }

  // ---------------------------------------------------------------- m61
  /** Decode + feature-extract over binary payloads via mapPartitions.
    * The fake decode is pure MD5-nibble arithmetic, so the ORACLE can
    * restate it: DuckDB derives the same nibbles from md5(text) hex chars
    * (`strpos('0123456789abcdef', …) - 1`) — every "decoded" value is
    * hash-verified, while the Spark side still runs the real
    * partition-at-a-time decoder seam. The seam itself is proven LIVE
    * with two real JDK codecs — PNG (m63, javax.imageio) and WAV (m64,
    * javax.sound.sampled); this stub stands in only for codecs absent
    * from the JDK (video), with identical plumbing. */
  private def m61(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decoded(spark, dir).toDF()
      .select($"doc_id", $"n_bytes", $"format", $"width", $"height", $"channels")
      .orderBy($"doc_id")
  }
  private val m61Sql =
    """WITH m AS (
      |  SELECT doc_id, md5(text) AS h,
      |    CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |n AS (
      |  SELECT doc_id, n_bytes,
      |    strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS n0,
      |    strpos('0123456789abcdef', substr(h, 2, 1)) - 1 AS n1,
      |    strpos('0123456789abcdef', substr(h, 3, 1)) - 1 AS n2,
      |    strpos('0123456789abcdef', substr(h, 4, 1)) - 1 AS n3
      |  FROM m)
      |SELECT doc_id, n_bytes,
      | CASE WHEN n0 < 8 THEN 'png' ELSE 'jpeg' END AS format,
      | CAST(64 + n1 * 8 AS INTEGER) AS width,
      | CAST(64 + n2 * 8 AS INTEGER) AS height,
      | CAST(CASE WHEN n3 < 12 THEN 3 ELSE 4 END AS INTEGER) AS channels
      |FROM n ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m62
  /** Video FRAME SAMPLING plumbing: each payload gets a deterministic fake
    * duration, frame offsets are a bounded per-row sequence explode
    * (every 500 ms, at most 4 frames), and each frame gets a stable
    * signature in place of decoded pixels. The schema/explode/batch shape
    * is exactly the real frame-sampler's; only the codec is the
    * deterministic stand-in (same seam as DecodeStub). Exploding bounded
    * sequences keeps the blow-up per-row — no shuffle, scales linearly. */
  private def m62(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"text",
        (octet_length($"text") * 7 % 10000 + 1000).as("dur_ms"))
      .select($"doc_id", $"text", $"dur_ms",
        explode(expr("sequence(0, least(dur_ms - 1, 1500), 500)")).as("frame_ms"))
      .select(
        $"doc_id",
        $"dur_ms".cast("bigint").as("dur_ms"),
        $"frame_ms".cast("bigint").as("frame_ms"),
        md5(concat(md5($"text"), lit(":"), $"frame_ms".cast("string"))).as("frame_sig"))
      .orderBy($"doc_id", $"frame_ms")
  }
  private val m62Sql =
    """WITH v AS (
      |  SELECT doc_id, text,
      |    OCTET_LENGTH(ENCODE(text)) * 7 % 10000 + 1000 AS dur_ms
      |  FROM documents)
      |SELECT doc_id,
      | CAST(dur_ms AS BIGINT) AS dur_ms,
      | CAST(frame_ms AS BIGINT) AS frame_ms,
      | MD5(MD5(text) || ':' || CAST(frame_ms AS VARCHAR)) AS frame_sig
      |FROM v, LATERAL (SELECT UNNEST(range(0, LEAST(dur_ms - 1, 1500) + 1, 500)) AS frame_ms) t
      |ORDER BY doc_id, frame_ms""".stripMargin

  // ---------------------------------------------------------------- m63
  /** REAL codec round trip — no stub: the JDK's built-in javax.imageio
    * PNG codec (present in every Java 17 runtime, no external libs).
    * Stage 1 synthesizes an 8×8 RGB image whose pixels are a closed-form
    * function of (doc_id, x, y) and ENCODES it to genuine PNG bytes;
    * the bytes ship between stages as a binary column; stage 2 DECODES
    * them with ImageIO inside mapPartitions (codec init per PARTITION —
    * the same seam m61 stubs) and extracts features: dimensions,
    * PNG-signature check, per-channel pixel sums. PNG is lossless, so
    * the decoded sums equal the closed-form arithmetic the DuckDB
    * oracle states over a generate_series grid — the oracle never
    * parses PNG, it gates the encode→ship→decode round trip. */
  private def m63(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Side = 8
    val encoded: Dataset[(Long, Array[Byte])] = Tables.documents(spark, dir)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            Side, Side, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < Side) {
            var x = 0
            while (x < Side) {
              val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
              val g = ((id * 17 + x * 11 + y * 5) % 256).toInt
              val b = ((id * 23 + x * 3 + y * 19) % 256).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
    encoded
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // the 8-byte PNG signature is fixed by the spec
          val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
          val isPng = bytes.length > 8 &&
            sig.indices.forall(i => (bytes(i) & 0xff) == (sig(i) & 0xff))
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
              x += 1
            }
            y += 1
          }
          (id, isPng, img.getWidth, img.getHeight, rs, gs, bs)
        }
      }
      .toDF("doc_id", "is_png", "width", "height", "r_sum", "g_sum", "b_sum")
      .orderBy($"doc_id")
  }
  private val m63Sql =
    """WITH grid AS (
      |  SELECT x.g AS x, y.g AS y
      |  FROM generate_series(0, 7) x(g), generate_series(0, 7) y(g))
      |SELECT doc_id, true AS is_png,
      | CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
      | CAST(SUM((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS r_sum,
      | CAST(SUM((doc_id * 17 + x * 11 + y * 5) % 256) AS BIGINT) AS g_sum,
      | CAST(SUM((doc_id * 23 + x * 3 + y * 19) % 256) AS BIGINT) AS b_sum
      |FROM documents, grid GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m65
  /** REAL MULTI-FRAME codec round trip — the video-frames seam (m62
    * samples frame indices; m61 stubs the decode) driven by a genuine
    * animated-GIF codec from the JDK's javax.imageio (no external
    * libs). Stage 1 synthesizes 1 + doc_id % 3 indexed-color 8×8 frames
    * per document (identity gray palette — GIF is palette-exact, so the
    * round trip is lossless) and ENCODES them into ONE animated GIF via
    * the writer's writeToSequence; stage 2 DECODES with an ImageReader
    * inside mapPartitions, counts frames with getNumImages, and sums
    * every frame's gray levels. The oracle states the closed-form
    * arithmetic over a (frame, x, y) grid — it never parses GIF; frame
    * count and pixel sums must both survive the container. */
  private def m65(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Side = 8
    val encoded: Dataset[(Long, Array[Byte])] = Tables.documents(spark, dir)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        // identity 256-gray palette: stored index == gray level, so the
        // decoder's RGB red channel recovers the index exactly
        val ramp = Array.tabulate(256)(_.toByte)
        val palette = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
        it.map { id =>
          val nFrames = (1 + id % 3).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val writer =
            javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(Side, Side,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
            val raster = img.getRaster
            var y = 0
            while (y < Side) {
              var x = 0
              while (x < Side) {
                raster.setSample(x, y, 0,
                  ((id * 7 + f * 29 + x * 3 + y * 11) % 256).toInt)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          writer.dispose()
          (id, bos.toByteArray)
        }
      }
    encoded
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val isGif = bytes.length > 6 &&
            new String(bytes, 0, 3, "US-ASCII") == "GIF"
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val reader =
            javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          var s = 0L
          var f = 0
          while (f < n) {
            val img = reader.read(f)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                s += (img.getRGB(x, y) >> 16) & 0xff
                x += 1
              }
              y += 1
            }
            f += 1
          }
          reader.dispose()
          iis.close()
          (id, isGif, n, s)
        }
      }
      .toDF("doc_id", "is_gif", "n_frames", "gray_sum")
      .orderBy($"doc_id")
  }
  private val m65Sql =
    """SELECT d.doc_id,
      | true AS is_gif,
      | CAST(1 + d.doc_id % 3 AS INT) AS n_frames,
      | (SELECT CAST(SUM((d.doc_id * 7 + f.range * 29 + x.range * 3 + y.range * 11) % 256) AS BIGINT)
      |  FROM range(0, 3) f, range(0, 8) x, range(0, 8) y
      |  WHERE f.range < 1 + d.doc_id % 3) AS gray_sum
      |FROM documents d ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------- m64
  /** REAL audio codec round trip — the second live codec after m63's
    * PNG, via the JDK's built-in javax.sound.sampled WAV support (no
    * external libs). Stage 1 synthesizes 64 PCM16 mono samples per doc
    * as a closed-form function of (doc_id, i) and ENCODES them to a
    * genuine RIFF/WAVE container; stage 2 DECODES with AudioSystem
    * inside mapPartitions (decoder init per PARTITION — m61's seam) and
    * extracts: RIFF signature check, format fields, frame count, and
    * the exact integer sample sum. PCM is lossless, so the decoded sum
    * equals the closed-form arithmetic the oracle states — the oracle
    * never parses WAV, it gates the encode→ship→decode round trip. */
  private def m64(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val N = 64
    val Rate = 8000f
    val encoded: Dataset[(Long, Array[Byte])] = Tables.documents(spark, dir)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        val fmt = new javax.sound.sampled.AudioFormat(
          Rate, 16, 1, true, false) // PCM16 mono signed little-endian
        it.map { id =>
          val raw = new Array[Byte](N * 2)
          var i = 0
          while (i < N) {
            val s = ((id * 31 + i * 7) % 4096 - 2048).toInt
            raw(2 * i) = (s & 0xff).toByte
            raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(raw), fmt, N.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }
    encoded
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val isRiff = bytes.length > 12 &&
            bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
            bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
            bytes(10) == 'V' && bytes(11) == 'E'
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val f = ais.getFormat
          val frames = ais.getFrameLength
          val data = ais.readAllBytes()
          var sum = 0L
          var i = 0
          while (i + 1 < data.length) {
            sum += ((data(i) & 0xff) | (data(i + 1).toInt << 8)).toShort.toLong
            i += 2
          }
          (id, isRiff, f.getSampleRate.toInt, f.getChannels,
            f.getSampleSizeInBits, frames, sum)
        }
      }
      .toDF("doc_id", "is_riff", "sample_rate", "channels", "bits",
        "n_frames", "sum_samples")
      .orderBy($"doc_id")
  }
  private val m64Sql =
    """WITH idx AS (SELECT g AS i FROM generate_series(0, 63) t(g))
      |SELECT doc_id, true AS is_riff,
      | CAST(8000 AS INTEGER) AS sample_rate,
      | CAST(1 AS INTEGER) AS channels,
      | CAST(16 AS INTEGER) AS bits,
      | CAST(64 AS BIGINT) AS n_frames,
      | CAST(SUM((doc_id * 31 + i * 7) % 4096 - 2048) AS BIGINT) AS sum_samples
      |FROM documents, idx GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val all: Seq[RQ] = Seq(
    RQ("m60_binary_meta", m60, Some(m60Sql)),
    RQ("m61_decode_stub", m61, Some(m61Sql)),
    RQ("m62_frame_sample", m62, Some(m62Sql)),
    RQ("m63_png_roundtrip", m63, Some(m63Sql)),
    RQ("m64_wav_roundtrip", m64, Some(m64Sql)),
    RQ("m65_gif_frames", m65, Some(m65Sql)))
}
