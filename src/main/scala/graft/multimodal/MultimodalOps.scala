package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q => RQ}
import graft.io.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata (BASELINE.json north_star).
  *
  * Every query here runs REAL codecs from the Java 17 runtime — PNG and
  * GIF via javax.imageio, WAV via javax.sound.sampled — through the
  * mapPartitions batch shape (the Scala analog of `mapInPandas`:
  * partition-at-a-time iterator, decoder initialized once per
  * partition, never per row). m61 sniffs MIXED payloads by magic bytes
  * and routes to the right decoder; m62 drives frame sampling off the
  * WAV header's actual duration; m63/m64/m65 are the per-codec round
  * trips. The payloads are synthesized from closed-form pixel/sample
  * functions, so the DuckDB oracles gate the full encode→ship→sniff→
  * decode pipeline without parsing any container themselves. */
object MultimodalOps {

  /** PCM16 mono WAV bytes: `n` samples at `rate` Hz, sample i =
    * (id·31 + i·7) mod 4096 − 2048 — the closed form every WAV oracle
    * restates. */
  private def wavBytes(id: Long, n: Int, rate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((id * 31 + i * 7) % 4096 - 2048).toInt
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
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

  // ---------------------------------------------------------------- m61
  /** MIXED-PAYLOAD CONTENT SNIFFING over real bytes: stage 1 encodes a
    * GENUINE container per document — PNG (javax.imageio) for even ids,
    * WAV (javax.sound.sampled) for odd — with dimensions/frame counts a
    * closed-form function of doc_id; stage 2 receives only the opaque
    * binary column, sniffs the MAGIC BYTES (\x89PNG vs RIFF/WAVE),
    * routes each payload to the matching decoder inside mapPartitions
    * (both decoders initialized once per partition), and extracts typed
    * metadata. This is the heterogeneous-lake shape: one binary column,
    * many formats, decode dispatched by content, not by a column the
    * writer promised. The oracle restates the closed-form properties —
    * it never parses a container; a sniff or decode error surfaces as a
    * hash mismatch. */
  private def m61(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val encoded: Dataset[(Long, Array[Byte])] = Tables.documents(spark, dir)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          if (id % 2 == 0) {
            val w = 4 + (id % 5).toInt
            val h = 4 + (id % 3).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.setRGB(x, y, ((id * 131 + y * w + x) % 0x1000000).toInt)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            (id, bos.toByteArray)
          } else (id, wavBytes(id, n = 32 + (id % 17).toInt, rate = 8000f))
        }
      }
    encoded
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val isPng = bytes.length > 8 &&
            (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
            bytes(2) == 'N' && bytes(3) == 'G'
          val isWav = bytes.length > 12 &&
            bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
            bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
            bytes(10) == 'V' && bytes(11) == 'E'
          if (isPng) {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            (id, "png", img.getWidth.toLong, img.getHeight.toLong,
              img.getColorModel.getNumComponents)
          } else if (isWav) {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            (id, "wav", ais.getFrameLength,
              ais.getFormat.getSampleRate.toLong, ais.getFormat.getChannels)
          } else (id, "unknown", -1L, -1L, -1)
        }
      }
      .toDF("doc_id", "format", "dim1", "dim2", "channels")
      .orderBy($"doc_id")
  }
  private val m61Sql =
    """SELECT doc_id,
      | CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
      | CAST(CASE WHEN doc_id % 2 = 0 THEN 4 + doc_id % 5
      |   ELSE 32 + doc_id % 17 END AS BIGINT) AS dim1,
      | CAST(CASE WHEN doc_id % 2 = 0 THEN 4 + doc_id % 3
      |   ELSE 8000 END AS BIGINT) AS dim2,
      | CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INTEGER) AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m62
  /** FRAME SAMPLING driven by the container's REAL header: stage 1
    * encodes a genuine WAV per document (100 Hz PCM16, sample count —
    * and therefore duration — a closed-form function of doc_id);
    * stage 2 parses the header with javax.sound (duration = frames /
    * rate, read from the bytes, not trusted from a column), explodes
    * one frame offset per 500 ms (capped at 4 — bounded per-row
    * blow-up, no shuffle), and fingerprints each frame with the DECODED
    * sample at that offset. The oracle recomputes duration, offsets,
    * and the sample value from the closed form — a header misparse, an
    * off-by-one in the offset→sample index map, or a PCM decode error
    * all surface as hash mismatches. */
  private def m62(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Rate = 100f
    val encoded: Dataset[(Long, Array[Byte])] = Tables.documents(spark, dir)
      .select($"doc_id").as[Long]
      .mapPartitions(_.map(id =>
        (id, wavBytes(id, n = ((id * 7) % 1000 + 100).toInt, rate = Rate))))
    encoded
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val rate = ais.getFormat.getSampleRate
          val frames = ais.getFrameLength
          val durMs = frames * 1000L / rate.toLong
          val pcm = ais.readAllBytes()
          def sampleAt(i: Int): Int =
            ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1).toInt << 8)).toShort.toInt
          (0L to math.min(durMs - 1, 1500L) by 500L).map { frameMs =>
            val idx = (frameMs * rate.toLong / 1000L).toInt
            val sig = md.digest(s"$id:$frameMs:${sampleAt(idx)}"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              .map("%02x".format(_)).mkString
            (id, durMs, frameMs, sig)
          }
        }
      }
      .toDF("doc_id", "dur_ms", "frame_ms", "frame_sig")
      .orderBy($"doc_id", $"frame_ms")
  }
  private val m62Sql =
    """WITH v AS (
      |  SELECT doc_id, (doc_id * 7) % 1000 + 100 AS n_samples,
      |    ((doc_id * 7) % 1000 + 100) * 10 AS dur_ms
      |  FROM documents)
      |SELECT doc_id,
      | CAST(dur_ms AS BIGINT) AS dur_ms,
      | CAST(frame_ms AS BIGINT) AS frame_ms,
      | MD5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_ms AS VARCHAR) || ':'
      |   || CAST((doc_id * 31 + (frame_ms // 10) * 7) % 4096 - 2048 AS VARCHAR))
      |   AS frame_sig
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
      .mapPartitions(_.map(id => (id, wavBytes(id, N, Rate))))
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

  // ---------------------------------------------------------------- m66
  /** IMAGE RESIZE over a binary column — the thumbnail stage every
    * image-training pipeline runs between decode and feature
    * extraction. Three real stages: (1) encode a 16×16 closed-form RGB
    * PNG per document; (2) decode → downsample 2× → re-encode an 8×8
    * PNG thumbnail, all inside one mapPartitions (codec init per
    * partition; the binary column in, binary column out shape is
    * exactly how a resize stage slots into a lakehouse table at
    * 100 TB — no driver involvement, output rows same count as input);
    * (3) decode the THUMBNAIL bytes and extract dimensions + channel
    * sums. The resample kernel is explicit strided nearest-neighbor —
    * dst(x,y) = src(2x, 2y) — rather than Graphics2D interpolation,
    * because closed-form pixels are what let the DuckDB oracle gate
    * the full decode→resize→encode→decode chain bit-exactly (AWT's
    * filtered scalers are implementation-defined; a training pipeline
    * wanting bilinear swaps one inner loop, the Spark plumbing is
    * identical). */
  private def m66(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Src = 16
    val Dst = 8
    val full: Dataset[(Long, Array[Byte])] = Tables.documents(spark, dir)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            Src, Src, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < Src) {
            var x = 0
            while (x < Src) {
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
    val thumbs: Dataset[(Long, Array[Byte])] = full
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val src = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          val dst = new java.awt.image.BufferedImage(
            Dst, Dst, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < Dst) {
            var x = 0
            while (x < Dst) {
              dst.setRGB(x, y, src.getRGB(2 * x, 2 * y))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          (id, bos.toByteArray)
        }
      }
    thumbs
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
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
          (id, img.getWidth, img.getHeight, rs, gs, bs)
        }
      }
      .toDF("doc_id", "width", "height", "r_sum", "g_sum", "b_sum")
      .orderBy($"doc_id")
  }
  private val m66Sql =
    """WITH grid AS (
      |  SELECT x.g AS x, y.g AS y
      |  FROM generate_series(0, 7) x(g), generate_series(0, 7) y(g))
      |SELECT doc_id,
      | CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
      | CAST(SUM((doc_id * 31 + 2 * x * 7 + 2 * y * 13) % 256) AS BIGINT) AS r_sum,
      | CAST(SUM((doc_id * 17 + 2 * x * 11 + 2 * y * 5) % 256) AS BIGINT) AS g_sum,
      | CAST(SUM((doc_id * 23 + 2 * x * 3 + 2 * y * 19) % 256) AS BIGINT) AS b_sum
      |FROM documents, grid GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m67
  /** AUDIO RESAMPLE over a binary column — m66's twin for the audio
    * modality: (1) encode a closed-form 8 kHz PCM16 WAV per document;
    * (2) decode → decimate 2× (keep every second sample — the explicit
    * strided kernel, same reasoning as m66: a deterministic resample
    * the oracle can restate; a production pipeline swaps in a
    * windowed-sinc kernel, the Spark plumbing is identical) →
    * re-encode at 4 kHz, inside one mapPartitions; (3) decode the
    * RESAMPLED bytes and extract rate, frame count, and sample sum.
    * The oracle restates the arithmetic over the even source
    * indices. */
  private def m67(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val full: Dataset[(Long, Array[Byte])] = Tables.documents(spark, dir)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        it.map(id => (id, wavBytes(id, n = 64 + (id % 17).toInt, rate = 8000f)))
      }
    val resampled: Dataset[(Long, Array[Byte])] = full
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          val kept = (n + 1) / 2
          val out = new Array[Byte](kept * 2)
          var j = 0
          while (j < kept) {
            out(2 * j) = raw(4 * j)
            out(2 * j + 1) = raw(4 * j + 1)
            j += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(4000f, 16, 1, true, false)
          val outAis = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(out), fmt, kept.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            outAis, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }
    resampled
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val rate = ais.getFormat.getSampleRate.toInt
          val raw = ais.readAllBytes()
          val frames = raw.length / 2
          var sum = 0L
          var i = 0
          while (i < frames) {
            sum += ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
            i += 1
          }
          (id, rate, frames.toLong, sum)
        }
      }
      .toDF("doc_id", "rate_hz", "n_frames", "sum_samples")
      .orderBy($"doc_id")
  }
  private val m67Sql =
    """WITH idx AS (SELECT UNNEST(range(0, 80)) AS i)
      |SELECT doc_id,
      | CAST(4000 AS INTEGER) AS rate_hz,
      | CAST((64 + doc_id % 17 + 1) // 2 AS BIGINT) AS n_frames,
      | CAST(SUM(CASE WHEN i % 2 = 0 AND i < 64 + doc_id % 17
      |   THEN (doc_id * 31 + i * 7) % 4096 - 2048 ELSE 0 END) AS BIGINT)
      |   AS sum_samples
      |FROM documents, idx GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- m68
  /** PERCEPTUAL-HASH IMAGE NEAR-DUP — the image modality's answer to
    * d38's SimHash: dHash (difference hash) over a 9×8 grayscale
    * resample, then Hamming-band LSH candidates, never all-pairs.
    * Stages, all real codec plumbing:
    *
    *   1. encode one 16×16 PNG per document from md5-derived pixels
    *      (channel = digest bytes of `p:id:x:y` — d38's md5-nibble
    *      oracle idiom; a LINEAR closed form like m66's makes every
    *      image's gradient structure correlate and band buckets blow
    *      up ~30× — measured, not guessed), PLUS a NEAR-DUPLICATE
    *      variant for every 5th doc: identical pixels except source
    *      rows 12-15 take r+40 (mod 256 — only pixels that WRAP flip
    *      gradient bits, a genuinely small perceptual change), so after
    *      the strided resample only destination rows 6-7's bits can
    *      move (hash bits 48-63 = band 4): bands 1-3 are provably equal
    *      for every (base, variant) pair, pinning LSH recall at 100%
    *      on the engineered pairs without any tuning
    *   2. decode → 9×8 nearest-neighbor resample (m66's strided kernel
    *      at non-integer stride: src_x = x·16/9, src_y = 2y) → gray =
    *      r+g+b (integer, no division — bit-exactness for the oracle) →
    *      64-bit dHash: bit y·8+x set iff gray(x+1,y) > gray(x,y)
    *   3. bands: four 16-bit slices, exploded to (band_idx, value) keys
    *   4. candidates: band-key EQUI-join (shuffle by band key; a
    *      non-colliding image never meets another — the d37/d38 LSH
    *      contract, pinned cartesian-free by PlanShapeSpec)
    *   5. verify: Hamming distance over the native bit_count(xor),
    *      near-dup at ≤ 16 (the band-4 bound for engineered variants)
    *
    * At 100 TB: hashing is an embarrassingly parallel mapPartitions
    * (codec init per partition), the hash table is 16 bytes/image, and
    * the candidate join shuffles hash rows by band key — work scales
    * with collisions, not with pairs. The oracle recomputes the WHOLE
    * chain from the closed-form pixels (the PNG round trip is lossless,
    * the same m66 contract), so a wrong resample stride, gray formula,
    * bit order, band slice, or Hamming count all hash-mismatch. */
  private def m68(spark: SparkSession, dir: String): DataFrame = {
    bandNearDups(imageFingerprints(spark, dir), "img_a", "img_b",
      maxHamming = 16)
  }

  /** The m68 fingerprint pipeline as a reusable frame — (item_id, fp):
    * synthesize the base + every-5th-doc near-dup-variant PNGs, decode,
    * 9×8 strided-resample, dHash. Shared by m68 (one-shot near-dup
    * pairs) and m70 (incremental image dedup). */
  private[graft] def imageFingerprints(spark: SparkSession,
                                       dir: String): DataFrame = {
    import spark.implicits._
    val Src = 16
    val W = 9
    val H = 8
    val imgs: Dataset[(Long, Array[Byte])] = Tables.documents(spark, dir)
      .select($"doc_id").as[Long]
      .flatMap(id => (2 * id, id, false) ::
        (if (id % 5 == 0) List((2 * id + 1, id, true)) else Nil))
      .mapPartitions { it =>
        // digest instance per PARTITION (the codec-init discipline);
        // MessageDigest.digest() resets for the next pixel
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (imgId, id, pert) =>
          val img = new java.awt.image.BufferedImage(
            Src, Src, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < Src) {
            var x = 0
            while (x < Src) {
              val d = md.digest(
                s"p:$id:$x:$y".getBytes(java.nio.charset.StandardCharsets.UTF_8))
              val bump = if (pert && y >= 12) 40 else 0
              val r = ((d(0) & 0xff) + bump) % 256
              val g = d(1) & 0xff
              val b = d(2) & 0xff
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (imgId, bos.toByteArray)
        }
      }
    // decode → resample → dHash; localCheckpoint because the 16-byte
    // hash rows feed three consumers (band explode + both pair joins) —
    // recomputing would re-run the codec three times
    val hashes = imgs.mapPartitions { it =>
      it.map { case (imgId, bytes) =>
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val gray = Array.ofDim[Int](H, W)
        var y = 0
        while (y < H) {
          var x = 0
          while (x < W) {
            val p = src.getRGB(x * Src / W, 2 * y)
            gray(y)(x) = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 1
          }
          y += 1
        }
        var h = 0L
        y = 0
        while (y < H) {
          var x = 0
          while (x < W - 1) {
            if (gray(y)(x + 1) > gray(y)(x)) h |= 1L << (63 - (y * 8 + x))
            x += 1
          }
          y += 1
        }
        (imgId, h)
      }
    }.toDF("item_id", "fp").localCheckpoint()
    hashes
  }

  /** Shared LSH tail of the perceptual-hash near-dup family (m68
    * images, m69 audio): four 16-bit Hamming bands off a 64-bit
    * fingerprint frame (`item_id`, `fp`) → band-key EQUI-join
    * candidates (work scales with collisions, never with pairs) →
    * native bit_count(xor) verify at ≤ `maxHamming`. */
  private def bandNearDups(hashes: DataFrame, aCol: String, bCol: String,
                           maxHamming: Int): DataFrame = {
    val spark = hashes.sparkSession
    import spark.implicits._
    val bands = hashes.select($"item_id", posexplode(array(
      (0 until 4).map(i =>
        shiftright($"fp", 48 - 16 * i).bitwiseAND(lit(65535L))): _*))
      .as(Seq("bi", "bv")))
    val cands = bands.as("a")
      .join(bands.as("b"),
        $"a.bi" === $"b.bi" && $"a.bv" === $"b.bv" &&
          $"a.item_id" < $"b.item_id")
      .select($"a.item_id".as(aCol), $"b.item_id".as(bCol))
      .distinct()
    cands
      .join(hashes.select($"item_id".as(aCol), $"fp".as("ha")), aCol)
      .join(hashes.select($"item_id".as(bCol), $"fp".as("hb")), bCol)
      .select(col(aCol), col(bCol),
        expr("bit_count(ha ^ hb)").cast("bigint").as("hamming"))
      .filter($"hamming" <= maxHamming)
      .orderBy(col(aCol), col(bCol))
  }
  private val m68Sql = {
    // hex-nibble value of digest char i (1-based) — d38's idiom
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    s"""WITH imgs AS (
      |  SELECT doc_id * 2 AS img_id, doc_id AS id, 0 AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id * 2 + 1, doc_id, 1 FROM documents WHERE doc_id % 5 = 0),
      |grid AS (
      |  SELECT x.g AS x, y.g AS y
      |  FROM generate_series(0, 8) x(g), generate_series(0, 7) y(g)),
      |px AS (
      |  SELECT img_id, x, y, pert,
      |    md5('p:' || id || ':' || (x*16//9) || ':' || (2*y)) AS m
      |  FROM imgs, grid),
      |gray AS (
      |  SELECT img_id, x, y,
      |    ((${nib(1)}*16 + ${nib(2)}
      |        + CASE WHEN pert = 1 AND 2*y >= 12 THEN 40 ELSE 0 END) % 256
      |     + ${nib(3)}*16 + ${nib(4)}
      |     + ${nib(5)}*16 + ${nib(6)}) AS g
      |  FROM px),
      |bits AS (
      |  SELECT a.img_id, a.y * 8 + a.x AS b,
      |    CASE WHEN n.g > a.g THEN 1 ELSE 0 END AS bit
      |  FROM gray a JOIN gray n
      |    ON n.img_id = a.img_id AND n.y = a.y AND n.x = a.x + 1
      |  WHERE a.x < 8),
      |hashes AS (
      |  SELECT img_id, CAST(SUM(CASE WHEN bit = 1 THEN
      |      CASE WHEN b = 0 THEN (-9223372036854775808)::HUGEINT
      |           ELSE 1::HUGEINT << CAST(63 - b AS INT) END
      |    ELSE 0::HUGEINT END) AS BIGINT) AS h
      |  FROM bits GROUP BY img_id),
      |bands AS (
      |  SELECT img_id, r.range AS bi,
      |    (h >> CAST(48 - 16 * r.range AS INT)) & 65535 AS bv
      |  FROM hashes, range(4) r),
      |cands AS (
      |  SELECT DISTINCT a.img_id AS img_a, b.img_id AS img_b
      |  FROM bands a JOIN bands b
      |    ON a.bi = b.bi AND a.bv = b.bv AND a.img_id < b.img_id)
      |SELECT c.img_a, c.img_b,
      |  CAST(bit_count(xor(ha.h, hb.h)) AS BIGINT) AS hamming
      |FROM cands c
      |JOIN hashes ha ON ha.img_id = c.img_a
      |JOIN hashes hb ON hb.img_id = c.img_b
      |WHERE bit_count(xor(ha.h, hb.h)) <= 16
      |ORDER BY img_a, img_b""".stripMargin
  }

  // ---------------------------------------------------------------- m69
  /** AUDIO-FINGERPRINT NEAR-DUP — m68's twin for the audio modality
    * (the chromaprint shape, reduced to an oracle-checkable kernel):
    *
    *   1. encode one 130-sample PCM16 WAV per document from
    *      md5-derived samples, PLUS a near-duplicate variant for every
    *      5th doc — identical except samples ≥ 98 take +512 (mod 2¹⁶),
    *      so only frame energies 49-64 move and every flipped
    *      fingerprint bit lands in band 4 (bits 48-63): bands 1-3 are
    *      provably equal per (base, variant) pair, LSH recall 100% by
    *      construction
    *   2. decode → 65 frame energies (|s₂f| + |s₂f₊₁| — integer-exact
    *      for the oracle; a production pipeline swaps in FFT band
    *      energies, the plumbing is identical) → 64-bit gradient
    *      fingerprint: bit b set iff E(b+1) > E(b)
    *   3. the m68 band tail: 16-bit Hamming bands → band-key equi-join
    *      candidates → bit_count(xor) verify at ≤ 16
    *
    * The oracle recomputes samples, energies, bits, bands, and Hamming
    * from the md5 closed form (the WAV round trip is lossless — the
    * m64/m67 contract), so with m68 every multimodal near-dup kernel
    * is hash-gated end to end. */
  private def m69(spark: SparkSession, dir: String): DataFrame =
    bandNearDups(audioFingerprints(spark, dir), "clip_a", "clip_b",
      maxHamming = 16)

  /** m69's chromaprint-shape 64-bit audio fingerprints (item_id, fp) —
    * the WAV encode → decode → frame-energy → gradient-bit chain,
    * shared by m69 (one-shot near-dup) and m74 (maintained index). */
  private[graft] def audioFingerprints(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val N = 130
    val clips: Dataset[(Long, Array[Byte])] = Tables.documents(spark, dir)
      .select($"doc_id").as[Long]
      .flatMap(id => (2 * id, id, false) ::
        (if (id % 5 == 0) List((2 * id + 1, id, true)) else Nil))
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (clipId, id, pert) =>
          val raw = new Array[Byte](N * 2)
          var i = 0
          while (i < N) {
            val d = md.digest(
              s"a:$id:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
            var v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
            if (pert && i >= 98) v = (v + 512) & 0xffff
            val s = v.toShort // signed 16-bit wrap, same in the oracle
            raw(2 * i) = (s & 0xff).toByte
            raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt =
            new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(raw), fmt, N.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (clipId, bos.toByteArray)
        }
      }
    val hashes = clips.mapPartitions { it =>
      it.map { case (clipId, bytes) =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val raw = ais.readAllBytes()
        val frames = raw.length / 4 // two 16-bit samples per frame
        def s(i: Int): Int =
          ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
        val e = new Array[Long](frames)
        var f = 0
        while (f < frames) {
          e(f) = math.abs(s(2 * f)).toLong + math.abs(s(2 * f + 1)).toLong
          f += 1
        }
        var h = 0L
        var b = 0
        while (b < 64) {
          if (e(b + 1) > e(b)) h |= 1L << (63 - b)
          b += 1
        }
        (clipId, h)
      }
    }.toDF("item_id", "fp").localCheckpoint()
    hashes
  }
  private val m69Sql = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    s"""WITH clips AS (
      |  SELECT doc_id * 2 AS item_id, doc_id AS id, 0 AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id * 2 + 1, doc_id, 1 FROM documents WHERE doc_id % 5 = 0),
      |idx AS (SELECT UNNEST(range(0, 130)) AS i),
      |smp AS (
      |  SELECT item_id, i,
      |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
      |  FROM (
      |    SELECT item_id, i,
      |      ((${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)})
      |        + CASE WHEN pert = 1 AND i >= 98 THEN 512 ELSE 0 END) % 65536 AS u
      |    FROM (SELECT item_id, pert, i, md5('a:' || id || ':' || i) AS m
      |          FROM clips, idx) t) u2),
      |eng AS (
      |  SELECT item_id, i // 2 AS f, SUM(ABS(s)) AS e
      |  FROM smp GROUP BY item_id, i // 2),
      |bits AS (
      |  SELECT a.item_id, a.f AS b,
      |    CASE WHEN n.e > a.e THEN 1 ELSE 0 END AS bit
      |  FROM eng a JOIN eng n
      |    ON n.item_id = a.item_id AND n.f = a.f + 1
      |  WHERE a.f < 64),
      |hashes AS (
      |  SELECT item_id, CAST(SUM(CASE WHEN bit = 1 THEN
      |      CASE WHEN b = 0 THEN (-9223372036854775808)::HUGEINT
      |           ELSE 1::HUGEINT << CAST(63 - b AS INT) END
      |    ELSE 0::HUGEINT END) AS BIGINT) AS h
      |  FROM bits GROUP BY item_id),
      |bands AS (
      |  SELECT item_id, r.range AS bi,
      |    (h >> CAST(48 - 16 * r.range AS INT)) & 65535 AS bv
      |  FROM hashes, range(4) r),
      |cands AS (
      |  SELECT DISTINCT a.item_id AS clip_a, b.item_id AS clip_b
      |  FROM bands a JOIN bands b
      |    ON a.bi = b.bi AND a.bv = b.bv AND a.item_id < b.item_id)
      |SELECT c.clip_a, c.clip_b,
      |  CAST(bit_count(xor(ha.h, hb.h)) AS BIGINT) AS hamming
      |FROM cands c
      |JOIN hashes ha ON ha.item_id = c.clip_a
      |JOIN hashes hb ON hb.item_id = c.clip_b
      |WHERE bit_count(xor(ha.h, hb.h)) <= 16
      |ORDER BY clip_a, clip_b""".stripMargin
  }

  // ---------------------------------------------------------------- m70
  /** INCREMENTAL IMAGE DEDUP — m68's perceptual near-dup as a
    * MAINTAINED corpus, the multimodal member of the incremental
    * family (d47 keep-first / d49 spans / d51 keep-best / d52
    * clusters): the admitted-image table and its band-key fingerprint
    * index PERSIST as graft tables, and each arriving image batch
    *
    *   1. appends, then probes the persisted `<band>:<slice>` keys
    *      ([[graft.dedup.DedupOps.probePersisted]] — broadcast or
    *      storage-co-partitioned, literal-key file pruning REQUIREd on
    *      the tiny third ingest) carrying the matched images'
    *      fingerprints back as payload
    *   2. VERIFIES candidates with the native bit_count(xor) ≤ 16 —
    *      band collision alone is a candidate, never a verdict (the
    *      m68 LSH contract, kept under incrementality)
    *   3. positionally deletes the losers (earlier-id pairwise rule,
    *      batch-bounded coordinate lookup, zero rewrites REQUIREd) and
    *      appends ALL batch fingerprints (the rule judges against
    *      every prior image, deleted or not — d47's invariant)
    *
    * Batches arrive in img_id order, so incremental keep-first equals
    * the GLOBAL pairwise rule: one DuckDB query over the whole derived
    * image set (m68's closed-form hash chain + the earlier-id rule)
    * oracle-checks the entire multi-ingest pipeline. Every engineered
    * variant trails its base, so the survivor set must hold no variant
    * ids at all (REQUIREd). */
  private def m70(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    val zone = java.nio.file.Files
      .createTempDirectory("graft_m70_inc").toFile.getAbsolutePath
    try {
      val corpus = s"$zone/imgs_txn"
      val sigsT = s"$zone/isigs_txn"
      val fps = imageFingerprints(spark, dir)
        .select($"item_id".as("img_id"), $"fp")
      val maxId = fps.agg(max($"img_id")).head().getLong(0)
      val cut = maxId / 2L
      // a TINY third increment — the daily shape (d47's clamp)
      val cut2 = math.max(cut + 1L, maxId - 5L)
      m70Ingest(spark, corpus, sigsT, fps.filter($"img_id" <= cut),
        first = true, col("img_id") <= cut)
      val before = TxnTable.morState(spark, corpus,
        TxnTable.latestVersion(spark, corpus).get).files.toSet
      m70Ingest(spark, corpus, sigsT,
        fps.filter($"img_id" > cut && $"img_id" <= cut2), first = false,
        col("img_id") > cut && col("img_id") <= cut2)
      val (scanned, total) = m70Ingest(spark, corpus, sigsT,
        fps.filter($"img_id" > cut2), first = false, col("img_id") > cut2)
      require(scanned < total,
        s"small-increment fingerprint probe must prune index files: " +
          s"read $scanned of $total")
      val after = TxnTable.morState(spark, corpus,
        TxnTable.latestVersion(spark, corpus).get)
      require(before.subsetOf(after.files.toSet),
        "incremental image dedup must never rewrite an admitted file")
      require(after.dels.exists(_.keyCols == TxnTable.PosDelKeyCols),
        "the near-dup losers must go by positional vectors — none landed")
      val result = spark.read.format("graft").load(corpus)
        .select($"img_id", $"fp").orderBy($"img_id")
      val rows = result.collect()
      require(!rows.exists(_.getLong(0) % 2L == 1L),
        "every engineered variant trails its base and must be deduped")
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), result.schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }

  /** The 16-bit Hamming band keys of 64-bit fingerprints as string
    * `<band>:<slice>` rows (img_id, fp, bk) — one join column the
    * bucketed layout, stats, and blooms all work on (the d52
    * spelling). Shared by the ingest and by m76's subscription-
    * equality oracle-side recomputation. */
  private[graft] def bandKeys(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select($"img_id", $"fp",
        posexplode(array((0 until 4).map(i =>
          shiftright($"fp", 48 - 16 * i).bitwiseAND(lit(65535L))): _*))
          .as(Seq("b", "v")))
      .select($"img_id", $"fp",
        concat(($"b" + 1).cast("string"), lit(":"), $"v").as("bk"))
  }

  /** One m70 ingest (reusable by specs): admit `batch` (img_id, fp),
    * verify-and-delete its near-dup losers against everything earlier,
    * persist its fingerprint band keys (d47's judge-against-everything
    * invariant). `cdfFirst` turns the corpus change feed on at create
    * time (m76's subscription source). Returns the probe's (scanned,
    * total) index file counts. */
  private[graft] def m70Ingest(spark: SparkSession, corpus: String,
      sigsT: String, batch: DataFrame, first: Boolean,
      inBatchPred: org.apache.spark.sql.Column,
      cdfFirst: Boolean = false): (Int, Int) = {
    import spark.implicits._
    import graft.io.TxnTable
    val cw = batch.write.format("graft").option("mergeOnRead", "true")
      .option("statsCols", "img_id")
    (if (first && cdfFirst) cw.option("enableChangeFeed", "true") else cw)
      .mode(if (first) "overwrite" else "append").save(corpus)
    val sig = bandKeys(batch).localCheckpoint()
    // concurrent-ingest re-probe, part 1 (the d47 move; see
    // probePersisted's concurrency contract): pin the probed version.
    // NOTE the window assumes concurrent INGESTS (pure sig appends);
    // a takedown racing an ingest is a different hazard and keeps the
    // single-writer requirement.
    val vProbe: Long =
      if (first) -1L else TxnTable.latestVersion(spark, sigsT).get
    val (cross, pruneCounts) =
      if (first) (spark.emptyDataset[Long].toDF("img_id"), (0, 0))
      else {
        val (cand, pc) = graft.dedup.DedupOps.probePersisted(spark, sigsT,
          sig, joinCols = Seq("bk"), out = Seq("img_id", "fp", "pid", "pfp"),
          keyCol = "bk", cat = "gm70spj", scanPayload = Seq("pid", "pfp"))
        // band collision is a CANDIDATE; the verdict is the Hamming
        // verify over exactly the candidate rows
        (cand.filter($"pid" < $"img_id" &&
            expr("bit_count(fp ^ pfp)") <= 16)
          .select($"img_id"), pc)
      }
    val dupKeys = sig.groupBy($"bk").agg(count(lit(1)).as("_n"))
      .filter($"_n" > 1).select($"bk")
    val sigd = sig.join(dupKeys, Seq("bk"))
    val inBatch = sigd.select($"bk", $"img_id".as("ia"), $"fp".as("fa"))
      .join(sigd.select($"bk", $"img_id".as("ib"), $"fp".as("fb")),
        Seq("bk"))
      .filter($"ia" < $"ib" && expr("bit_count(fa ^ fb)") <= 16)
      .select($"ib".as("img_id"))
    val losers = cross.union(inBatch).distinct()
    if (losers.limit(1).count() > 0L) {
      val rows = TxnTable.readWithRowIdentity(spark, corpus)
        .filter(inBatchPred)
      TxnTable.deletePositions(spark, corpus,
        rows.join(broadcast(losers), Seq("img_id"), "left_semi"))
      ()
    }
    // ALL fingerprints persist — the pairwise rule judges against every
    // prior image, deleted or not (d47's invariant)
    val psig = sig.select($"bk", $"img_id".as("pid"), $"fp".as("pfp"))
    if (first)
      psig.write.format("graft")
        .option("statsCols", "bk,pid").option("bloomCols", "bk")
        .option("optimizedWrite", "true")
        .option("partitionBy", "bucket(16, bk)").mode("overwrite")
        .save(sigsT)
    else {
      val vLanded = TxnTable.commitAppend(psig, sigsT,
        statsCols = Seq("bk", "pid"), bloomCols = Seq("bk"),
        optimizedWrite = true)
      // re-probe, part 2: re-judge the batch against exactly the
      // foreign appends in (probed, landed). m70's keep rule is
      // EARLIER-ID (not earlier-arrival), so the recovery applies the
      // same pid < img_id + Hamming verify as the main cross leg —
      // which also makes it symmetric with the serial replay: a
      // foreign higher-id near-dup that landed first legitimately
      // survives, exactly as it would have arriving first serially.
      graft.dedup.DedupOps.reprobeWindow(spark, sigsT, vProbe,
        vLanded) { foreign =>
        sig.join(broadcast(foreign.select($"bk", $"pid", $"pfp")),
            Seq("bk"))
          .filter($"pid" < $"img_id" && expr("bit_count(fp ^ pfp)") <= 16)
          .select($"img_id").distinct()
      } { late =>
        val rows = TxnTable.readWithRowIdentity(spark, corpus)
          .filter(inBatchPred)
        TxnTable.deletePositions(spark, corpus,
          rows.join(broadcast(late), Seq("img_id"), "left_semi"))
        ()
      }
    }
    pruneCounts
  }

  private val m70Sql = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    s"""WITH imgs AS (
      |  SELECT doc_id * 2 AS img_id, doc_id AS id, 0 AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id * 2 + 1, doc_id, 1 FROM documents WHERE doc_id % 5 = 0),
      |grid AS (
      |  SELECT x.g AS x, y.g AS y
      |  FROM generate_series(0, 8) x(g), generate_series(0, 7) y(g)),
      |px AS (
      |  SELECT img_id, x, y, pert,
      |    md5('p:' || id || ':' || (x*16//9) || ':' || (2*y)) AS m
      |  FROM imgs, grid),
      |gray AS (
      |  SELECT img_id, x, y,
      |    ((${nib(1)}*16 + ${nib(2)}
      |        + CASE WHEN pert = 1 AND 2*y >= 12 THEN 40 ELSE 0 END) % 256
      |     + ${nib(3)}*16 + ${nib(4)}
      |     + ${nib(5)}*16 + ${nib(6)}) AS g
      |  FROM px),
      |bits AS (
      |  SELECT a.img_id, a.y * 8 + a.x AS b,
      |    CASE WHEN n.g > a.g THEN 1 ELSE 0 END AS bit
      |  FROM gray a JOIN gray n
      |    ON n.img_id = a.img_id AND n.y = a.y AND n.x = a.x + 1
      |  WHERE a.x < 8),
      |hashes AS (
      |  SELECT img_id, CAST(SUM(CASE WHEN bit = 1 THEN
      |      CASE WHEN b = 0 THEN (-9223372036854775808)::HUGEINT
      |           ELSE 1::HUGEINT << CAST(63 - b AS INT) END
      |    ELSE 0::HUGEINT END) AS BIGINT) AS h
      |  FROM bits GROUP BY img_id),
      |bands AS (
      |  SELECT img_id, r.range AS bi,
      |    (h >> CAST(48 - 16 * r.range AS INT)) & 65535 AS bv
      |  FROM hashes, range(4) r),
      |dups AS (
      |  SELECT DISTINCT b.img_id
      |  FROM bands a JOIN bands b
      |    ON a.bi = b.bi AND a.bv = b.bv AND a.img_id < b.img_id
      |  JOIN hashes ha ON ha.img_id = a.img_id
      |  JOIN hashes hb ON hb.img_id = b.img_id
      |  WHERE bit_count(xor(ha.h, hb.h)) <= 16)
      |SELECT img_id, h AS fp FROM hashes
      |WHERE img_id NOT IN (SELECT img_id FROM dups)
      |ORDER BY img_id""".stripMargin
  }

  // ---------------------------------------------------------------- m73
  /** IMAGE TAKEDOWN — the multimodal right-to-be-forgotten leg (the
    * t57/e63 move applied to m70's image-dedup index), with the twist
    * the text/vector legs don't have: RE-ADMISSION. A takedown erases
    * an admitted image AND its fingerprint band keys (both positional
    * — zero rewrites REQUIREd), so the dedup index forgets the image
    * ever existed; a LATER near-duplicate of the taken-down image is
    * then legitimately ADMITTED (nothing in the index witnesses
    * against it — the DMCA/consent-revocation semantics: removal must
    * not keep suppressing lawful copies). Workload: the bases ingest
    * (batch 1, keep-first), admitted bases with img_id % 14 = 0 are
    * taken down, then the engineered variants ingest (batch 2): a
    * variant whose base was taken down re-admits (REQUIREd), every
    * other variant still dies to its surviving base. The oracle
    * replays the whole thing closed-form: the m68 fingerprint chain,
    * batch-1 pairwise keep-first, the takedown set, then batch-2
    * admission judged against batch-2 peers plus the SURVIVING
    * batch-1 signatures only. */
  private def m73(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    val zone = java.nio.file.Files
      .createTempDirectory("graft_m73_take").toFile.getAbsolutePath
    try {
      val corpus = s"$zone/imgs_txn"
      val sigsT = s"$zone/isigs_txn"
      val fps = imageFingerprints(spark, dir)
        .select($"item_id".as("img_id"), $"fp")
      // batch 1 = the bases (even ids), batch 2 = the variants (odd)
      m70Ingest(spark, corpus, sigsT, fps.filter($"img_id" % 2 === 0),
        first = true, col("img_id") % 2 === 0)
      // the takedown batch stays a FRAME end-to-end (the d50 rule) —
      // each leg is a semi-join → positional delete, never a
      // driver-collected isin literal list
      val takedownDf = spark.read.format("graft").load(corpus)
        .filter($"img_id" % 14 === 0)
        .select($"img_id").localCheckpoint()
      val takedown = takedownDf.as[Long].collect().toSeq
      require(takedown.nonEmpty, "the takedown batch must be non-empty")
      val beforeC = TxnTable.snapshotFiles(spark, corpus,
        TxnTable.latestVersion(spark, corpus).get).toSet
      val beforeS = TxnTable.snapshotFiles(spark, sigsT,
        TxnTable.latestVersion(spark, sigsT).get).toSet
      TxnTable.deleteFromPos(spark, corpus, takedownDf, Seq("img_id"))
      TxnTable.deleteFromPos(spark, sigsT,
        takedownDf.select($"img_id".as("pid")), Seq("pid"))
      require(beforeC.subsetOf(TxnTable.morState(spark, corpus,
          TxnTable.latestVersion(spark, corpus).get).files.toSet) &&
        beforeS.subsetOf(TxnTable.morState(spark, sigsT,
          TxnTable.latestVersion(spark, sigsT).get).files.toSet),
        "a takedown must be deletion vectors on both tables, not rewrites")
      m70Ingest(spark, corpus, sigsT, fps.filter($"img_id" % 2 === 1),
        first = false, col("img_id") % 2 === 1)
      val result = spark.read.format("graft").load(corpus)
        .select($"img_id", $"fp").orderBy($"img_id")
      val rows = result.collect()
      val downSet = takedown.toSet
      require(rows.forall(r => !downSet.contains(r.getLong(0))),
        "a taken-down image surfaced in the corpus")
      require(rows.exists(_.getLong(0) % 2L == 1L),
        "an orphaned variant (base taken down) must be RE-ADMITTED — " +
          "the index must not keep suppressing lawful copies")
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), result.schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  private val m73Sql = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    s"""WITH imgs AS (
      |  SELECT doc_id * 2 AS img_id, doc_id AS id, 0 AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id * 2 + 1, doc_id, 1 FROM documents WHERE doc_id % 5 = 0),
      |grid AS (
      |  SELECT x.g AS x, y.g AS y
      |  FROM generate_series(0, 8) x(g), generate_series(0, 7) y(g)),
      |px AS (
      |  SELECT img_id, x, y, pert,
      |    md5('p:' || id || ':' || (x*16//9) || ':' || (2*y)) AS m
      |  FROM imgs, grid),
      |gray AS (
      |  SELECT img_id, x, y,
      |    ((${nib(1)}*16 + ${nib(2)}
      |        + CASE WHEN pert = 1 AND 2*y >= 12 THEN 40 ELSE 0 END) % 256
      |     + ${nib(3)}*16 + ${nib(4)}
      |     + ${nib(5)}*16 + ${nib(6)}) AS g
      |  FROM px),
      |bits AS (
      |  SELECT a.img_id, a.y * 8 + a.x AS b,
      |    CASE WHEN n.g > a.g THEN 1 ELSE 0 END AS bit
      |  FROM gray a JOIN gray n
      |    ON n.img_id = a.img_id AND n.y = a.y AND n.x = a.x + 1
      |  WHERE a.x < 8),
      |hashes AS (
      |  SELECT img_id, CAST(SUM(CASE WHEN bit = 1 THEN
      |      CASE WHEN b = 0 THEN (-9223372036854775808)::HUGEINT
      |           ELSE 1::HUGEINT << CAST(63 - b AS INT) END
      |    ELSE 0::HUGEINT END) AS BIGINT) AS h
      |  FROM bits GROUP BY img_id),
      |bands AS (
      |  SELECT img_id, r.range AS bi,
      |    (h >> CAST(48 - 16 * r.range AS INT)) & 65535 AS bv
      |  FROM hashes, range(4) r),
      |pairs AS (
      |  SELECT DISTINCT a.img_id AS i, b.img_id AS j
      |  FROM bands a JOIN bands b
      |    ON a.bi = b.bi AND a.bv = b.bv AND a.img_id > b.img_id
      |  JOIN hashes ha ON ha.img_id = a.img_id
      |  JOIN hashes hb ON hb.img_id = b.img_id
      |  WHERE bit_count(xor(ha.h, hb.h)) <= 16),
      |dups1 AS (
      |  SELECT DISTINCT i FROM pairs WHERE i % 2 = 0 AND j % 2 = 0),
      |adm1 AS (
      |  SELECT img_id FROM hashes WHERE img_id % 2 = 0
      |    AND img_id NOT IN (SELECT i FROM dups1)),
      |takedown AS (SELECT img_id FROM adm1 WHERE img_id % 14 = 0),
      |dups2 AS (
      |  SELECT DISTINCT i FROM pairs
      |  WHERE i % 2 = 1 AND (j % 2 = 1 OR
      |    j NOT IN (SELECT img_id FROM takedown))),
      |fin AS (
      |  SELECT img_id FROM adm1
      |  WHERE img_id NOT IN (SELECT img_id FROM takedown)
      |  UNION ALL
      |  SELECT img_id FROM hashes WHERE img_id % 2 = 1
      |    AND img_id NOT IN (SELECT i FROM dups2))
      |SELECT f.img_id, h.h AS fp FROM fin f
      |JOIN hashes h ON h.img_id = f.img_id
      |ORDER BY f.img_id""".stripMargin
  }

  // ---------------------------------------------------------------- m74
  /** MAINTAINED AUDIO-FINGERPRINT INDEX — the audio column of the
    * lifecycle matrix, completing what text (t56-t58/s74), vectors
    * (e59/e63/e65/s75), and images (m70/m73) already have: m69's
    * chromaprint-shape fingerprints in the m70 ingest shape (persisted
    * band-key index, probePersisted with literal-key file pruning
    * REQUIREd on the tiny second ingest, positional loser deletes,
    * zero admitted-file rewrites) PLUS the m73 takedown/re-admission
    * leg. The ingest machinery is MODALITY-AGNOSTIC by design — the
    * fingerprints are 64-bit hashes judged by 16-bit Hamming bands
    * whatever produced them, so m70Ingest runs unchanged over audio
    * clips. Workload: base clips (even ids) in two ordered batches
    * (the second tiny — the daily shape), takedown of admitted clips
    * with id % 14 = 0 (frame-driven positional erasure of clip AND
    * band keys — the d50 rule), then every engineered variant (odd
    * ids): a variant whose base was taken down RE-ADMITS (REQUIREd —
    * nothing in the index witnesses against it), every other variant
    * dies to its surviving base. The oracle replays samples →
    * energies → bits → bands → pairwise keep-first → takedown →
    * batch-2 admission entirely from the md5 closed form. */
  private def m74(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    val zone = java.nio.file.Files
      .createTempDirectory("graft_m74_aud").toFile.getAbsolutePath
    try {
      val corpus = s"$zone/clips_txn"
      val sigsT = s"$zone/asigs_txn"
      val fps = audioFingerprints(spark, dir)
        .select($"item_id".as("img_id"), $"fp")
      val maxId = fps.agg(max($"img_id")).head().getLong(0)
      // a TINY second base batch — the daily shape (m70's clamp), and
      // few enough band keys that the bucketed probe provably prunes
      val cut = maxId - 5L
      val evens = fps.filter($"img_id" % 2 === 0)
      m70Ingest(spark, corpus, sigsT, evens.filter($"img_id" <= cut),
        first = true, col("img_id") % 2 === 0 && col("img_id") <= cut)
      val (s2, t2) = m70Ingest(spark, corpus, sigsT,
        evens.filter($"img_id" > cut), first = false,
        col("img_id") % 2 === 0 && col("img_id") > cut)
      require(s2 < t2,
        s"the tiny-increment fingerprint probe must prune index " +
          s"files: read $s2 of $t2")
      // takedown of admitted clips, frame-driven on BOTH tables
      val takedownDf = spark.read.format("graft").load(corpus)
        .filter($"img_id" % 14 === 0)
        .select($"img_id").localCheckpoint()
      val takedown = takedownDf.as[Long].collect().toSet
      require(takedown.nonEmpty, "the takedown batch must be non-empty")
      val beforeC = TxnTable.snapshotFiles(spark, corpus,
        TxnTable.latestVersion(spark, corpus).get).toSet
      val beforeS = TxnTable.snapshotFiles(spark, sigsT,
        TxnTable.latestVersion(spark, sigsT).get).toSet
      TxnTable.deleteFromPos(spark, corpus, takedownDf, Seq("img_id"))
      TxnTable.deleteFromPos(spark, sigsT,
        takedownDf.select($"img_id".as("pid")), Seq("pid"))
      require(beforeC.subsetOf(TxnTable.morState(spark, corpus,
          TxnTable.latestVersion(spark, corpus).get).files.toSet) &&
        beforeS.subsetOf(TxnTable.morState(spark, sigsT,
          TxnTable.latestVersion(spark, sigsT).get).files.toSet),
        "a takedown must be deletion vectors on both tables, not rewrites")
      // the engineered variants — orphaned ones must RE-ADMIT
      m70Ingest(spark, corpus, sigsT, fps.filter($"img_id" % 2 === 1),
        first = false, col("img_id") % 2 === 1)
      val result = spark.read.format("graft").load(corpus)
        .select($"img_id".as("clip_id"), $"fp").orderBy($"clip_id")
      // membership REQUIREs as DISTRIBUTED semi-join counts, before
      // the collect — the collect below only materializes the small
      // returned frame (it must outlive the deleted temp zone)
      val tdK = takedownDf.select($"img_id".as("clip_id"))
      require(result.join(tdK, Seq("clip_id"), "left_semi").count() == 0,
        "a taken-down clip surfaced in the corpus")
      require(result.filter($"clip_id" % 2 === 1)
          .join(tdK.select(($"clip_id" + 1).as("clip_id")),
            Seq("clip_id"), "left_semi").count() > 0,
        "an orphaned variant (base taken down) must be RE-ADMITTED — " +
          "the index must not keep suppressing lawful copies")
      val rows = result.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), result.schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }
  private val m74Sql = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    s"""WITH clips AS (
      |  SELECT doc_id * 2 AS item_id, doc_id AS id, 0 AS pert FROM documents
      |  UNION ALL
      |  SELECT doc_id * 2 + 1, doc_id, 1 FROM documents WHERE doc_id % 5 = 0),
      |idx AS (SELECT UNNEST(range(0, 130)) AS i),
      |smp AS (
      |  SELECT item_id, i,
      |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
      |  FROM (
      |    SELECT item_id, i,
      |      ((${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)})
      |        + CASE WHEN pert = 1 AND i >= 98 THEN 512 ELSE 0 END) % 65536 AS u
      |    FROM (SELECT item_id, pert, i, md5('a:' || id || ':' || i) AS m
      |          FROM clips, idx) t) u2),
      |eng AS (
      |  SELECT item_id, i // 2 AS f, SUM(ABS(s)) AS e
      |  FROM smp GROUP BY item_id, i // 2),
      |bits AS (
      |  SELECT a.item_id, a.f AS b,
      |    CASE WHEN n.e > a.e THEN 1 ELSE 0 END AS bit
      |  FROM eng a JOIN eng n
      |    ON n.item_id = a.item_id AND n.f = a.f + 1
      |  WHERE a.f < 64),
      |hashes AS (
      |  SELECT item_id, CAST(SUM(CASE WHEN bit = 1 THEN
      |      CASE WHEN b = 0 THEN (-9223372036854775808)::HUGEINT
      |           ELSE 1::HUGEINT << CAST(63 - b AS INT) END
      |    ELSE 0::HUGEINT END) AS BIGINT) AS h
      |  FROM bits GROUP BY item_id),
      |bands AS (
      |  SELECT item_id, r.range AS bi,
      |    (h >> CAST(48 - 16 * r.range AS INT)) & 65535 AS bv
      |  FROM hashes, range(4) r),
      |pairs AS (
      |  SELECT DISTINCT a.item_id AS i, b.item_id AS j
      |  FROM bands a JOIN bands b
      |    ON a.bi = b.bi AND a.bv = b.bv AND a.item_id > b.item_id
      |  JOIN hashes ha ON ha.item_id = a.item_id
      |  JOIN hashes hb ON hb.item_id = b.item_id
      |  WHERE bit_count(xor(ha.h, hb.h)) <= 16),
      |dups1 AS (
      |  SELECT DISTINCT i FROM pairs WHERE i % 2 = 0 AND j % 2 = 0),
      |adm1 AS (
      |  SELECT item_id FROM hashes WHERE item_id % 2 = 0
      |    AND item_id NOT IN (SELECT i FROM dups1)),
      |takedown AS (SELECT item_id FROM adm1 WHERE item_id % 14 = 0),
      |dups2 AS (
      |  SELECT DISTINCT i FROM pairs
      |  WHERE i % 2 = 1 AND (j % 2 = 1 OR
      |    j NOT IN (SELECT item_id FROM takedown))),
      |fin AS (
      |  SELECT item_id FROM adm1
      |  WHERE item_id NOT IN (SELECT item_id FROM takedown)
      |  UNION ALL
      |  SELECT item_id FROM hashes WHERE item_id % 2 = 1
      |    AND item_id NOT IN (SELECT i FROM dups2))
      |SELECT f.item_id AS clip_id, h.h AS fp FROM fin f
      |JOIN hashes h ON h.item_id = f.item_id
      |ORDER BY clip_id""".stripMargin
  }

  // ---------------------------------------------------------------- m75
  /** MAINTAINED VIDEO-FINGERPRINT INDEX — the video column of the
    * lifecycle matrix, closing the grid (text/vectors/images/audio
    * all have maintained legs; m72's keyframe near-dup was the last
    * one-shot). The admitted-clip table (clip_id, n) and the keyframe
    * fingerprint index (fp, pid, pn) persist as graft tables; each
    * arriving clip batch
    *
    *   1. appends its clips, then probes the persisted fp keys
    *      (probePersisted — literal-key file pruning REQUIREd on the
    *      tiny second base batch: ≤ a dozen md5 keys cannot touch all
    *      16 buckets of a full index)
    *   2. judges candidates by m72's rule — ≥ 2 shared keyframes AND
    *      Jaccard ≥ 1/2 over the fingerprint SETS, compared in exact
    *      integer arithmetic (2·shared ≥ na+pn−shared), with the
    *      persisted per-clip set size riding each index row so no
    *      second table is consulted
    *   3. positionally deletes the losers (earlier-id keep-first,
    *      zero rewrites REQUIREd) and persists ALL batch fingerprints
    *      (d47's judge-against-everything invariant)
    *
    * plus the m73 takedown/re-admission leg: admitted clips with
    * id % 14 = 0 erase positionally from BOTH tables (frame-driven —
    * the d50 rule), and a later trim-re-encode variant of a
    * taken-down clip RE-ADMITS (REQUIREd: clip 1's only possible
    * witness is clip 0, whose signatures the takedown erased). The
    * oracle replays scene keys → fingerprint sets → pairwise
    * keep-first → takedown → variant admission entirely closed-form —
    * no decoding, because distinct scene keys give distinct frame
    * hashes (the m72 contract). */
  private def m75(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    val zone = java.nio.file.Files
      .createTempDirectory("graft_m75_vid").toFile.getAbsolutePath
    try {
      val corpus = s"$zone/vclips_txn"
      val sigsT = s"$zone/vsigs_txn"
      val fps = videoFingerprints(spark, dir)
      val maxId = fps.agg(max($"clip_id")).head().getLong(0)
      val cut = maxId - 5L
      val evens = fps.filter($"clip_id" % 2 === 0)
      m75Ingest(spark, corpus, sigsT, evens.filter($"clip_id" <= cut),
        first = true, col("clip_id") % 2 === 0 && col("clip_id") <= cut)
      val (s2, t2) = m75Ingest(spark, corpus, sigsT,
        evens.filter($"clip_id" > cut), first = false,
        col("clip_id") % 2 === 0 && col("clip_id") > cut)
      require(s2 < t2,
        s"the tiny-increment keyframe probe must prune index files: " +
          s"read $s2 of $t2")
      val takedownDf = spark.read.format("graft").load(corpus)
        .filter($"clip_id" % 14 === 0)
        .select($"clip_id").localCheckpoint()
      val takedown = takedownDf.as[Long].collect().toSet
      require(takedown.nonEmpty, "the takedown batch must be non-empty")
      val beforeC = TxnTable.snapshotFiles(spark, corpus,
        TxnTable.latestVersion(spark, corpus).get).toSet
      val beforeS = TxnTable.snapshotFiles(spark, sigsT,
        TxnTable.latestVersion(spark, sigsT).get).toSet
      TxnTable.deleteFromPos(spark, corpus, takedownDf, Seq("clip_id"))
      TxnTable.deleteFromPos(spark, sigsT,
        takedownDf.select($"clip_id".as("pid")), Seq("pid"))
      require(beforeC.subsetOf(TxnTable.morState(spark, corpus,
          TxnTable.latestVersion(spark, corpus).get).files.toSet) &&
        beforeS.subsetOf(TxnTable.morState(spark, sigsT,
          TxnTable.latestVersion(spark, sigsT).get).files.toSet),
        "a takedown must be deletion vectors on both tables, not rewrites")
      m75Ingest(spark, corpus, sigsT, fps.filter($"clip_id" % 2 === 1),
        first = false, col("clip_id") % 2 === 1)
      val result = spark.read.format("graft").load(corpus)
        .select($"clip_id", $"n").orderBy($"clip_id")
      // distributed membership REQUIREs before the collect (see m74)
      val tdK = takedownDf.select($"clip_id")
      require(result.join(tdK, Seq("clip_id"), "left_semi").count() == 0,
        "a taken-down clip surfaced in the corpus")
      require(result.filter($"clip_id" % 2 === 1)
          .join(tdK.select(($"clip_id" + 1).as("clip_id")),
            Seq("clip_id"), "left_semi").count() > 0,
        "an orphaned variant (base taken down) must be RE-ADMITTED — " +
          "the index must not keep suppressing lawful copies")
      val rows = result.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), result.schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }

  /** One m75 ingest: admit `batch` (clip_id, fp — one row per
    * distinct keyframe), judge it against everything earlier by the
    * shared-≥-2 + Jaccard-≥-1/2 rule, positionally delete the losers,
    * persist all batch fingerprints with the clip's set size as
    * payload. Returns the probe's (scanned, total) index file counts.
    * DELIBERATELY mirrors m70Ingest's skeleton rather than
    * parameterizing over it: the judges differ structurally (per-pair
    * Hamming verify over band-key candidates vs per-pair set-Jaccard
    * aggregation over direct fingerprint hits, with the set size
    * riding the index rows), so a shared body would be a lambda per
    * line — the parallel shape is kept readable instead, and the d47
    * invariants each skeleton enforces are REQUIREd by its query. */
  private[graft] def m75Ingest(spark: SparkSession, corpus: String,
      sigsT: String, batch: DataFrame, first: Boolean,
      inBatchPred: org.apache.spark.sql.Column): (Int, Int) = {
    import spark.implicits._
    import graft.io.TxnTable
    val sized = batch.groupBy($"clip_id").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    sized.write.format("graft").option("mergeOnRead", "true")
      .option("statsCols", "clip_id")
      .mode(if (first) "overwrite" else "append").save(corpus)
    val sig = batch.join(sized, "clip_id").localCheckpoint()
    // concurrent-ingest re-probe, part 1 (see m70Ingest / the
    // probePersisted concurrency contract)
    val vProbe: Long =
      if (first) -1L else TxnTable.latestVersion(spark, sigsT).get
    val (cross, pruneCounts) =
      if (first) (spark.emptyDataset[Long].toDF("clip_id"), (0, 0))
      else {
        val (cand, pc) = graft.dedup.DedupOps.probePersisted(spark,
          sigsT, sig, joinCols = Seq("fp"),
          out = Seq("clip_id", "n", "pid", "pn"),
          keyCol = "fp", cat = "gm75spj", scanPayload = Seq("pid", "pn"))
        (cand.filter($"pid" < $"clip_id")
          .groupBy($"clip_id", $"n", $"pid", $"pn")
          .agg(count(lit(1)).as("shared"))
          .filter($"shared" >= 2 &&
            $"shared" * 2 >= ($"n" + $"pn" - $"shared"))
          .select($"clip_id"), pc)
      }
    // in-batch pairs: only fps that repeat within the batch can form
    // a candidate (the m70 dupKeys prefilter — collision-bounded work)
    val dupKeys = sig.groupBy($"fp").agg(count(lit(1)).as("_n"))
      .filter($"_n" > 1).select($"fp")
    val sigd = sig.join(dupKeys, Seq("fp"))
    val inBatch = sigd
      .select($"fp", $"clip_id".as("ia"), $"n".as("na"))
      .join(sigd.select($"fp", $"clip_id".as("ib"), $"n".as("nb")),
        Seq("fp"))
      .filter($"ia" < $"ib")
      .groupBy($"ib", $"ia", $"na", $"nb")
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >= 2 &&
        $"shared" * 2 >= ($"na" + $"nb" - $"shared"))
      .select($"ib".as("clip_id"))
    val losers = cross.union(inBatch).distinct()
    if (losers.limit(1).count() > 0L) {
      val rows = TxnTable.readWithRowIdentity(spark, corpus)
        .filter(inBatchPred)
      TxnTable.deletePositions(spark, corpus,
        rows.join(broadcast(losers), Seq("clip_id"), "left_semi"))
      ()
    }
    val psig = sig.select($"fp", $"clip_id".as("pid"), $"n".as("pn"))
    if (first)
      psig.write.format("graft")
        .option("statsCols", "fp,pid").option("bloomCols", "fp")
        .option("optimizedWrite", "true")
        .option("partitionBy", "bucket(16, fp)").mode("overwrite")
        .save(sigsT)
    else {
      val vLanded = TxnTable.commitAppend(psig, sigsT,
        statsCols = Seq("fp", "pid"), bloomCols = Seq("fp"),
        optimizedWrite = true)
      // re-probe, part 2: the m75 judge (shared ≥ 2 + integer-exact
      // Jaccard ≥ 1/2, earlier-id keep) applied to exactly the
      // foreign window — the set sizes ride the foreign rows (pn), so
      // no second table is consulted here either
      graft.dedup.DedupOps.reprobeWindow(spark, sigsT, vProbe,
        vLanded) { foreign =>
        sig.join(broadcast(foreign.select($"fp", $"pid", $"pn")),
            Seq("fp"))
          .filter($"pid" < $"clip_id")
          .groupBy($"clip_id", $"n", $"pid", $"pn")
          .agg(count(lit(1)).as("shared"))
          .filter($"shared" >= 2 &&
            $"shared" * 2 >= ($"n" + $"pn" - $"shared"))
          .select($"clip_id").distinct()
      } { late =>
        val rows = TxnTable.readWithRowIdentity(spark, corpus)
          .filter(inBatchPred)
        TxnTable.deletePositions(spark, corpus,
          rows.join(broadcast(late), Seq("clip_id"), "left_semi"))
        ()
      }
    }
    pruneCounts
  }

  private val m75Sql =
    """WITH d AS (SELECT doc_id AS cid, 4 + doc_id % 3 AS nf FROM documents),
      |clips AS (
      |  SELECT cid * 2 AS clip_id, cid, nf FROM d
      |  UNION ALL
      |  SELECT cid * 2 + 1, cid, nf FROM d WHERE cid % 5 = 0),
      |fps AS (
      |  SELECT clip_id, (cid * 7 + s.g * 53) % 512 AS fp
      |  FROM clips, generate_series(0, 2) s(g)
      |  WHERE s.g < CAST(CEIL(nf / 2.0) AS BIGINT)),
      |sizes AS (SELECT clip_id, COUNT(*) AS n FROM fps GROUP BY 1),
      |pairs AS (
      |  SELECT a.clip_id AS i, b.clip_id AS j, COUNT(*) AS shared
      |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.clip_id > b.clip_id
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |near AS (
      |  SELECT i, j FROM pairs
      |  JOIN sizes sa ON sa.clip_id = i
      |  JOIN sizes sb ON sb.clip_id = j
      |  WHERE 2 * shared >= sa.n + sb.n - shared),
      |dups1 AS (
      |  SELECT DISTINCT i FROM near WHERE i % 2 = 0 AND j % 2 = 0),
      |adm1 AS (
      |  SELECT clip_id FROM sizes WHERE clip_id % 2 = 0
      |    AND clip_id NOT IN (SELECT i FROM dups1)),
      |takedown AS (SELECT clip_id FROM adm1 WHERE clip_id % 14 = 0),
      |dups2 AS (
      |  SELECT DISTINCT i FROM near
      |  WHERE i % 2 = 1 AND (j % 2 = 1 OR
      |    j NOT IN (SELECT clip_id FROM takedown))),
      |fin AS (
      |  SELECT clip_id FROM adm1
      |  WHERE clip_id NOT IN (SELECT clip_id FROM takedown)
      |  UNION ALL
      |  SELECT clip_id FROM sizes WHERE clip_id % 2 = 1
      |    AND clip_id NOT IN (SELECT i FROM dups2))
      |SELECT f.clip_id, CAST(s.n AS BIGINT) AS n FROM fin f
      |JOIN sizes s ON s.clip_id = f.clip_id
      |ORDER BY f.clip_id""".stripMargin

  // ---------------------------------------------------------------- m76
  /** CDF-SUBSCRIBED IMAGE-INDEX TAKEDOWN — p93's subscription topology
    * applied to the media side: the takedown touches ONLY the image
    * corpus (one frame-keyed positional delete; no index named
    * anywhere in the takedown path), and the fingerprint index erases
    * itself by draining the corpus change feed. m73's semantics —
    * takedown + re-admission — with the coupling inverted.
    *
    * The discrimination contract (the reason this drains a WINDOW,
    * not a tail): the corpus feed carries BOTH takedown deletes and
    * dedup-loser deletes, and the d47 invariant says loser signatures
    * must PERSIST (a died image keeps witnessing against later
    * copies) while takedown signatures must ERASE (re-admission).
    * Row-level change types cannot tell them apart, so the subscriber
    * consumes the feed in takedown windows — the takedown driver
    * publishes its (since, until] commit window (equivalently: a
    * production deployment routes takedowns through a tombstone
    * stream the indexes subscribe to; dedup deletes never enter it —
    * that stream EXISTS as of p94 (`text/PipelineOps.scala`): a typed
    * takedown-feed table drained exactly-once per leg via
    * `TxnTable.deleteFromPosIdempotent`. This query keeps the
    * window-drain spelling deliberately: it pins that a bare corpus
    * CDF subscription is still SOUND when a deployment scopes it to
    * takedown windows, and its final state hash-gates the machinery
    * against m73's closed-form oracle).
    * REQUIREd: the drained erasure is a deletion vector (zero index
    * rewrites), the live index EQUALS the explicit-delete state
    * (band keys of every batch-1 fingerprint minus the taken-down
    * ids — set equality), and an orphaned variant RE-ADMITS. The
    * final state is byte-identical to m73's, so m73's closed-form
    * oracle hash-gates the whole subscription machinery. */
  private def m76(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.io.TxnTable
    val zone = java.nio.file.Files
      .createTempDirectory("graft_m76_cdf").toFile.getAbsolutePath
    try {
      val corpus = s"$zone/imgs_txn"
      val sigsT = s"$zone/isigs_txn"
      val fps = imageFingerprints(spark, dir)
        .select($"item_id".as("img_id"), $"fp")
      val evens = fps.filter($"img_id" % 2 === 0).localCheckpoint()
      m70Ingest(spark, corpus, sigsT, evens,
        first = true, col("img_id") % 2 === 0, cdfFirst = true)
      val vPre = TxnTable.latestVersion(spark, corpus).get
      // the takedown: ONE positional delete on the corpus alone
      val takedownDf = spark.read.format("graft").load(corpus)
        .filter($"img_id" % 14 === 0)
        .select($"img_id").localCheckpoint()
      val takedown = takedownDf.as[Long].collect().toSet
      require(takedown.nonEmpty, "the takedown batch must be non-empty")
      TxnTable.deleteFromPos(spark, corpus, takedownDf, Seq("img_id"))
      val vPost = TxnTable.latestVersion(spark, corpus).get
      // the SUBSCRIPTION: drain the takedown window's delete-typed
      // rows and erase them from the index — frame-keyed end to end
      val dels = TxnTable.changeFeed(spark, corpus, vPre, vPost)
        .filter(col(TxnTable.ChangeTypeCol) === "delete")
        .select($"img_id".as("pid")).localCheckpoint()
      val beforeS = TxnTable.snapshotFiles(spark, sigsT,
        TxnTable.latestVersion(spark, sigsT).get).toSet
      TxnTable.deleteFromPos(spark, sigsT, dels, Seq("pid"))
      require(beforeS.subsetOf(TxnTable.morState(spark, sigsT,
          TxnTable.latestVersion(spark, sigsT).get).files.toSet),
        "the subscribed erasure must be a deletion vector, not a rewrite")
      // subscription equality: live index == explicit-delete state
      // (every batch-1 fingerprint's band keys, minus taken-down ids —
      // died images' signatures persist, the d47 invariant)
      // re-select after the join: USING-join output leads with the
      // join key, and except compares by POSITION
      val expected = bandKeys(evens)
        .select($"bk", $"img_id".as("pid"), $"fp".as("pfp"))
        .join(takedownDf.select($"img_id".as("pid")), Seq("pid"),
          "left_anti")
        .select($"bk", $"pid", $"pfp")
      val live = spark.read.format("graft").load(sigsT)
        .select($"bk", $"pid", $"pfp")
      // except has SET semantics — the count gate makes the equality
      // multiset-exact (a double-applied append would pass except but
      // fail the count)
      require(live.count() == expected.count() &&
        live.except(expected).isEmpty &&
        expected.except(live).isEmpty,
        "the subscribed index diverged from the explicit-delete state")
      // a later near-dup of a taken-down image must RE-ADMIT
      m70Ingest(spark, corpus, sigsT, fps.filter($"img_id" % 2 === 1),
        first = false, col("img_id") % 2 === 1)
      val result = spark.read.format("graft").load(corpus)
        .select($"img_id", $"fp").orderBy($"img_id")
      // distributed membership REQUIREs before the collect (see m74)
      val tdK = takedownDf.select($"img_id")
      require(result.join(tdK, Seq("img_id"), "left_semi").count() == 0,
        "a taken-down image surfaced in the corpus")
      require(result.filter($"img_id" % 2 === 1)
          .join(tdK.select(($"img_id" + 1).as("img_id")),
            Seq("img_id"), "left_semi").count() > 0,
        "an orphaned variant (base taken down) must be RE-ADMITTED")
      val rows = result.collect()
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), result.schema)
    } finally {
      graft.io.Tables.deleteTree(new java.io.File(zone))
    }
  }

  val all: Seq[RQ] = Seq(
    RQ("m71_video_keyframes", m71, Some(m71Sql)),
    RQ("m60_binary_meta", m60, Some(m60Sql)),
    RQ("m61_content_sniff", m61, Some(m61Sql)),
    RQ("m62_wav_frame_sample", m62, Some(m62Sql)),
    RQ("m63_png_roundtrip", m63, Some(m63Sql)),
    RQ("m64_wav_roundtrip", m64, Some(m64Sql)),
    RQ("m65_gif_frames", m65, Some(m65Sql)),
    RQ("m66_image_resize", m66, Some(m66Sql)),
    RQ("m67_audio_resample", m67, Some(m67Sql)),
    RQ("m68_phash_neardup", m68, Some(m68Sql)),
    RQ("m69_audio_neardup", m69, Some(m69Sql)),
    RQ("m70_incremental_image_dedup", m70, Some(m70Sql)),
    RQ("m72_video_neardup", m72, Some(m72Sql)),
    RQ("m74_audio_index_lifecycle", m74, Some(m74Sql)),
    RQ("m75_video_index_lifecycle", m75, Some(m75Sql)),
    RQ("m76_image_cdf_takedown", m76, Some(m73Sql)),
    RQ("m73_image_takedown", m73, Some(m73Sql)))

  // ---------------------------------------------------------------- m71
  /** VIDEO KEYFRAME EXTRACTION by scene-change detection — the standard
    * video pre-processing step for multimodal training data (sample
    * one representative frame per scene instead of every frame). The
    * "clip" is a REAL multi-frame container (m65's animated GIF — the
    * one genuine video-shaped codec in the JDK): each document encodes
    * 4 + doc_id % 3 frames whose content is constant WITHIN a scene
    * (two frames per scene) and shifts wholesale at scene boundaries.
    * The engine decodes every frame, fingerprints its pixel bytes, and
    * emits a keyframe wherever the fingerprint CHANGES from the
    * previous frame (frame 0 always keys) — all inside one
    * mapPartitions pass (a clip's frames never straddle workers, so
    * consecutive-frame comparison needs no shuffle; at 100 TB the unit
    * of parallelism is the clip, exactly like production keyframing).
    * The oracle states the scene boundaries from the closed-form
    * construction WITHOUT parsing GIF: a wrong decode, fingerprint, or
    * change detector mismatches frame counts or keyframe positions. */
  private def m71(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val Side = 8
    val encoded: Dataset[(Long, Array[Byte])] = Tables.documents(spark, dir)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        val ramp = Array.tabulate(256)(_.toByte)
        val palette =
          new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
        it.map { id =>
          val nFrames = (4 + id % 3).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val writer =
            javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val scene = f / 2 // two frames per scene, content constant
            val img = new java.awt.image.BufferedImage(Side, Side,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
            val raster = img.getRaster
            var y = 0
            while (y < Side) {
              var x = 0
              while (x < Side) {
                raster.setSample(x, y, 0,
                  ((id * 7 + scene * 53 + x * 3 + y * 11) % 256).toInt)
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
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val reader =
            javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          var prev: String = null
          val keys = scala.collection.mutable.ArrayBuffer.empty[Int]
          var f = 0
          while (f < n) {
            val img = reader.read(f)
            val sb = new java.lang.StringBuilder()
            var y = 0
            while (y < Side) {
              var x = 0
              while (x < Side) {
                sb.append(img.getRaster.getSample(x, y, 0)).append(',')
                x += 1
              }
              y += 1
            }
            md.reset()
            val fp = md.digest(sb.toString.getBytes("US-ASCII"))
              .map("%02x".format(_)).mkString
            if (prev == null || fp != prev) keys += f
            prev = fp
            f += 1
          }
          reader.dispose(); iis.close()
          keys.zipWithIndex.map { case (kf, s) =>
            (id, s.toLong, kf.toLong, n.toLong)
          }
        }
      }
      .toDF("doc_id", "scene_no", "key_frame", "n_frames")
      .orderBy($"doc_id", $"scene_no")
  }
  // def, not val: defined after `all` in initialization order
  private def m71Sql =
    """WITH d AS (SELECT doc_id, 4 + doc_id % 3 AS nf FROM documents),
      |scenes AS (
      |  SELECT doc_id, nf,
      |    UNNEST(range(0, CAST(CEIL(nf / 2.0) AS BIGINT))) AS scene_no
      |  FROM d)
      |SELECT doc_id, CAST(scene_no AS BIGINT) AS scene_no,
      |  CAST(scene_no * 2 AS BIGINT) AS key_frame,
      |  CAST(nf AS BIGINT) AS n_frames
      |FROM scenes ORDER BY doc_id, scene_no""".stripMargin

  // ---------------------------------------------------------------- m72
  /** VIDEO NEAR-DUP ACROSS CLIPS — m71's per-clip keyframe
    * fingerprints become the dedup key: two clips are near-duplicates
    * when they share ≥ 2 keyframe fingerprints, scored by Jaccard over
    * the fingerprint sets (d35's shape). Candidates come from a
    * fingerprint EQUI-join — never clip×clip (the m68/d37 LSH
    * contract, pinned by PlanShapeSpec): work scales with fingerprint
    * collisions, not with clip pairs.
    *
    * Clip synthesis, all real codec plumbing: each doc becomes an
    * animated GIF (4 + cid%3 frames, two frames per scene); a scene's
    * 8×8 pixels are md5-derived from its SCENE KEY (cid·7 + scene·53
    * mod 512), so distinct keys give unrelated frames while colliding
    * keys give bit-identical ones — the closed form the oracle
    * recomputes without decoding anything. Every 5th clip also ships
    * an engineered near-dup variant: the base GIF is DECODED and
    * RE-ENCODED trimmed by its first frame — a real re-encode of a
    * real trim that drops no SCENE (the first scene's second frame
    * survives), so the variant's keyframe-fingerprint set provably
    * equals the base's and recall on engineered pairs is 100% with no
    * tuning (m68's confine-the-change discipline). The 512-key space
    * additionally yields genuine cross-clip collisions (clips whose
    * cids differ by 53·7⁻¹ share all-but-shifted scenes), so the
    * output mixes jaccard-1.0 engineered pairs with partial overlaps.
    *
    * At 100 TB: encode/decode/fingerprint are embarrassingly parallel
    * mapPartitions with per-partition codec init; the fingerprint
    * table is ~50 bytes/scene; the candidate join shuffles fingerprint
    * rows by key. */
  private def m72(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val res = m72Frame(spark, dir)
    val rows = res.collect()
    // engineered recall is 100% by construction — REQUIRE it: every
    // (base, trimmed-re-encode) pair surfaces, at jaccard exactly 1.0
    // (x/x — bit-exact). Spelled as an anti-join whose EXPECTED side
    // stays distributed (at crawl scale the engineered-pair list is
    // corpus-sized, never a driver loop); the result side is the
    // already-collected query output, so the join pipeline runs once
    val got = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), res.schema)
    val expected = Tables.documents(spark, dir)
      .filter($"doc_id" % 5 === 0)
      .select(($"doc_id" * 2).as("clip_a"),
        ($"doc_id" * 2 + 1).as("clip_b"))
    val missed = expected.join(
      got.filter($"jaccard" === 1.0).select($"clip_a", $"clip_b"),
      Seq("clip_a", "clip_b"), "left_anti")
    require(missed.isEmpty,
      "an engineered near-dup pair was missed or scored below 1.0")
    got
  }

  /** m72's LAZY result frame — separated from the collecting wrapper
    * so PlanShapeSpec pins the REAL candidate-join plan (a collected
    * LocalRelation would make the no-cartesian assertion vacuous). */
  private[graft] def m72Frame(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    val fps = videoFingerprints(spark, dir)
    val sizes = fps.groupBy($"clip_id").agg(count(lit(1)).as("n"))
    val cands = fps.as("a")
      .join(fps.as("b"),
        $"a.fp" === $"b.fp" && $"a.clip_id" < $"b.clip_id")
      .groupBy($"a.clip_id".as("clip_a"), $"b.clip_id".as("clip_b"))
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >= 2)
    cands
      .join(sizes.select($"clip_id".as("clip_a"), $"n".as("na")), "clip_a")
      .join(sizes.select($"clip_id".as("clip_b"), $"n".as("nb")), "clip_b")
      .select($"clip_a", $"clip_b", $"shared".cast("bigint").as("shared"),
        ($"shared".cast("double") /
          ($"na" + $"nb" - $"shared").cast("double")).as("jaccard"))
      .orderBy($"clip_a", $"clip_b")
  }

  /** m72's per-clip keyframe-fingerprint rows (clip_id, fp) — the GIF
    * encode → decode → frame-hash chain with the engineered
    * trim-re-encode variants, shared by m72 (one-shot near-dup) and
    * m75 (maintained index). One md5 fingerprint row per distinct
    * frame of each clip. */
  private[graft] def videoFingerprints(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val Side = 8
    val K = 512L
    val encoded: Dataset[(Long, Array[Byte])] =
      Tables.documents(spark, dir).select($"doc_id").as[Long]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val ramp = Array.tabulate(256)(_.toByte)
          val palette =
            new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
          def frameOf(key: Long): java.awt.image.BufferedImage = {
            val img = new java.awt.image.BufferedImage(Side, Side,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, palette)
            val raster = img.getRaster
            var y = 0
            while (y < Side) {
              var x = 0
              while (x < Side) {
                val d = md.digest(s"v:$key:$x:$y"
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8))
                raster.setSample(x, y, 0, d(0) & 0xff)
                x += 1
              }
              y += 1
            }
            img
          }
          def encode(
              frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
            val bos = new java.io.ByteArrayOutputStream()
            val writer = javax.imageio.ImageIO
              .getImageWritersByFormatName("gif").next()
            val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            frames.foreach(f => writer.writeToSequence(
              new javax.imageio.IIOImage(f, null, null), null))
            writer.endWriteSequence()
            ios.close()
            writer.dispose()
            bos.toByteArray
          }
          it.flatMap { cid =>
            val nf = (4 + cid % 3).toInt
            val base =
              encode((0 until nf).map(f => frameOf((cid * 7 + (f / 2) * 53) % K)))
            if (cid % 5 != 0) List((2 * cid, base))
            else {
              // the engineered near-dup: decode the BASE bytes and
              // re-encode trimmed by its first frame — every scene
              // survives (scene 0 keeps its second frame), so the
              // fingerprint sets are provably equal
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(base))
              val reader = javax.imageio.ImageIO
                .getImageReadersByFormatName("gif").next()
              reader.setInput(iis)
              val kept = (1 until reader.getNumImages(true))
                .map(reader.read(_): java.awt.image.BufferedImage)
              reader.dispose(); iis.close()
              List((2 * cid, base), (2 * cid + 1, encode(kept)))
            }
          }
        }
    val fps = encoded
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (clipId, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val reader = javax.imageio.ImageIO
            .getImageReadersByFormatName("gif").next()
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          val set = scala.collection.mutable.LinkedHashSet.empty[String]
          var f = 0
          while (f < n) {
            val img = reader.read(f)
            val sb = new java.lang.StringBuilder()
            var y = 0
            while (y < Side) {
              var x = 0
              while (x < Side) {
                sb.append(img.getRaster.getSample(x, y, 0)).append(',')
                x += 1
              }
              y += 1
            }
            md.reset()
            set += md.digest(sb.toString.getBytes("US-ASCII"))
              .map("%02x".format(_)).mkString
            f += 1
          }
          reader.dispose(); iis.close()
          set.toSeq.map((clipId, _))
        }
      }
      .toDF("clip_id", "fp").localCheckpoint()
    fps
  }
  // def, not val: defined after `all` in initialization order
  private def m72Sql =
    """WITH d AS (SELECT doc_id AS cid, 4 + doc_id % 3 AS nf FROM documents),
      |clips AS (
      |  SELECT cid * 2 AS clip_id, cid, nf FROM d
      |  UNION ALL
      |  SELECT cid * 2 + 1, cid, nf FROM d WHERE cid % 5 = 0),
      |fps AS (
      |  SELECT clip_id, (cid * 7 + s.g * 53) % 512 AS fp
      |  FROM clips, generate_series(0, 2) s(g)
      |  WHERE s.g < CAST(CEIL(nf / 2.0) AS BIGINT)),
      |sizes AS (SELECT clip_id, COUNT(*) AS n FROM fps GROUP BY 1),
      |shr AS (
      |  SELECT a.clip_id AS clip_a, b.clip_id AS clip_b,
      |    COUNT(*) AS shared
      |  FROM fps a JOIN fps b ON a.fp = b.fp AND a.clip_id < b.clip_id
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT clip_a, clip_b, CAST(shared AS BIGINT) AS shared,
      |  CAST(shared AS DOUBLE) / CAST(sa.n + sb.n - shared AS DOUBLE)
      |    AS jaccard
      |FROM shr JOIN sizes sa ON sa.clip_id = clip_a
      |         JOIN sizes sb ON sb.clip_id = clip_b
      |ORDER BY clip_a, clip_b""".stripMargin
}
