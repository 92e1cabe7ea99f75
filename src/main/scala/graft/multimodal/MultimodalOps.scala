package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q => RQ}
import graft.io.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata (BASELINE.json north_star).
  *
  * The container has no image/audio codecs, so DecodeStub below is a
  * clearly-marked DETERMINISTIC FAKE of the decode step; everything
  * Spark-side — binary column handling, metadata schema, the
  * mapPartitions batch shape (the Scala analog of `mapInPandas`:
  * partition-at-a-time iterator, decoder initialized once per partition,
  * not per row) — is real and oracle-/test-covered. Swapping DecodeStub
  * for a real codec changes no plumbing.
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
    * partition-at-a-time decoder seam. */
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

  val all: Seq[RQ] = Seq(
    RQ("m60_binary_meta", m60, Some(m60Sql)),
    RQ("m61_decode_stub", m61, Some(m61Sql)),
    RQ("m62_frame_sample", m62, Some(m62Sql)))
}
