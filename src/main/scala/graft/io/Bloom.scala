package graft.io

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-file BLOOM FILTER for equality data-skipping — the point-lookup
  * companion to the manifest's min/max stats. Min/max prunes ranges on
  * CLUSTERED columns; a point predicate on a high-cardinality UNSORTED
  * key (user id, document id — the GDPR delete-by-id shape) overlaps
  * every file's range, so stats prune nothing. A bloom filter answers
  * "is this key definitely absent from this file?" regardless of
  * layout: at 100 TB a point delete touches the handful of
  * bloom-positive files and carries everything else by reference.
  * Same design as Parquet column bloom filters / Delta's bloom index:
  * an immutable per-(file, column) bitset written once at commit.
  *
  * Representation: an m-bit array (m a multiple of 8) as a flat byte
  * array (bit i lives in byte `i >> 3` at position `i & 7`); k probe
  * positions per key derived from ONE 64-bit xxhash64 by double
  * hashing (`pos_i = h + i*h2 mod m`, Kirsch–Mitzenmacher) — the
  * standard construction, no k independent hash passes over the data.
  * The 64-bit input hash is Spark's own `xxhash64(col)` (seed 42),
  * computed distributed at write time and re-computed driver-side for
  * query constants via the same Catalyst hash function, so the two
  * sides can never disagree.
  *
  * False positives only ever cost a wasted file read; a false NEGATIVE
  * would silently drop data from a point delete, so `mightContain`
  * correctness (never-false-negative) is property-tested in
  * BloomSkipSpec. */
object Bloom {

  /** Default 2^17 bits = 16 KiB per (file, column): <1% false positives
    * up to ~13k distinct keys per file; at 1M keys/file (100 TB-scale
    * files) raise `graft.txn.bloomBits` — the sidecar stays a fraction
    * of the parquet file it describes. */
  val DefaultBits = 131072
  val DefaultHashes = 7

  private def h2of(h: Long): Long = (h >>> 33) | 1L // odd step => probes spread

  def add(bytes: Array[Byte], bits: Int, hashes: Int, h: Long): Unit = {
    val step = h2of(h)
    var i = 0
    while (i < hashes) {
      val pos = java.lang.Math.floorMod(h + i.toLong * step, bits.toLong).toInt
      bytes(pos >>> 3) = (bytes(pos >>> 3) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  def mightContain(bytes: Array[Byte], bits: Int, hashes: Int, h: Long): Boolean = {
    val step = h2of(h)
    var i = 0
    while (i < hashes) {
      val pos = java.lang.Math.floorMod(h + i.toLong * step, bits.toLong).toInt
      if ((bytes(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Distributed bitset construction: one typed Aggregator per file
    * group — `reduce` sets k bits per key hash, `merge` ORs partial
    * bitsets (associative + commutative, so partition merge order never
    * matters). Input is the already-computed `xxhash64(col)` value;
    * NULL keys are filtered out before aggregation (min/max stats say
    * nothing about NULLs and neither does the bloom — the per-file
    * null count gates NULL semantics separately). The buffer is the
    * flat byte array itself, so the row encoder handles it natively. */
  /** [[BuildAgg]] over a NULLABLE hash column: null inputs are skipped
    * in `reduce` instead of pre-filtered, so the bloom build can ride
    * the SAME read-back pass as per-file stats (which must see every
    * row) — one scan of the fresh files per commit, not two. */
  final class BuildAggNullable(bits: Int, hashes: Int)
      extends Aggregator[java.lang.Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = new Array[Byte](bits / 8)
    override def reduce(b: Array[Byte], h: java.lang.Long): Array[Byte] = {
      if (h != null) add(b, bits, hashes, h.longValue())
      b
    }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
      x
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class BuildAgg(bits: Int, hashes: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = new Array[Byte](bits / 8)
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      add(b, bits, hashes, h); b
    }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
      x
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
