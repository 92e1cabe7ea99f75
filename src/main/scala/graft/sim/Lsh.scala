package graft.sim

/** Sign-random-projection LSH for embedding vectors (the bucketed
  * candidate-generation strategy behind distributed top-k similarity
  * search; cf. "REPOSE: Distributed Top-k Trajectory Similarity Search",
  * ICDE 2021, and "Continuously Adaptive Similarity Search", SIGMOD 2020,
  * for the partition-pruning framing — PAPERS.md).
  *
  * The hyperplanes are DETERMINISTIC ±1 vectors derived from MD5 parity
  * (`plane p, dim d → +1 iff md5("p:d") starts with 0..7`), computed once
  * at query-construction time and inlined as literals into BOTH the Spark
  * expression and the DuckDB oracle — so the bucket assignment is
  * engine-exact with zero runtime hashing.
  *
  * Bucket = the 8 sign bits of plane·embedding (a 256-way partition of the
  * corpus). At 100 TB this is the ANN scale path: bucket becomes the
  * shuffle/partition key, and candidate generation is an equi-join on it
  * (≈ n/256 comparisons per probe) instead of a full cross join; recall is
  * tuned by adding plane sets (multi-probe) exactly like MinHash bands. */
object Lsh {
  val nPlanes = 8
  val dim = 64

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  /** planes(p)(d) ∈ {+1, -1}, p in 0..7, d in 0..63. */
  lazy val planes: Seq[Seq[Int]] =
    (1 to nPlanes).map { p =>
      (0 until dim).map { d =>
        if ("01234567".contains(md5hex(s"$p:$d").charAt(0))) 1 else -1
      }
    }

  /** Spark Column for the bucket of an embedding column: each bit is the
    * sign of a plane·embedding dot product, computed by the NATIVE
    * one-pass kernel (graft.functions.GraftDot — codegen'd; the previous
    * HOF spelling evaluated 64 interpreted lambda calls per plane per
    * row). Plane vectors are inlined as literal arrays, identical to the
    * literals in the DuckDB oracle, so the signs are engine-exact.
    * `n` ≤ nPlanes bits: fewer planes → coarser buckets → higher recall;
    * small corpora want 4 bits (16 buckets), big ones 8+. */
  def bucketCol(embedding: org.apache.spark.sql.Column, n: Int = nPlanes): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftBridge
    val bits = planes.take(n).map { pl =>
      val arr = array(pl.map(v => lit(v.toDouble)): _*)
      val dot = GraftBridge.column(graft.functions.GraftDot(
        GraftBridge.expression(embedding), GraftBridge.expression(arr)))
      when(dot >= 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** SQL-string spelling of bucketCol (the pre-native HOF form), kept for
    * SQL-text callers and as the reference semantics in LshSpec. */
  def bucketSpark(col: String, n: Int = nPlanes): String = {
    val bits = planes.take(n).map { pl =>
      val arr = pl.map(v => s"$v.0D").mkString("array(", ", ", ")")
      s"""CASE WHEN aggregate(
         |  zip_with($col, $arr, (x, y) -> CAST(x AS DOUBLE) * y),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v) >= 0 THEN '1' ELSE '0' END""".stripMargin
    }
    bits.mkString("concat(", ", ", ")")
  }

  /** DuckDB oracle expression for the same bucket (same literals, same
    * left-to-right fold → identical signs). */
  def bucketSql(col: String, n: Int = nPlanes): String = {
    val bits = planes.take(n).map { pl =>
      val arr = pl.map(v => s"$v.0").mkString("[", ", ", "]::DOUBLE[]")
      s"""CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |  list_transform(list_zip($col, $arr), s -> s[1]::DOUBLE * s[2])),
         |  (acc, v) -> acc + v) >= 0 THEN '1' ELSE '0' END""".stripMargin
    }
    bits.mkString(" || ")
  }
}
