package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity primitives over `ArrayType(FloatType)` embedding
  * columns — pure Catalyst higher-order functions (zip_with/aggregate),
  * fully codegen'd, no UDFs.
  *
  * Bit-stability: element products are computed in DOUBLE (exact float
  * widening) and accumulated left-to-right — a per-row fold with a single
  * defined evaluation order, mirrored in DuckDB by `list_reduce`, so
  * cosine values are bit-identical across engines.
  */
object Similarity {

  import org.apache.spark.sql.GraftBridge

  /** Dot product of two float-array columns as a strict LEFT-TO-RIGHT
    * double fold — the native one-pass expression
    * (graft.functions.GraftDot, codegen'd; no per-row product array, no
    * interpreted lambdas). Bit-stability rationale: a per-row fold has ONE
    * defined evaluation order, so unlike a partitioned sum it is
    * deterministic; the DuckDB oracle mirrors it with
    * `list_reduce(..., (acc,v)->acc+v)`, the same fold over the same
    * element doubles — and GraftVecSpec pins the native kernel against the
    * HOF spelling bit-for-bit. (Decimal accumulation was tried first but
    * DuckDB's double→DECIMAL(38,20) cast rounds differently than Spark's
    * BigDecimal at the 20th digit.) */
  def dot(a: String, b: String): Column =
    GraftBridge.column(graft.functions.GraftDot(
      GraftBridge.expression(col(a)), GraftBridge.expression(col(b))))

  /** Squared L2 norm (same accumulation scheme). */
  def norm2(a: String): Column = dot(a, a)

  /** Cosine similarity between two embedding columns: the three folds
    * (a·b, a·a, b·b) fused into one native loop (graft.functions
    * .GraftCosine) — per-accumulator addition order is unchanged, so the
    * value is bit-identical to the three-fold spelling the oracle uses. */
  def cosine(a: String, b: String): Column =
    GraftBridge.column(graft.functions.GraftCosine(
      GraftBridge.expression(col(a)), GraftBridge.expression(col(b))))

  /** Indexes of the `nprobe` nearest centroids for each row — the native
    * IVF coarse quantizer (graft.functions.GraftNearestCells): centroids
    * ride inside the expression as a plan constant, so cell assignment is
    * a pure codegen'd projection — no crossJoin row amplification, no
    * argmax window shuffle. */
  def nearestCells(a: String, cents: Array[Array[Double]], nprobe: Int): Column =
    GraftBridge.column(graft.functions.GraftNearestCells(
      GraftBridge.expression(col(a)), cents, nprobe))

  /** Product-quantization sub-codebook assignment: index of the L2-nearest
    * sub-centroid for the row's subvector starting at `sliceStart`
    * (centroid arrays arrive pre-sliced). Same zero-amplification
    * projection kernel as nearestCells, minimizing Σ(x−y)². */
  def nearestSubCells(a: String, subCents: Array[Array[Double]], nprobe: Int,
      sliceStart: Int): Column =
    GraftBridge.column(graft.functions.GraftNearestCells(
      GraftBridge.expression(col(a)), subCents, nprobe,
      metric = "l2", sliceStart = sliceStart))

  /** The HOF spelling of dot (what `dot` compiled to before the native
    * expression existed) — kept as the reference semantics for tests. */
  def dotHof(a: String, b: String): Column =
    expr(
      s"""aggregate(
         |  zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
         |  CAST(0 AS DOUBLE),
         |  (acc, v) -> acc + v)""".stripMargin)

  /** Oracle-side spelling of dot(a, b) for DuckDB: the same left-to-right
    * fold over the same element doubles. */
  def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       | list_transform(list_zip($a, $b), s -> s[1]::DOUBLE * s[2]::DOUBLE)),
       | (acc, v) -> acc + v)""".stripMargin

  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (SQRT(${dotSql(a, a)}) * SQRT(${dotSql(b, b)}))"
}
