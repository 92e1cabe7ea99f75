package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of engine surface: a Spark-side query plus (usually)
  * an ANSI-SQL oracle the driver runs in DuckDB over the same parquet tables.
  * Queries without an oracle (non-SQL-expressible ops) get a weaker
  * rows-only check from the driver. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Include in the Bench headline set. */
    bench: Boolean = false)

object Registry {
  def all: Seq[Q] =
    graft.ops.Relational.all ++
      graft.ops.Analytic.all ++
      graft.ops.Analytic2.all ++
      graft.text.TextOps.all ++
      graft.text.Text2Ops.all ++
      graft.text.PipelineOps.all ++
      graft.dedup.DedupOps.all ++
      graft.sim.SimilarityOps.all ++
      graft.streaming.StreamingOps.all ++
      graft.multimodal.MultimodalOps.all ++
      graft.wallet.WalletOps.all ++
      graft.io.FormatOps.all ++
      graft.plans.PlanOps.all

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // toMap would silently drop a name collision — and with it a query's
    // entire correctness coverage; fail loudly instead
    val dups = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all.map(q => q.name -> q.fn).toMap
  }

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
