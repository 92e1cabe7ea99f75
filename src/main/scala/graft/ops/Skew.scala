package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salting.
  *
  * A shuffle join hashes rows by key; one hot key (a celebrity user, a
  * default/null bucket) lands an entire reducer on one task. Salting
  * splits each fact key into `salts` sub-keys and replicates the matching
  * dimension rows across all sub-keys, so the hot key's rows spread over
  * `salts` tasks. Result is row-identical to the plain join (spec-pinned).
  *
  * AQE's skew-join handles moderate skew adaptively; explicit salting is
  * the deterministic tool for pathological keys known in advance. */
object Skew {

  /** Inner equi-join of `fact` and `dim` on `key`, salted `salts` ways.
    * The salt is derived from a hash of the fact row's full content, so
    * it needs no random state and spreads uniformly. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltCol: Column = pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(salts))
    val saltedFact = fact.withColumn("__salt", saltCol)
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
