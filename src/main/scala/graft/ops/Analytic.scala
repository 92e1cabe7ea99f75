package graft.ops

import graft.{Q => RQ}

/** Placeholder for the second relational batch (grouping sets variants,
  * sampling, sketches, as-of style joins). Filled in later rounds/commits. */
object Analytic {
  val all: Seq[RQ] = Seq.empty
}
