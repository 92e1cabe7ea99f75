package graft.multimodal

import graft.{Q => RQ}

/** Multimodal binary-column plumbing (filled in a later commit): opaque
  * binary payloads + typed metadata, decode/feature-extract stubs with
  * real Spark-side schema/partitioning. */
object MultimodalOps {
  val all: Seq[RQ] = Seq.empty
}
