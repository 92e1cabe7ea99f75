package graft.sim

import graft.{Q => RQ}

/** Similarity-search surface over the embeddings table (filled in next
  * commit): brute-force cosine top-k, LSH-bucketed ANN. */
object SimilarityOps {
  val all: Seq[RQ] = Seq.empty
}
