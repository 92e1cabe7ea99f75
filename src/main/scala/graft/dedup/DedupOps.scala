package graft.dedup

import graft.{Q => RQ}

/** Deduplication surface (filled in next commit): exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup. */
object DedupOps {
  val all: Seq[RQ] = Seq.empty
}
