package graft.text

import graft.{Q => RQ}

/** Text-analysis surface over the documents table (filled in next commit):
  * tokenization, quality scoring, language ID, fingerprinting. */
object TextOps {
  val all: Seq[RQ] = Seq.empty
}
