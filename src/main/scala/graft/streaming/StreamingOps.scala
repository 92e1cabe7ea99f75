package graft.streaming

import graft.{Q => RQ}

/** Structured Streaming surface over the events table (filled in a later
  * commit): windowed aggregation with watermarks, sessionization,
  * mapGroupsWithState — run with Trigger.AvailableNow so Verify treats
  * them as batch. */
object StreamingOps {
  val all: Seq[RQ] = Seq.empty
}
