package graft.ops

import graft.core.QueryDef

/** Multimodal (binary payload) column plumbing. Filled incrementally. */
object Multimodal {
  val all: Seq[QueryDef] = Seq()
}
