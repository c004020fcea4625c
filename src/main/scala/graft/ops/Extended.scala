package graft.ops

import graft.core.QueryDef

/** LLM-training-data pipeline operators over `documents` / `embeddings`
  * (builder brief; SURVEY.md §7 planned this as Extended.scala).
  * Filled incrementally — see the individual QueryDefs.
  */
object Extended {
  val all: Seq[QueryDef] = Seq()
}
