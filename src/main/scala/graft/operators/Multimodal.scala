package graft.operators
import graft.Q
/** Placeholder — filled in this round. */
object Multimodal { val entries: Seq[Q] = Seq() }
