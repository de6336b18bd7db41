package graft.operators
import graft.Q
/** Placeholder — filled in this round. */
object Similarity { val entries: Seq[Q] = Seq() }
