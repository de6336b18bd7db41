package graft.operators
import graft.Q
/** Placeholder — filled in this round. */
object Dedup { val entries: Seq[Q] = Seq() }
