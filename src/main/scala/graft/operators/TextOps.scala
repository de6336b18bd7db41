package graft.operators
import graft.Q
/** Placeholder — filled in this round. */
object TextOps { val entries: Seq[Q] = Seq() }
