package graft.queries
import graft.Q
object DedupQueries { def all: Seq[Q] = Seq() }
