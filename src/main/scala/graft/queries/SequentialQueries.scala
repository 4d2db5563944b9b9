package graft.queries
import graft.Q
object SequentialQueries { def all: Seq[Q] = Seq() }
