package graft.queries
import graft.Q
object EventQueries { def all: Seq[Q] = Seq() }
