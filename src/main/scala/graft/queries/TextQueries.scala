package graft.queries
import graft.Q
object TextQueries { def all: Seq[Q] = Seq() }
