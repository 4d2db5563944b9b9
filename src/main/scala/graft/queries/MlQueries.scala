package graft.queries
import graft.Q
object MlQueries { def all: Seq[Q] = Seq() }
