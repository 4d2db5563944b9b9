package graft.queries
import graft.Q
object SimilarityQueries { def all: Seq[Q] = Seq() }
