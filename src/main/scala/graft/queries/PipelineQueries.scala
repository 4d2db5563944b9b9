package graft.queries
import graft.Q
object PipelineQueries { def all: Seq[Q] = Seq() }
