package graft.ops

/** Placeholder registries — filled in as each module lands. */
object TextAnalysis { def all: Seq[Q] = Seq.empty }
object Dedup { def all: Seq[Q] = Seq.empty }
object Similarity { def all: Seq[Q] = Seq.empty }
object GraphOps { def all: Seq[Q] = Seq.empty }
object Multimodal { def all: Seq[Q] = Seq.empty }
