package graft.ops

/** Placeholder registries — filled in as each module lands. */
object GraphOps { def all: Seq[Q] = Seq.empty }
