"""falcon_tpu: a TPU-native hierarchical genome assembler.

A from-scratch JAX/XLA/Pallas re-design of the FALCON (HGAP) hierarchical
assembly engine: raw long reads -> all-vs-all overlap -> multi-read error
corrected "preads" -> pread overlap -> string graph -> primary/alternate
contigs + GFA.

Layer map (TPU-first, cf. reference /root/reference layer map in SURVEY.md):

  io.readstore   packed 2-bit read database + fixed-size blocks
                 (replaces DAZZ_DB: fasta2DB/DBsplit/DBdust)
  ops.*          device + host compute kernels: k-mer seeding, banded O(ND)
                 difference alignment, consensus align-tag DP
                 (replaces src/c/{kmer_lookup,DW_banded,falcon}.c)
  overlap.*      block x block overlap engine + 3-stage overlap filter
                 (replaces daligner/LAsort/LAmerge/LA4Falcon + ovlp_filter)
  cns.*          seed-grouped consensus -> preads (replaces fc_consensus)
  graph.*        string graph, unitigs, contigs, GFA (exact-output
                 reimplementation of ovlp_to_graph/graph_to_contig/...)
  parallel.*     jax.sharding mesh plumbing for multi-chip runs
  pipeline.*     the fc_run-equivalent phase driver with artifact
                 checkpoint/resume
"""

__version__ = "0.1.0"
