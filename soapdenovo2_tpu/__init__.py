"""soapdenovo2_tpu — a TPU-native de novo genome assembler.

A brand-new JAX/XLA/Pallas implementation of the SOAPdenovo2 assembly
pipeline (pregraph -> contig -> map -> scaff, plus sparse-pregraph and
fusion paths), designed TPU-first:

- k-mers are W x uint32 multiword registers (k <= 15/31/63/127), extracted
  by rolling-scan kernels over 2-bit packed read batches;
- the k-mer "hash table" is a sorted flat array; counting is sort +
  segment-reduce (deterministic, collision-free by construction), sharded
  across devices by k-mer hash via all-to-all collectives;
- graph simplification (tip clipping, low-coverage pruning, chain
  contraction) runs as iterative masked vector passes + pointer jumping
  over flat arrays;
- the small, inherently sequential scaffold-ordering logic runs host-side
  over device-produced bulk link tables.

Reference behavior: aquaskyline/SOAPdenovo2 (see SURVEY.md for the layer
map and file:line citations).
"""

__version__ = "0.1.0"
