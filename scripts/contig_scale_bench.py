"""Scale check: clean + linearize a synthetic ~1M-directed-edge graph.

VERDICT r1 Weak #2: the contig-stage passes must handle human-genome
edge counts (millions) in seconds, like the reference's C passes
(cutTip_graph.c / concatenateEdge.c).  Builds a graph of many chains
with branch junctions and weak tips, then times each pass.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from soapdenovo2_tpu.models import contig as cm


def synth_graph(n_chains: int, chain_len: int, k: int = 31, seed: int = 0):
    """Chains of `chain_len` undirected edges joined at branch nodes,
    with a weak tip hanging off every junction."""
    rng = np.random.default_rng(seed)
    E = 0
    seqs = []
    twin = []
    arcs = []
    cvg = []

    def add_edge(length, seq=None):
        nonlocal E, twin, cvg
        e, t = E, E + 1
        s = (
            seq
            if seq is not None
            else rng.integers(0, 4, size=(k + length,)).astype(np.uint8)
        )
        seqs.append(s)
        seqs.append(3 - s[::-1])
        twin += [t, e]
        arcs.append({})
        arcs.append({})
        cvg += [300, 300]
        E += 2
        return e

    def link(a, b, m):
        arcs[a][b] = m
        ta, tb = twin[a], twin[b]
        arcs[tb][ta] = m

    for c in range(n_chains):
        # one long sequence sliced into k-overlapping edge windows so the
        # junction-kmer sanity check of linear_concatenate holds
        lens = rng.integers(20, 60, size=chain_len)
        total = k + int(lens.sum())
        big = rng.integers(0, 4, size=(total,)).astype(np.uint8)
        prev = None
        off = 0
        for i in range(chain_len):
            L = int(lens[i])
            e = add_edge(L, seq=big[off : off + k + L])
            off += L
            if prev is not None:
                link(prev, e, 5)
            prev = e
        # a weak tip + a branch edge at the chain end
        tip = add_edge(4)
        link(prev, tip, 1)
        br = add_edge(30)
        link(prev, br, 6)

    g = cm.ContigGraph(
        k=k,
        seqs=seqs,
        cvg10=np.array(cvg, np.int32),
        twin=np.array(twin, np.int32),
        deleted=np.zeros((E,), bool),
        arcs=arcs,
    )
    return g


def main():
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    chain_len = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    t0 = time.time()
    g = synth_graph(n_chains, chain_len)
    print(f"build: {g.n_edges} directed edges in {time.time()-t0:.1f}s")

    t0 = time.time()
    n = cm.remove_weak_edges(g, 2 * g.k, 1)
    print(f"remove_weak_edges: {n} removed in {time.time()-t0:.1f}s")

    t0 = time.time()
    n = cm.cut_tips_in_graph(g)
    print(f"cut_tips: {n} removed in {time.time()-t0:.1f}s")

    t0 = time.time()
    n = cm.linear_concatenate(g)
    print(f"linear_concatenate: {n} merges in {time.time()-t0:.1f}s")

    live = int((~g.deleted).sum())
    print(f"live edges after: {live}")


if __name__ == "__main__":
    main()
