"""Full tour-bus bubble popping (bubble.c tourBus:2347).

Synthetic contig graphs exercise what the bounded path-pair enumeration
could not: nested (multi-level) bubbles and deep bubble sides (more than
4 interior nodes).  Graphs are built directly in the ContigGraph
representation — directed edges with twins and mirrored arc dicts; each
edge's k-prefix is derived from its predecessor so junction k-mers are
shared (the invariant linear_concatenate checks).
"""

import numpy as np

from soapdenovo2_tpu.models import contig as cm

K = 5


def build_graph(payloads, arcs, cvg=None):
    """payloads[i] -> directed edges 2i (fwd) and 2i+1 (twin).

    Edge i's sequence is prefix + payload where prefix is its (first)
    predecessor's last K bases (zeros for sources); the twin is the
    reverse complement.  ``arcs`` holds (from, to, mult) on forward
    directed ids with logical ids increasing along arcs; twin mirrors are
    added with equal multiplicity (contig.from_pregraph convention).
    Converging branches must therefore end with identical last-K payload
    bases (keep SNPs out of the final K positions).
    """
    n = len(payloads)
    pred = {}
    for a, b, m in arcs:
        pred.setdefault(b // 2, a // 2)
    full = [None] * n
    for i, p in enumerate(payloads):
        p = np.asarray(p, np.uint8)
        j = pred.get(i)
        prefix = np.zeros(K, np.uint8) if j is None else full[j][-K:]
        full[i] = np.concatenate([prefix, p])
    seqs, twin = [], []
    for s in full:
        seqs.append(s)
        seqs.append((3 - s)[::-1].copy())
        twin += [len(twin) + 1, len(twin)]
    E = len(seqs)
    g = cm.ContigGraph(
        k=K,
        seqs=seqs,
        cvg10=(np.full(E, 100, np.int32) if cvg is None
               else np.asarray(cvg, np.int32)),
        twin=np.asarray(twin, np.int64),
        deleted=np.zeros(E, bool),
        arcs=[dict() for _ in range(E)],
    )
    for a, b, m in arcs:
        g.arcs[a][b] = m
        ta, tb = int(g.twin[a]), int(g.twin[b])
        if (tb, ta) != (a, b):
            g.arcs[tb][ta] = m
    return g


def pay(rng, n):
    return rng.integers(0, 4, size=n).astype(np.uint8)


def snp(p, pos):
    q = np.asarray(p, np.uint8).copy()
    q[pos] = (q[pos] + 1) % 4
    return q


def live_undirected(g):
    return sum(
        1
        for e in range(g.n_edges)
        if not g.deleted[e] and (int(g.twin[e]) >= e or g.deleted[g.twin[e]])
    )


def test_simple_snp_bubble(rng):
    w = pay(rng, 10)
    # A(0) -> B1(2)/B2(4) -> C(6); SNP at 4 (outside the last-K tail)
    g = build_graph(
        [pay(rng, 10), w, snp(w, 4), pay(rng, 10)],
        [(0, 2, 4), (0, 4, 2), (2, 6, 4), (4, 6, 2)],
    )
    merged = cm.tour_bus(g)
    assert merged == 1
    assert g.deleted[4] and g.deleted[5]
    assert not g.deleted[2]
    assert g.arcs[0].get(2) == 6  # A->B2 multiplicity folded onto A->B1
    assert 4 not in g.arcs[0]
    assert g.arcs[2].get(6) == 6
    # coverage folded (combineCOV: (10*100 + 10*100)//10 = 200)
    assert g.cvg10[2] == 200
    # SNP recorded for .bubbleSNP
    assert len(g.bubbles) == 1
    cm.linear_concatenate(g)
    assert live_undirected(g) == 1


def test_three_level_nested_bubble(rng):
    """Nested bubbles at three levels all collapse (the DFibHeap tour-bus
    case the depth-bounded enumeration missed)."""
    m1, m2 = pay(rng, 10), pay(rng, 10)
    n1, n2 = pay(rng, 3), pay(rng, 3)
    w = pay(rng, 10)
    chain_inner = np.concatenate([n1, w, n2])  # 16
    b = snp(chain_inner, 8)  # mid alternative; SNP outside tails
    outer_chain = np.concatenate([m1, b, m2])  # 36
    o = snp(outer_chain, 18)  # outer alternative
    # logical: A=0 O=2 M1=4 B=6 M2=8 N1=10 W1=12 W2=14 N2=16 C=18
    g = build_graph(
        [pay(rng, 10), o, m1, b, m2, n1, w, snp(w, 4), n2, pay(rng, 10)],
        [
            (0, 4, 6), (4, 6, 3), (6, 8, 3), (8, 18, 6),  # A->M1->B->M2->C
            (0, 2, 1), (2, 18, 1),                 # A->O->C
            (4, 10, 3), (10, 12, 2), (10, 14, 1),  # M1->N1->{W1,W2}
            (12, 16, 2), (14, 16, 1), (16, 8, 3),  # ->N2->M2
        ],
    )
    merged = cm.tour_bus(g, M=3)
    assert merged >= 3
    cm.linear_concatenate(g)
    # everything collapsed into one path A..C
    assert live_undirected(g) == 1


def test_deep_bubble_side_beyond_depth4(rng):
    """A bubble side with 6 interior nodes merges at M=3 (MAXNODELENGTH=30)
    — deeper than the old bounded-DFS max_depth of 4."""
    parts = [pay(rng, 5) for _ in range(6)]
    alt = snp(np.concatenate(parts), 13)  # 30 bases, 1 SNP mid-chain
    # A=0 alt=2 chain c1..c6 = 4,6,8,10,12,14 C=16
    arcs = [(0, 4, 4)]
    for i in range(5):
        arcs.append((4 + 2 * i, 6 + 2 * i, 4))
    arcs.append((14, 16, 4))
    arcs += [(0, 2, 1), (2, 16, 1)]
    g = build_graph([pay(rng, 10), alt] + parts + [pay(rng, 10)], arcs)
    merged = cm.tour_bus(g, M=3)
    assert merged >= 1
    assert g.deleted[2] and g.deleted[3]
    cm.linear_concatenate(g)
    assert live_undirected(g) == 1
    # at M=1 the same bubble is rejected (path longer than MAXNODELENGTH=3)
    g2 = build_graph([pay(rng, 10), alt] + parts + [pay(rng, 10)], arcs)
    assert cm.tour_bus(g2, M=1) == 0


def test_shared_repeat_edge_survives(rng):
    """A slow-path node shared with the fast path is never deleted; its
    arcs and the traversal survive (the read-interval-remap guarantee,
    expressed as node sharing)."""
    shared = pay(rng, 8)
    f1, f2 = pay(rng, 10), pay(rng, 10)
    g1s, g2s = snp(f1, 2), snp(f2, 2)
    # fast: A -> F1 -> S -> F2 -> C ; slow: A -> G1 -> S -> G2 -> C
    # A=0 F1=2 S=4 F2=6 G1=8 G2=10 C=12
    g = build_graph(
        [pay(rng, 10), f1, shared, f2, g1s, g2s, pay(rng, 10)],
        [
            (0, 2, 4), (2, 4, 4), (4, 6, 4), (6, 12, 4),
            (0, 8, 2), (8, 4, 2), (4, 10, 2), (10, 12, 2),
        ],
    )
    merged = cm.tour_bus(g, M=3)
    assert merged >= 1
    assert not g.deleted[4]  # shared node survives
    cm.linear_concatenate(g)
    assert live_undirected(g) == 1


def test_dissimilar_paths_not_merged(rng):
    b1 = pay(rng, 10)
    b2 = b1.copy()
    for pos in (1, 3, 5, 7):  # 4 SNPs -> similarity 0.6
        b2 = snp(b2, pos)
    g = build_graph(
        [pay(rng, 10), b1, b2, pay(rng, 10)],
        [(0, 2, 4), (0, 4, 2), (2, 6, 4), (4, 6, 2)],
    )
    assert cm.tour_bus(g) == 0
    assert not g.deleted[2] and not g.deleted[4]


def test_arc_filter_blocks_weak_linearization(rng):
    """contig -e (concatenateEdge.c:317): links with arc weight <= e are
    not merged through."""
    g = build_graph(
        [pay(rng, 10), pay(rng, 10), pay(rng, 10)],
        [(0, 2, 1), (2, 4, 5)],
    )
    g2 = build_graph(
        [pay(rng, 10), pay(rng, 10), pay(rng, 10)],
        [(0, 2, 1), (2, 4, 5)],
    )
    assert cm.linear_concatenate(g) == 2  # no filter: full chain merges
    assert cm.linear_concatenate(g2, arc_filter=1) == 1  # weak link kept
    assert live_undirected(g) == 1
    assert live_undirected(g2) == 2
