"""Edge (unitig) construction from the pruned k-mer graph.

TPU-native replacement for standardPregraph/node2edge.c (``kmer2edges:61``,
``make_edge:366``, ``stringBeads:86``): instead of walking chains with
stacks, all maximal linear chains are labeled at once by pointer doubling
(ops/chains.py) and edge sequences are materialized with one scatter.

Directed-edge model: every unitig appears as TWO directed edges (the edge
and its reverse-complement twin), mirroring the reference's in-memory
edge/bal_edge pairing after loadEdge.  A directed edge e:

    node path:  n0 (branch, orient o0) -> n1..nm (linear) -> n_t (branch)
    sequence:   oriented_kmer(n0) followed by seq[0..m] where seq[r] is the
                last base of the r-th subsequent oriented k-mer
                (so len(seq) == m+1, matching the reference's edge->length)

Interior linear k-mers are annotated with (edge id, rank) per traversal
state — the analog of ``set_kmer_edge_id`` (node2edge.c:516) — and
length-1 edges get a (k+1)-mer patch entry (the reference's KmerSetsPatch
longNode, node2edge.c:480-545) so the read->edge pass can see them.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kmer as kops
from ..ops import sortcount as sc
from . import kmer_graph as kg


@dataclasses.dataclass
class EdgeGraph:
    """Flat directed-edge arrays (host numpy; device jobs re-upload views)."""

    k: int
    n_edges: int
    # ragged sequences: bases appended after the first k-mer
    seq_off: np.ndarray  # (E+1,) int64
    seq_bases: np.ndarray  # (total,) uint8
    first_kmer: np.ndarray  # (E, W) uint32 — oriented k-mer of the from-node
    from_node: np.ndarray  # (E,) int32 k-mer table index
    from_orient: np.ndarray  # (E,) int8
    to_node: np.ndarray  # (E,) int32 (== from_node for circular edges)
    to_orient: np.ndarray  # (E,) int8
    cvg10: np.ndarray  # (E,) int32 — 10x mean interior left-coverage
    twin: np.ndarray  # (E,) int32 — reverse-complement edge id (self if palindrome)
    is_cycle: np.ndarray  # (E,) bool
    # per-kmer-state annotations for the read->edge pass
    state_edge: np.ndarray  # (2C,) int32 — edge id of interior states, -1
    state_rank: np.ndarray  # (2C,) int32
    # (k+1)-mer patch for length-1 edges
    patch_keys: np.ndarray  # (P, W1) uint32 sorted canonical (k+1)-mers
    patch_edge: np.ndarray  # (P,) int32 — edge for the canonical orientation
    patch_twin: np.ndarray  # (P,) int32 — edge for the flipped orientation

    def n_bases(self, e) -> np.ndarray:
        return self.seq_off[e + 1] - self.seq_off[e]

    def edge_length(self, e) -> np.ndarray:
        """Reference edge->length: bases beyond the first k-mer."""
        return self.n_bases(e)

    def full_length(self, e) -> np.ndarray:
        return self.k + self.n_bases(e)

    def edge_string(self, e: int) -> str:
        """Full base string (first k-mer + appended bases)."""
        head = kops.kmer_to_string(self.first_kmer[e], self.k)
        tail = "".join("ACGT"[b] for b in self.seq_bases[self.seq_off[e] : self.seq_off[e + 1]])
        return head + tail


def _oriented_last_base(words, orient, k: int):
    """Last base of a state's oriented k-mer."""
    lb = kops.last_base(words).astype(jnp.int32)
    fb = kops.first_base(words, k).astype(jnp.int32)
    return jnp.where(orient == 0, lb, 3 - fb).astype(jnp.uint8)


def _oriented_first_base(words, orient, k: int):
    fb = kops.first_base(words, k).astype(jnp.int32)
    lb = kops.last_base(words).astype(jnp.int32)
    return jnp.where(orient == 0, fb, 3 - lb).astype(jnp.uint8)


def build_edges(g: kg.PreGraph, k: int) -> EdgeGraph:
    """Contract all linear chains into directed edges."""
    g = kg.refresh_links(g, k)
    labels, _ = kg.label_linear_chains(g, k)

    C = g.keys.shape[0]
    S = 2 * C
    covs = np.asarray(g.covs, dtype=np.int64)
    deleted = np.asarray(g.deleted)
    linear = np.asarray(g.linear)
    keys_np = np.asarray(g.keys)

    head = np.asarray(labels.head)
    rank = np.asarray(labels.rank)
    length = np.asarray(labels.length)
    attach = np.asarray(labels.attach)
    is_cycle_state = np.asarray(labels.is_cycle)
    is_head = np.asarray(labels.is_head)
    on_chain = np.asarray(labels.on_chain)

    # ------------------------------------------------------------------
    # enumerate starts: (branch node, orient, exit base) with side cov > 0
    # ------------------------------------------------------------------
    branch = (~deleted) & (~linear)
    right_cov = covs[:, 4:8] > 0  # orient 0 exits
    left_cov = covs[:, 0:4] > 0  # orient 1 exits via comp(base)
    start_mask = np.zeros((C, 2, 4), dtype=bool)
    start_mask[:, 0, :] = branch[:, None] & right_cov
    # orientation-1 exit with base b corresponds to left cov of comp(b)
    start_mask[:, 1, :] = branch[:, None] & left_cov[:, ::-1]
    s_node, s_orient, s_base = np.nonzero(start_mask)
    s_node = s_node.astype(np.int32)
    s_orient = s_orient.astype(np.int32)
    s_base = s_base.astype(np.int32)
    nstarts = s_node.shape[0]

    # first hop of every start (device batch)
    if nstarts:
        j, oj = kg.next_of(
            g,
            jnp.asarray(s_node),
            jnp.asarray(s_orient),
            jnp.asarray(s_base, dtype=jnp.uint32),
            k,
        )
        j = np.asarray(j)
        oj = np.asarray(oj)
    else:
        j = np.zeros((0,), np.int32)
        oj = np.zeros((0,), np.int32)
    ok = j >= 0
    if not ok.all():
        # should not happen after refresh_links; drop defensively
        s_node, s_orient, s_base, j, oj = (
            a[ok] for a in (s_node, s_orient, s_base, j, oj)
        )
        nstarts = s_node.shape[0]
    first_state = j * 2 + oj

    target_linear = linear[j] & ~deleted[j]
    # chain-entering starts: first hop is a chain head
    chain_start = target_linear & on_chain[np.clip(first_state, 0, S - 1)]
    direct = ~chain_start

    ch_head = np.where(chain_start, first_state, -1)
    ch_len = np.where(chain_start, length[np.clip(ch_head, 0, S - 1)], 0)
    ch_attach = np.where(chain_start, attach[np.clip(ch_head, 0, S - 1)], -1)
    # terminal state: attach for chains, first hop for direct edges
    term_state = np.where(chain_start, ch_attach, first_state)
    dangling = term_state < 0  # possible only if graph is inconsistent
    if dangling.any():
        keep = ~dangling
        (s_node, s_orient, s_base, first_state, chain_start, ch_head, ch_len,
         term_state) = (
            a[keep]
            for a in (s_node, s_orient, s_base, first_state, chain_start,
                      ch_head, ch_len, term_state)
        )
        nstarts = s_node.shape[0]

    # ------------------------------------------------------------------
    # cycles: two mirrored circular edges per isolated loop
    # ------------------------------------------------------------------
    cyc_heads = np.nonzero(is_cycle_state & is_head)[0].astype(np.int32)
    ncyc = cyc_heads.shape[0]

    E = nstarts + ncyc
    edge_from = np.empty((E,), np.int32)
    edge_from_orient = np.empty((E,), np.int8)
    edge_to = np.empty((E,), np.int32)
    edge_to_orient = np.empty((E,), np.int8)
    edge_chain_head = np.full((E,), -1, np.int32)
    edge_len = np.empty((E,), np.int64)  # appended bases
    edge_cycle = np.zeros((E,), bool)

    edge_from[:nstarts] = s_node
    edge_from_orient[:nstarts] = s_orient
    edge_to[:nstarts] = term_state >> 1
    edge_to_orient[:nstarts] = term_state & 1
    edge_chain_head[:nstarts] = np.where(chain_start, ch_head, -1)
    edge_len[:nstarts] = np.where(chain_start, ch_len + 1, 1)

    if ncyc:
        edge_from[nstarts:] = cyc_heads >> 1
        edge_from_orient[nstarts:] = cyc_heads & 1
        edge_to[nstarts:] = cyc_heads >> 1
        edge_to_orient[nstarts:] = cyc_heads & 1
        edge_chain_head[nstarts:] = cyc_heads
        edge_len[nstarts:] = length[cyc_heads]  # one base per member state
        edge_cycle[nstarts:] = True

    # map chain head -> edge id (each head is entered by exactly one start)
    head_to_edge = np.full((S,), -1, np.int32)
    hs = edge_chain_head >= 0
    head_to_edge[edge_chain_head[hs]] = np.nonzero(hs)[0].astype(np.int32)

    # per-state annotations (interior k-mers)
    state_edge = np.full((S,), -1, np.int32)
    state_rank = np.zeros((S,), np.int32)
    chn = on_chain & (head_to_edge[np.clip(head, 0, S - 1)] >= 0)
    state_edge[chn] = head_to_edge[head[chn]]
    state_rank[chn] = rank[chn]

    # ------------------------------------------------------------------
    # sequence materialization
    # ------------------------------------------------------------------
    seq_off = np.zeros((E + 1,), np.int64)
    np.cumsum(edge_len, out=seq_off[1:])
    seq_bases = np.full((int(seq_off[-1]),), 255, np.uint8)

    # contribution of every interior chain state: its oriented last base
    sidx = np.nonzero(chn)[0].astype(np.int32)
    if sidx.size:
        words = jnp.asarray(keys_np[sidx >> 1])
        orient = jnp.asarray((sidx & 1).astype(np.int32))
        bases = np.asarray(_oriented_last_base(words, orient, k))
        e_of = state_edge[sidx]
        # cycles: rank 0 state is the from-kmer itself, its base goes LAST
        cyc_of = edge_cycle[e_of]
        pos = np.where(
            cyc_of,
            (state_rank[sidx] - 1) % np.maximum(edge_len[e_of], 1),
            state_rank[sidx],
        )
        seq_bases[seq_off[e_of] + pos] = bases

    # terminal base of non-cycle edges: oriented last base of the to-state
    noncyc = np.nonzero(~edge_cycle)[0]
    if noncyc.size:
        words = jnp.asarray(keys_np[edge_to[noncyc]])
        orient = jnp.asarray(edge_to_orient[noncyc].astype(np.int32))
        tbases = np.asarray(_oriented_last_base(words, orient, k))
        seq_bases[seq_off[noncyc] + edge_len[noncyc] - 1] = tbases

    # oriented first k-mers
    fwords = jnp.asarray(keys_np[edge_from])
    forient = jnp.asarray(edge_from_orient.astype(np.int32))
    fk = kops.reverse_complement(fwords, k)
    first_kmer = np.asarray(
        jnp.where((forient == 1)[:, None], fk, fwords), dtype=np.uint32
    )

    # ------------------------------------------------------------------
    # coverage: 10 * sum(interior left covs) / n_interior (make_edge:586)
    # ------------------------------------------------------------------
    left_tot = covs[:, 0:4].sum(axis=1)
    symbol = np.zeros((E,), np.int64)
    if sidx.size:
        np.add.at(symbol, state_edge[sidx], left_tot[sidx >> 1])
    n_interior = np.where(edge_cycle, edge_len, edge_len - 1)
    cvg10 = np.zeros((E,), np.int32)
    nz = n_interior > 0
    cvg10[nz] = np.minimum(symbol[nz] // n_interior[nz] * 10, 16000).astype(np.int32)

    # ------------------------------------------------------------------
    # twin pairing
    # ------------------------------------------------------------------
    # start triple of the twin: (to_node, flip(to_orient), comp(first base of
    # the last k-mer before the to-node, oriented))
    twin = np.full((E,), -1, np.int32)
    if nstarts:
        # previous state: chain tail if chain else the from-state
        tail_state = np.full((nstarts,), -1, np.int32)
        cs = np.nonzero(chain_start)[0]
        if cs.size:
            # tail of a chain: state with rank == len-1; recover via scatter
            tail_of_head = np.full((S,), -1, np.int32)
            t_mask = on_chain & (rank == length[np.clip(head, 0, S - 1)] - 1)
            tail_of_head[head[t_mask]] = np.nonzero(t_mask)[0].astype(np.int32)
            tail_state[cs] = tail_of_head[edge_chain_head[cs]]
        ds = np.nonzero(~chain_start[:nstarts])[0]
        tail_state[ds] = s_node[ds] * 2 + s_orient[ds]

        pw = jnp.asarray(keys_np[tail_state >> 1])
        po = jnp.asarray((tail_state & 1).astype(np.int32))
        pfirst = np.asarray(_oriented_first_base(pw, po, k)).astype(np.int32)
        tb = 3 - pfirst  # comp
        tnode = edge_to[:nstarts]
        torient = 1 - edge_to_orient[:nstarts].astype(np.int32)
        start_id = np.full((C, 2, 4), -1, np.int32)
        start_id[s_node, s_orient, s_base] = np.arange(nstarts, dtype=np.int32)
        twin[:nstarts] = start_id[tnode, torient, tb]
    if ncyc:
        # mirrored cycle: head of the flipped state's chain
        mirror_head = head[cyc_heads ^ 1]
        twin[nstarts:] = head_to_edge[np.clip(mirror_head, 0, S - 1)]

    # ------------------------------------------------------------------
    # (k+1)-mer patch for length-1 edges
    # ------------------------------------------------------------------
    short = np.nonzero((edge_len == 1) & ~edge_cycle)[0].astype(np.int32)
    w1 = kops.num_words(k + 1) if k + 1 <= 128 else None
    if short.size:
        base1 = jnp.asarray(seq_bases[seq_off[short]].astype(np.uint32))
        fk1 = jnp.asarray(first_kmer[short])
        # (k+1)-mer = first k-mer + the single appended base; widen register
        wide = _widen_kmer(fk1, k)
        plus = kops.shift_left_append(wide, base1, k + 1)
        rcp = kops.reverse_complement(plus, k + 1)
        canon, is_rc = kops.canonical(plus, rcp)
        canon = np.asarray(canon)
        is_rc = np.asarray(is_rc)
        # canonical orientation's edge: this edge if not flipped else twin
        ecan = np.where(is_rc, twin[short], short)
        etwn = np.where(is_rc, short, twin[short])
        # dedupe (each pair appears twice; palindromes once per direction)
        order = np.lexsort(tuple(canon[:, i] for i in range(canon.shape[1] - 1, -1, -1)))
        canon, ecan, etwn = canon[order], ecan[order], etwn[order]
        newk = np.ones((canon.shape[0],), bool)
        newk[1:] = (canon[1:] != canon[:-1]).any(axis=1)
        patch_keys = canon[newk]
        patch_edge = ecan[newk].astype(np.int32)
        patch_twin = etwn[newk].astype(np.int32)
    else:
        patch_keys = np.zeros((0, kops.num_words(k + 1)), np.uint32)
        patch_edge = np.zeros((0,), np.int32)
        patch_twin = np.zeros((0,), np.int32)

    return EdgeGraph(
        k=k,
        n_edges=E,
        seq_off=seq_off,
        seq_bases=seq_bases,
        first_kmer=first_kmer,
        from_node=edge_from,
        from_orient=edge_from_orient,
        to_node=edge_to,
        to_orient=edge_to_orient,
        cvg10=cvg10,
        twin=twin,
        is_cycle=edge_cycle,
        state_edge=state_edge,
        state_rank=state_rank,
        patch_keys=patch_keys,
        patch_edge=patch_edge,
        patch_twin=patch_twin,
    )


def _widen_kmer(words, k: int):
    """Re-align a k-mer register into the (k+1)-mer word width (value copy)."""
    w_old = kops.num_words(k)
    w_new = kops.num_words(k + 1)
    if w_new == w_old:
        return words
    pad = jnp.zeros(words.shape[:-1] + (w_new - w_old,), jnp.uint32)
    return jnp.concatenate([pad, words], axis=-1)
