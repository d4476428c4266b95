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
import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import chains as chain_ops
from ..ops import kmer as kops
from ..ops import sortcount as sc
from . import kmer_graph as kg

log = logging.getLogger("soapdenovo2_tpu.edges")


def _interleave_1d(a, b):
    """[a0, b0, a1, b1, ...] with 1-D ops only: a (C, 2) stack/reshape
    materializes an (8,128)-tiled temp whose minor-dim padding is 64x —
    32 GB at a 64M-row table (the 50 Mb OOM)."""
    c = a.shape[0]
    comb = jnp.concatenate([a, b])
    sidx = jnp.arange(2 * c, dtype=jnp.int32)
    return comb[(sidx >> 1) + (sidx & 1) * c]


def _expand2_1d(a):
    """jnp.repeat(a, 2) without the (C, 2) broadcast intermediate."""
    sidx = jnp.arange(2 * a.shape[0], dtype=jnp.int32)
    return a[sidx >> 1]


def _pack_bits_dev(mask):
    """(N,) bool -> (ceil(N/32),) uint32, little-bit order (device)."""
    n = mask.shape[0]
    pad = (-n) % 32
    if pad:
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    b = mask.reshape(-1, 32).astype(jnp.uint32)
    return jnp.sum(b << jnp.arange(32, dtype=jnp.uint32)[None, :], axis=1,
                   dtype=jnp.uint32)


def _unpack_bits_np(packed: np.ndarray, n: int) -> np.ndarray:
    bits = (packed[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    return bits.reshape(-1)[:n].astype(bool)


def _next_pow2(x: int, lo: int = 64) -> int:
    return max(lo, 1 << (max(x, 1) - 1).bit_length())


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


@functools.partial(jax.jit, static_argnames=("k", "psteps", "pshift"))
def _edges_refresh(g: kg.PreGraph, k: int, pdir, psteps: int, pshift: int):
    return kg.refresh_links(g, k, pdir, psteps, pshift)


SUCC_CHUNK = 1 << 24  # nodes per successor-sweep program


@functools.partial(jax.jit, static_argnames=(
    "k", "psteps", "pshift", "orient", "rows"))
def _edges_succ_chunk(g: kg.PreGraph, k: int, pdir, psteps: int,
                      pshift: int, orient: int, start, rows: int):
    """Successor state for ONE orientation of a ``rows``-node slice.

    Split per orientation AND chunked: the fused whole-table program's
    live set (oriented-kmer registers, canonical pairs, the bisection
    gathers) peaked at 34 GB against a 64M-row table at 50 Mb scale —
    chunking bounds it at chunk/table ratio."""
    w = g.keys.shape[1]
    keys_c = jax.lax.dynamic_slice(g.keys, (start, 0), (rows, w))
    covs_c = jax.lax.dynamic_slice(g.covs, (start, 0),
                                   (rows, g.covs.shape[1]))
    lin_c = jax.lax.dynamic_slice(g.linear, (start,), (rows,))
    del_c = jax.lax.dynamic_slice(g.deleted, (start,), (rows,))
    if orient == 0:
        base = kg._unique_base(covs_c[:, 4:8])
        cur = keys_c
    else:
        base = (3 - kg._unique_base(covs_c[:, 0:4])) & 3
        cur = kops.reverse_complement(keys_c, k)
    nxt = kops.shift_left_append(cur, base, k)
    rc = kops.reverse_complement(nxt, k)
    canon, is_rc = kops.canonical(nxt, rc)
    if pdir is not None:
        j = sc.lookup_kmers_dir(g.keys, canon, pdir, psteps, pshift)
    else:
        j = sc.lookup_kmers(g.keys, canon)
    j = jnp.where((j >= 0) & ~g.deleted[jnp.maximum(j, 0)], j, -1)
    oj = is_rc.astype(jnp.int32)
    return jnp.where(lin_c & ~del_c & (j >= 0), j * 2 + oj, -1)


def _edges_successors(g: kg.PreGraph, k: int, pdir, psteps: int,
                      pshift: int):
    c = g.keys.shape[0]
    chunk = min(c, SUCC_CHUNK)
    halves = []
    for orient in (0, 1):
        parts = []
        for start in range(0, c, chunk):
            rows = min(chunk, c - start)
            s = _edges_succ_chunk(g, k, pdir, psteps, pshift, orient,
                                  jnp.int32(start), rows)
            jax.block_until_ready(s)  # serialize program memory
            parts.append(s)
        halves.append(parts[0] if len(parts) == 1
                      else jnp.concatenate(parts))
    on_chain, nxt = _succ_combine(g.linear, g.deleted, halves[0],
                                  halves[1])
    return on_chain, nxt


@jax.jit
def _succ_combine(linear, deleted, s0, s1):
    on_chain = _expand2_1d(linear & ~deleted)
    nxt = jnp.where(on_chain, _interleave_1d(s0, s1), -1)
    return on_chain, nxt


def _edges_chain_inputs(g: kg.PreGraph, k: int):
    """Successor states for chain labeling, staged device programs with a
    prefix directory shortening every lookup's gather chain.

    The refresh_links pass (8 full-table neighbor lookups, ~30 s at 16M
    nodes) is SKIPPED by default: a cov>0 entry's neighbor window always
    exists at table-build time (the adjacency was observed in a read, so
    the neighbor k-mer was extracted from that same read), and every
    deletion pass maintains symmetric dislinks (de_low_cov zeroes the
    pair on both sides — equal counts, equal 63-saturation — and tip
    clipping dislinks/deletes the out node explicitly).  Successor
    lookups still verify existence per hop (next_of returns -1), so a
    violation degrades to a chain break, not corruption.  Set
    SOAP_TPU_REFRESH_LINKS=1 to restore the full pass."""
    import os

    pdir, psteps, pshift = sc.build_prefix_dir_device(g.keys, k)
    if os.environ.get("SOAP_TPU_REFRESH_LINKS", "0") == "1":
        g = _edges_refresh(g, k, pdir, psteps, pshift)
        jax.block_until_ready(g.covs)
    else:
        g = kg.mark_linear(g)
    on_chain, nxt = _edges_successors(g, k, pdir, psteps, pshift)
    return g, on_chain, nxt


@functools.partial(jax.jit, static_argnames=("col",))
def _edges_start_col(g: kg.PreGraph, col: int):
    """Bit-packed (branch & covs[:, col] > 0) — one (C,)-sized program
    per cov column.  The former single program materialized (8C,)-sized
    iota/gather temps (2 GB each at a 64M-row table) beside the resident
    graph."""
    branch = (~g.deleted) & (~g.linear)
    return _pack_bits_dev(branch & (g.covs[:, col] > 0))


@jax.jit
def _edges_cyc_mask(cyc_head):
    return _pack_bits_dev(cyc_head)


def _edges_masks(g: kg.PreGraph, cyc_head):
    """Bit-packed start/cycle masks; the start mask is assembled on the
    HOST from eight per-column packed downloads (8 x C/8 bytes), never
    materializing an (8C,)-sized device array."""
    c = g.keys.shape[0]
    cols_np = []
    for o in range(2):
        for b in range(4):
            col = 4 + b if o == 0 else 3 - b  # left block is reversed
            packed = _edges_start_col(g, col)
            cols_np.append(_unpack_bits_np(np.asarray(packed), c))
    flat = np.zeros((8 * c,), bool)
    i = 0
    for o in range(2):
        for b in range(4):
            flat[o * 4 + b :: 8] = cols_np[i]
            i += 1
    cyc_packed = _edges_cyc_mask(cyc_head)
    return flat, cyc_packed


def _edges_phase1(g: kg.PreGraph, k: int):
    """Phase 1, staged on the host: chain inputs -> label pass (rare
    cycle branch on host, see chains.label_chains_host) -> packed masks.
    Only BIT-PACKED masks leave the device (the tunnel moves ~20 MB/s, so
    S-sized int downloads would dwarf the compute).  The former fused jit
    inlined the label core twice via lax.cond and scattered an iota for
    the chain-tail map — compile blowup + 16 GB padded temps at 33M
    states; tails are now the pure gather head[h^1]^1 in phase 2."""
    g, on_chain, nxt = _edges_chain_inputs(g, k)
    labels = chain_ops.label_chains_host(on_chain, nxt)
    start_packed, cyc_packed = _edges_masks(
        g, labels.is_cycle & labels.is_head)
    return g, labels, start_packed, cyc_packed


@functools.partial(jax.jit, static_argnames=("k",))
def _edges_phase2a(g: kg.PreGraph, s_node, s_orient, s_base, valid,
                   k: int):
    """Device phase 2a: per-start first hop (lookup only)."""
    sn = jnp.maximum(s_node, 0)
    j, oj = kg.next_of(g, sn, s_orient, s_base.astype(jnp.uint32), k)
    j = jnp.where(valid, j, -1)
    first_state = j * 2 + oj
    target_linear = g.linear[jnp.maximum(j, 0)] \
        & ~g.deleted[jnp.maximum(j, 0)] & (j >= 0)
    return j, first_state, target_linear


def _phase2_label_consult(labels, first_state, target_linear, s_node,
                          s_orient, S: int):
    """Chain info per start from the label arrays.  Runs in numpy when
    the labels live on the host (past LABEL_HOST_THRESHOLD) — E-scale
    gathers against S-scale arrays, so shipping the arrays to the device
    would cost far more than the gathers."""
    xp = np if isinstance(labels.head, np.ndarray) else jnp
    fs_safe = xp.clip(first_state, 0, S - 1)
    chain_start = target_linear & labels.on_chain[fs_safe]
    chs = xp.clip(xp.where(chain_start, first_state, 0), 0, S - 1)
    ch_len = xp.where(chain_start, labels.length[chs], 0)
    ch_attach = xp.where(chain_start, labels.attach[chs], -1)
    term_state = xp.where(chain_start, ch_attach, first_state)
    # tail via the flip-mirror identity: tail(h) = head[h^1] ^ 1
    tail_state = xp.where(
        chain_start, labels.head[chs ^ 1] ^ 1, s_node * 2 + s_orient
    )
    return chain_start, ch_len, term_state, tail_state


@functools.partial(jax.jit, static_argnames=("k",))
def _edges_phase2b(g: kg.PreGraph, s_node, s_orient, term_state,
                   tail_state, k: int):
    """Device phase 2b: oriented k-mers/bases at the start/tail/term
    nodes (E-sized gathers over the device-resident key table)."""
    sn = jnp.maximum(s_node, 0)
    ts = jnp.maximum(tail_state, 0)
    pw = g.keys[ts >> 1]
    pfirst = _oriented_first_base(pw, ts & 1, k).astype(jnp.int32)
    fw = g.keys[sn]
    fk_rc = kops.reverse_complement(fw, k)
    first_kmer = jnp.where((s_orient == 1)[:, None], fk_rc, fw)
    tss = jnp.maximum(term_state, 0)
    tw = g.keys[tss >> 1]
    tbase = _oriented_last_base(tw, tss & 1, k)
    return pfirst, first_kmer, tbase


@jax.jit
def _edges_phase3(labels, chain_heads, edge_ids):
    """Device phase 3: per-state (edge id, rank) annotations."""
    S = labels.head.shape[0]
    head_to_edge = jnp.full((S,), -1, jnp.int32)
    head_to_edge = head_to_edge.at[
        jnp.where(chain_heads >= 0, chain_heads, S)
    ].set(edge_ids, mode="drop")
    hsafe = jnp.maximum(labels.head, 0)
    state_edge = jnp.where(labels.on_chain, head_to_edge[hsafe], -1)
    state_rank = jnp.where(state_edge >= 0, labels.rank, 0)
    return state_edge, state_rank


@functools.partial(jax.jit, static_argnames=("k", "total_pad"))
def _edges_phase4(g: kg.PreGraph, state_edge, state_rank, seq_off_dev,
                  edge_cycle_dev, edge_len_dev, k: int, total_pad: int):
    """Device phase 4: scatter interior bases into the ragged seq buffer
    and segment-reduce the interior coverage sums."""
    C = g.keys.shape[0]
    lb = kops.last_base(g.keys).astype(jnp.int32)
    fb = kops.first_base(g.keys, k).astype(jnp.int32)
    bases_state = _interleave_1d(lb, 3 - fb)  # (S,)
    e_of = state_edge
    ok = e_of >= 0
    es = jnp.maximum(e_of, 0)
    cyc = edge_cycle_dev[es]
    elen = jnp.maximum(edge_len_dev[es], 1)
    pos = jnp.where(cyc, (state_rank - 1) % elen, state_rank)
    slot = jnp.where(ok, seq_off_dev[es] + pos, total_pad)
    seq = jnp.full((total_pad + 1,), 255, jnp.uint8)
    seq = seq.at[slot].set(bases_state.astype(jnp.uint8), mode="drop")
    # interior coverage: sum of left covs per edge (make_edge:586)
    covs = g.covs.astype(jnp.int32)
    left_tot = _expand2_1d(covs[:, 0:4].sum(axis=1))  # per state
    E_pad = edge_cycle_dev.shape[0]
    symbol = jax.ops.segment_sum(
        jnp.where(ok, left_tot, 0), jnp.where(ok, es, E_pad),
        num_segments=E_pad + 1,
    )
    return seq[:total_pad], symbol[:E_pad]


def build_edges(g: kg.PreGraph, k: int) -> EdgeGraph:
    """Contract all linear chains into directed edges."""
    import time as _time

    _t0 = _time.time()
    C = g.keys.shape[0]
    S = 2 * C
    g, labels, start_packed, cyc_packed = _edges_phase1(g, k)
    log.info("edges phase1 (refresh+label) %.1fs", _time.time() - _t0)
    _t0 = _time.time()

    # ------------------------------------------------------------------
    # enumerate starts: (branch node, orient, exit base) with side cov > 0
    # ------------------------------------------------------------------
    flat = np.nonzero(start_packed)[0].astype(np.int64)  # host bool mask
    s_node = (flat >> 3).astype(np.int32)
    s_orient = ((flat >> 2) & 1).astype(np.int32)
    s_base = (flat & 3).astype(np.int32)
    nstarts = s_node.shape[0]

    if nstarts:
        e_pad = _next_pow2(nstarts)
        pad = e_pad - nstarts
        sn_p = np.concatenate([s_node, np.zeros((pad,), np.int32)])
        so_p = np.concatenate([s_orient, np.zeros((pad,), np.int32)])
        sb_p = np.concatenate([s_base, np.zeros((pad,), np.int32)])
        vl_p = np.concatenate([np.ones((nstarts,), bool), np.zeros((pad,), bool)])
        host_labels = isinstance(labels.head, np.ndarray)
        j_d, fs_d, tl_d = _edges_phase2a(
            g, jnp.asarray(sn_p), jnp.asarray(so_p), jnp.asarray(sb_p),
            jnp.asarray(vl_p), k,
        )
        if host_labels:
            # E-scale label gathers run where the labels live
            j = np.asarray(j_d)
            first_state = np.asarray(fs_d)
            target_linear = np.asarray(tl_d)
            chain_start, ch_len, term_state, tail_state = \
                _phase2_label_consult(labels, first_state, target_linear,
                                      sn_p, so_p, S)
        else:
            chain_start, ch_len, term_state, tail_state = \
                _phase2_label_consult(labels, fs_d, tl_d,
                                      jnp.asarray(sn_p),
                                      jnp.asarray(so_p), S)
            j = np.asarray(j_d)
            first_state = np.asarray(fs_d)
            chain_start = np.asarray(chain_start)
            ch_len = np.asarray(ch_len)
            term_state = np.asarray(term_state)
            tail_state = np.asarray(tail_state)
        pfirst, first_kmer_d, tbase_d = _edges_phase2b(
            g, jnp.asarray(sn_p), jnp.asarray(so_p),
            jnp.asarray(np.asarray(term_state)),
            jnp.asarray(np.asarray(tail_state)), k,
        )
        j = j[:nstarts]
        first_state = np.asarray(first_state)[:nstarts]
        chain_start = np.asarray(chain_start)[:nstarts]
        ch_len = np.asarray(ch_len)[:nstarts]
        term_state = np.asarray(term_state)[:nstarts]
        pfirst_all = np.asarray(pfirst)[:nstarts]
        first_kmer_all = np.asarray(first_kmer_d)[:nstarts]
        tbase_all = np.asarray(tbase_d)[:nstarts]
    else:
        j = np.zeros((0,), np.int32)
        first_state = np.zeros((0,), np.int32)
        chain_start = np.zeros((0,), bool)
        ch_len = np.zeros((0,), np.int32)
        term_state = np.zeros((0,), np.int32)
        pfirst_all = np.zeros((0,), np.int32)
        first_kmer_all = np.zeros((0, kops.num_words(k)), np.uint32)
        tbase_all = np.zeros((0,), np.uint8)

    log.info("edges phase2 (starts %d) %.1fs", nstarts,
             _time.time() - _t0)
    _t0 = _time.time()
    keep = (j >= 0) & (term_state >= 0)  # defensive; true after refresh
    if not keep.all():
        (s_node, s_orient, s_base, first_state, chain_start, ch_len,
         term_state, pfirst_all, first_kmer_all, tbase_all) = (
            a[keep]
            for a in (s_node, s_orient, s_base, first_state, chain_start,
                      ch_len, term_state, pfirst_all, first_kmer_all,
                      tbase_all)
        )
        nstarts = s_node.shape[0]
    ch_head = np.where(chain_start, first_state, -1)

    # ------------------------------------------------------------------
    # cycles: two mirrored circular edges per isolated loop
    # ------------------------------------------------------------------
    cyc_heads = np.nonzero(_unpack_bits_np(np.asarray(cyc_packed), S))[0]
    cyc_heads = cyc_heads.astype(np.int32)
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
        # one base per member state
        if isinstance(labels.length, np.ndarray):
            edge_len[nstarts:] = labels.length[cyc_heads]
        else:
            edge_len[nstarts:] = np.asarray(
                jnp.take(labels.length, jnp.asarray(cyc_heads))
            )
        edge_cycle[nstarts:] = True

    # per-state annotations (interior k-mers), on device — they stay there
    # (the arc pass consumes them as device arrays); inputs pow2-padded so
    # the kernels compile once per size bucket
    e_pad2 = _next_pow2(E)
    ch_pad = np.full((e_pad2,), -1, np.int32)
    ch_pad[:E] = edge_chain_head
    if isinstance(labels.head, np.ndarray):
        # host labels: compute the S-sized annotations in numpy and
        # upload just the two arrays the arc pass needs
        head_to_edge = np.full((S + 1,), -1, np.int32)
        hsel = ch_pad[:E] >= 0
        head_to_edge[ch_pad[:E][hsel]] = \
            np.arange(E, dtype=np.int32)[hsel]
        se_np = np.where(labels.on_chain,
                         head_to_edge[np.maximum(labels.head, 0)], -1)
        sr_np = np.where(se_np >= 0, labels.rank, 0).astype(np.int32)
        state_edge = jnp.asarray(se_np.astype(np.int32))
        state_rank = jnp.asarray(sr_np)
    else:
        state_edge, state_rank = _edges_phase3(
            labels, jnp.asarray(ch_pad),
            jnp.arange(e_pad2, dtype=jnp.int32),
        )

    # ------------------------------------------------------------------
    # sequence materialization (device scatter, one download of the bases)
    # ------------------------------------------------------------------
    seq_off = np.zeros((E + 1,), np.int64)
    np.cumsum(edge_len, out=seq_off[1:])
    total = int(seq_off[-1])
    total_pad = _next_pow2(total)
    seq_off_dev = jnp.asarray(
        np.concatenate([seq_off[:E], np.zeros((e_pad2 - E,), np.int64)]
                       ).astype(np.int32)
    )
    seq_d, symbol_d = _edges_phase4(
        g, state_edge, state_rank, seq_off_dev,
        jnp.asarray(np.concatenate([edge_cycle,
                                    np.zeros((e_pad2 - E,), bool)])),
        jnp.asarray(np.concatenate([edge_len,
                                    np.zeros((e_pad2 - E,), np.int64)]
                                   ).astype(np.int32)),
        k, total_pad,
    )
    seq_bases = np.asarray(seq_d)[:total].copy()
    symbol = np.asarray(symbol_d)[:E].astype(np.int64)

    # terminal base of non-cycle edges: oriented last base of the to-state
    noncyc = np.nonzero(~edge_cycle)[0]
    if noncyc.size:
        seq_bases[seq_off[noncyc] + edge_len[noncyc] - 1] = tbase_all[noncyc]

    # oriented first k-mers (starts came from phase 2; cycles gathered here)
    first_kmer = np.zeros((E, kops.num_words(k)), np.uint32)
    first_kmer[:nstarts] = first_kmer_all
    if ncyc:
        cw = jnp.asarray(cyc_heads >> 1)
        co = jnp.asarray((cyc_heads & 1).astype(np.int32))
        fw = jnp.take(g.keys, cw, axis=0)
        fk = kops.reverse_complement(fw, k)
        first_kmer[nstarts:] = np.asarray(
            jnp.where((co == 1)[:, None], fk, fw)
        )

    # ------------------------------------------------------------------
    # coverage: 10 * sum(interior left covs) / n_interior (make_edge:586)
    # ------------------------------------------------------------------
    n_interior = np.where(edge_cycle, edge_len, edge_len - 1)
    cvg10 = np.zeros((E,), np.int32)
    nz = n_interior > 0
    cvg10[nz] = np.minimum(symbol[nz] // n_interior[nz] * 10, 16000).astype(np.int32)

    # ------------------------------------------------------------------
    # twin pairing
    # ------------------------------------------------------------------
    # start triple of the twin: (to_node, flip(to_orient), comp(first base of
    # the last k-mer before the to-node, oriented)); pfirst came from the
    # device phase (tail state resolved there via tail_of_head)
    twin = np.full((E,), -1, np.int32)
    if nstarts:
        tb = 3 - pfirst_all  # comp
        tnode = edge_to[:nstarts]
        torient = 1 - edge_to_orient[:nstarts].astype(np.int32)
        start_id = np.full((C, 2, 4), -1, np.int32)
        start_id[s_node, s_orient, s_base] = np.arange(nstarts, dtype=np.int32)
        twin[:nstarts] = start_id[tnode, torient, tb]
    if ncyc:
        # mirrored cycle: head of the flipped state's chain (edge ids of
        # cycle heads are their position after the starts)
        if isinstance(labels.head, np.ndarray):
            mirror_head = labels.head[cyc_heads ^ 1]
        else:
            mirror_head = np.asarray(
                jnp.take(labels.head, jnp.asarray(cyc_heads ^ 1))
            )
        h2e = {int(h): nstarts + i for i, h in enumerate(cyc_heads)}
        twin[nstarts:] = np.array(
            [h2e.get(int(h), -1) for h in mirror_head], np.int32
        )

    # ------------------------------------------------------------------
    # (k+1)-mer patch for length-1 edges
    # ------------------------------------------------------------------
    patch_keys, patch_edge, patch_twin = build_patch_table(
        seq_bases, seq_off, edge_len, edge_cycle, first_kmer, twin, k
    )

    log.info("edges phases3-5 %.1fs", _time.time() - _t0)
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


def build_patch_table(seq_bases, seq_off, edge_len, edge_cycle,
                      first_kmer, twin, k: int):
    """(k+1)-mer patch entries for length-1 edges (the reference's
    KmerSetsPatch longNode, node2edge.c:480-545); shared by the
    single-device and sharded edge builders."""
    short = np.nonzero((edge_len == 1) & ~edge_cycle)[0].astype(np.int32)
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
        return (canon[newk], ecan[newk].astype(np.int32),
                etwn[newk].astype(np.int32))
    return (np.zeros((0, kops.num_words(k + 1)), np.uint32),
            np.zeros((0,), np.int32), np.zeros((0,), np.int32))


def _widen_kmer(words, k: int):
    """Re-align a k-mer register into the (k+1)-mer word width (value copy)."""
    w_old = kops.num_words(k)
    w_new = kops.num_words(k + 1)
    if w_new == w_old:
        return words
    pad = jnp.zeros(words.shape[:-1] + (w_new - w_old,), jnp.uint32)
    return jnp.concatenate([pad, words], axis=-1)
