"""Sparse pregraph: sampled de Bruijn graph with packed k-mer-edges.

TPU-native re-design of the reference's sparsePregraph module
(pregraph_sparse.cpp ``call_pregraph_sparse:83``, build_graph.cpp,
build_edge.cpp, convert_soapdenovo.cpp): keep only ~1/g of all k-mers as
graph nodes and link consecutive kept k-mers along each read with short
"k-mer edges" (<= g bases), cutting table memory (and sort volume)
several-fold — the reference's stated motivation (README.md:126-139).

Where the reference samples by insertion order (a k-mer is kept if no
kept k-mer exists within distance g — stream-order dependent,
build_graph.cpp ``process_round1_threaded:104``), we sample
**deterministically by hash**: a k-mer is a node iff
``hash(kmer) % g == 0`` (minimizer-style).  Selection is then a pure
function of the k-mer — identical across reads, batches, devices, and
runs — so round-1/round-2 of the reference collapse into a single
extract -> filter -> pair -> sort/reduce pass.

Output: standard pregraph stage files (*.edge.gz, *.preArc,
*.preGraphBasic, *.vertex) via convert (the convert_soapdenovo.cpp:248
role), so contig/map/scaff run unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AssemblyConfig
from ..io import reads as rio
from ..ops import kmer as kops
from ..ops import sortcount as sc

log = logging.getLogger("soapdenovo2_tpu.sparse")

MAX_GAP = 25  # reference: sparse gap g <= 25 (pregraph_sparse.cpp usage)


@functools.partial(jax.jit, static_argnames=("k", "gap"))
def _sparse_batch(codes, lengths, k: int, gap: int):
    """Extract selected k-mers + k-mer-edges from one read batch.

    Returns flat arrays over all read positions:
      node_words (N, W), node_valid (N,)          — selected k-mer occurrences
      edge_src (N, W), edge_orient (N,), edge_len (N,),
      edge_b0, edge_b1 (N,) uint32 packed bases,  edge_valid (N,)
          — an edge from the PREVIOUS selected k-mer to this one
    """
    return _sparse_batch_core(codes, lengths, k, gap, None)


@functools.partial(jax.jit, static_argnames=("k", "gap"))
def _sparse_batch_filtered(codes, lengths, fkeys, k: int, gap: int):
    """Round-2 selection (build_graph.cpp process_round2_threaded_d
    role): only k-mers in the round-1 survivor set ``fkeys`` compete as
    minimizers, so error k-mers no longer displace true nodes or break
    the node chain."""
    return _sparse_batch_core(codes, lengths, k, gap, fkeys)


def _sparse_batch_core(codes, lengths, k: int, gap: int, fkeys):
    out = kops.extract_kmers(codes, lengths, k)
    words = out["words"]  # (B, P, W)
    valid = out["valid"]
    B, P, W = words.shape

    # minimizer selection: a k-mer is a node iff it is the hash-minimum of
    # SOME length-``gap`` window, i.e. iff the distances to the nearest
    # strictly-smaller hash on each side sum to > gap.  Deterministic per
    # k-mer pair, consistent across reads/strands (canonical hashes), and
    # guarantees consecutive nodes within <= gap positions — unlike the
    # reference's stream-order-dependent sampling (build_graph.cpp round 1).
    h = jnp.where(valid, kops.hash_words(words), jnp.uint32(0xFFFFFFFF))
    big = jnp.uint32(0xFFFFFFFF)

    def shifted(x, off):
        """x[:, p + off] with out-of-range -> big."""
        if off == 0:
            return x
        pad = jnp.full((B, abs(off)), big, x.dtype)
        if off > 0:
            return jnp.concatenate([x[:, off:], pad], axis=1)
        return jnp.concatenate([pad, x[:, :off]], axis=1)

    if fkeys is not None:
        member = sc.lookup_kmers(fkeys, words) >= 0
        h = jnp.where(member, h, big)
    # window-context validity must track READ bounds, not h==big: with a
    # membership filter, non-member positions carry big by design and
    # are globally consistent, so they may sit inside a window
    vbit = valid.astype(jnp.uint8)

    def shifted_v(x, off):
        if off == 0:
            return x
        pad = jnp.zeros((B, abs(off)), x.dtype)
        if off > 0:
            return jnp.concatenate([x[:, off:], pad], axis=1)
        return jnp.concatenate([pad, x[:, :off]], axis=1)

    w_int = gap
    dprev = jnp.full((B, P), w_int, jnp.int32)
    dnext = jnp.full((B, P), w_int, jnp.int32)
    ctx = valid  # selection needs the FULL window context, else a k-mer's
    # selection would depend on where reads happen to end (inconsistent
    # across reads); boundary occurrences simply don't emit nodes
    for a in range(1, w_int):
        hp = shifted(h, -a)
        hn = shifted(h, a)
        dprev = jnp.where((dprev == w_int) & (hp < h), a, dprev)
        dnext = jnp.where((dnext == w_int) & (hn < h), a, dnext)
        ctx = ctx & (shifted_v(vbit, -a) == 1) & (shifted_v(vbit, a) == 1)
    selected = ctx & (dprev + dnext >= w_int + 1)
    if fkeys is not None:
        selected = selected & member

    # previous selected position per position (exclusive scan)
    pos = jnp.arange(P, dtype=jnp.int32)[None, :].repeat(B, axis=0)
    sel_pos = jnp.where(selected, pos, -1)

    def combine(a, b):
        return jnp.where(b >= 0, b, a)

    prev = jax.lax.associative_scan(combine, sel_pos, axis=1)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), prev[:, :-1]], axis=1
    )

    dist = pos - prev
    edge_ok = selected & (prev >= 0) & (dist <= gap)
    prev_safe = jnp.maximum(prev, 0)

    # pack the intervening bases codes[prev+k .. pos+k-1] (== dist bases,
    # the last bases of k-mers prev+1..pos) into 2*gap bits (<=50 w/ g=25)
    # b0 holds bases 0..15, b1 bases 16.., first base most significant.
    def body(i, st):
        b0, b1 = st
        idx = jnp.minimum(prev_safe + k + i, codes.shape[1] - 1)
        base = jnp.take_along_axis(codes, idx, axis=1).astype(jnp.uint32) & 3
        use = i < dist
        shift0 = jnp.clip(2 * (dist - 1 - i), 0, 31).astype(jnp.uint32)
        in_b0 = (dist - 1 - i) < 16
        zero = jnp.uint32(0)
        add0 = jnp.where(use & in_b0, base << shift0, zero)
        shift1 = jnp.clip(2 * (dist - 1 - i - 16), 0, 31).astype(jnp.uint32)
        add1 = jnp.where(use & ~in_b0, base << shift1, zero)
        return b0 | add0, b1 | add1

    zeros = jnp.zeros((B, P), jnp.uint32)
    b0, b1 = jax.lax.fori_loop(0, gap, body, (zeros, zeros))

    src_words = words[jnp.arange(B)[:, None], prev_safe]  # (B, P, W)
    src_orient = out["is_rc"][jnp.arange(B)[:, None], prev_safe]

    # ---- read transits (build_preArc.cpp:1043 role): consecutive edge
    # pairs along a read.  The transit at position p is centred on the
    # MID node (the selected k-mer at q = prev[p]): in-edge (prev[q] ->
    # q) then out-edge (q -> p).  The in-edge is keyed by its MIRROR
    # bases (comp-reverse of the in-edge src's first el_in bases, i.e.
    # comp(codes[prev[q] + t]) for t < el_in) because the appended bases
    # of the in-edge are redundant with the mid k-mer itself and do not
    # identify the src.  Everything else reuses the edge outputs: mid
    # node = edge_src/edge_src_orient at p, out-edge = edge_len/b0/b1.
    in_ok = jnp.take_along_axis(edge_ok, prev_safe, axis=1)
    el_in = jnp.take_along_axis(dist, prev_safe, axis=1)
    p2_safe = jnp.maximum(jnp.take_along_axis(prev, prev_safe, axis=1), 0)

    def mbody(t, st):
        mb0, mb1 = st
        idx = jnp.minimum(p2_safe + t, codes.shape[1] - 1)
        base = (
            3 - (jnp.take_along_axis(codes, idx, axis=1).astype(jnp.uint32)
                 & 3)
        ) & 3
        use = t < el_in
        zero = jnp.uint32(0)
        sh0 = jnp.clip(2 * t, 0, 31).astype(jnp.uint32)
        sh1 = jnp.clip(2 * (t - 16), 0, 31).astype(jnp.uint32)
        add0 = jnp.where(use & (t < 16), base << sh0, zero)
        add1 = jnp.where(use & (t >= 16), base << sh1, zero)
        return mb0 | add0, mb1 | add1

    mb0, mb1 = jax.lax.fori_loop(0, gap, mbody, (zeros, zeros))
    trans_ok = edge_ok & in_ok

    flat = lambda x: x.reshape((B * P,) + x.shape[2:])
    return {
        "node_words": flat(words),
        "node_valid": selected.reshape(B * P),
        "edge_src": flat(src_words),
        "edge_src_orient": src_orient.reshape(B * P).astype(jnp.uint8),
        "edge_dst_orient": out["is_rc"].reshape(B * P).astype(jnp.uint8),
        "edge_len": jnp.where(edge_ok, dist, 0).reshape(B * P).astype(jnp.uint8),
        "edge_b0": b0.reshape(B * P),
        "edge_b1": b1.reshape(B * P),
        "edge_valid": edge_ok.reshape(B * P),
        "trans_valid": trans_ok.reshape(B * P),
        "trans_el_in": jnp.where(trans_ok, el_in, 0).reshape(B * P).astype(jnp.uint8),
        "trans_mb0": mb0.reshape(B * P),
        "trans_mb1": mb1.reshape(B * P),
    }


@dataclasses.dataclass
class SparseGraph:
    """Host-side sparse graph: sampled nodes + packed kmer-edges."""

    k: int
    gap: int
    node_words: np.ndarray  # (N, W) sorted unique selected k-mers
    node_cov: np.ndarray  # (N,) occurrence counts (capped 255)
    # directed edges in traversal orientation, canonical-src keyed
    edges: Dict[Tuple, int]  # (src_idx, src_o, len, b0, b1) -> cov
    # per-pair read transits at each junction node (build_preArc.cpp:1043
    # role): key = (mid_idx, mid_o, el_in, mb0, mb1, el_out, ob0, ob1)
    # where (mb0, mb1) pack the in-edge's MIRROR bases and (ob0, ob1) the
    # out-edge's appended bases -> number of reads crossing mid that way
    transits: Dict[Tuple, int] = dataclasses.field(default_factory=dict)


def build_sparse_graph(
    batches: Iterable[rio.ReadBatch], k: int, gap: int = 15,
    batches2=None, round1_cov: int = 2,
) -> SparseGraph:
    """Sparse graph build.  With ``batches2`` (a second pass over the
    same reads), runs the reference's TWO-ROUND architecture
    (build_graph.cpp round 1 count -> round 2 rebuild): round 1 selects
    and counts candidate nodes; round 2 re-streams with selection
    restricted to round-1 survivors (cov >= round1_cov), so error
    k-mers — overwhelmingly cov-1 — no longer displace true nodes or
    sit as chain-breaking gaps.  Without batches2, single-round."""
    kops.validate_k(k)
    gap = min(gap, MAX_GAP)
    filter_keys = None
    if batches2 is not None:
        g1 = build_sparse_graph(batches, k, gap)
        keep = g1.node_cov >= round1_cov
        if keep.any():
            filter_keys = jnp.asarray(g1.node_words[keep])
            log.info(
                "sparse round 1: %d candidates -> %d survivors (cov>=%d)",
                g1.node_words.shape[0], int(keep.sum()), round1_cov,
            )
            batches = batches2
        else:
            # Degenerate input (no candidate reached round1_cov): the
            # round-1 graph IS the best available answer, and `batches`
            # may be a consumed one-shot iterator — rebuilding from it
            # would silently return an empty graph.
            return g1
    node_keys: List[np.ndarray] = []
    node_cnts: List[np.ndarray] = []
    edge_rows: List[np.ndarray] = []
    edge_cnts: List[np.ndarray] = []
    trans_rows: List[np.ndarray] = []
    trans_cnts: List[np.ndarray] = []
    w = kops.num_words(k)

    def _rl(rows: np.ndarray, counts: np.ndarray):
        """lexsort + run-length SUM of counts (duplicate rows collapse)."""
        order = np.lexsort(
            tuple(rows[:, i] for i in range(rows.shape[1] - 1, -1, -1))
        )
        rows = rows[order]
        counts = counts[order]
        new = np.ones((rows.shape[0],), bool)
        new[1:] = (rows[1:] != rows[:-1]).any(axis=1)
        grp = np.cumsum(new) - 1
        sums = np.bincount(grp, weights=counts.astype(np.float64))
        return rows[new], sums.astype(np.int64)

    def _compact_pending():
        """Collapse accumulated rows in place.  Run every COMPACT_ROWS
        raw rows so host memory stays ~one compacted set + one window of
        new rows, instead of every raw observation until end-of-stream
        (the sparse module exists to REDUCE memory)."""
        for rows_l, cnt_l in ((node_keys, node_cnts),
                              (edge_rows, edge_cnts),
                              (trans_rows, trans_cnts)):
            if rows_l:  # len 1 included: a lone raw batch still dedups
                ur, uc = _rl(np.concatenate(rows_l), np.concatenate(cnt_l))
                rows_l[:] = [ur]
                cnt_l[:] = [uc]

    COMPACT_ROWS = 4 << 20
    pending_rows = 0
    for batch in batches:
        if filter_keys is not None:
            outb = _sparse_batch_filtered(
                jnp.asarray(batch.codes), jnp.asarray(batch.lengths),
                filter_keys, k, gap,
            )
        else:
            outb = _sparse_batch(
                jnp.asarray(batch.codes), jnp.asarray(batch.lengths),
                k, gap,
            )
        nv = np.asarray(outb["node_valid"])
        nw = np.asarray(outb["node_words"])[nv]
        node_keys.append(nw)
        node_cnts.append(np.ones((nw.shape[0],), np.int64))
        pending_rows += nw.shape[0]
        ev = np.asarray(outb["edge_valid"])
        if ev.any():
            src = np.asarray(outb["edge_src"])[ev]
            so = np.asarray(outb["edge_src_orient"])[ev].astype(np.uint32)
            el = np.asarray(outb["edge_len"])[ev].astype(np.uint32)
            b0 = np.asarray(outb["edge_b0"])[ev]
            b1 = np.asarray(outb["edge_b1"])[ev]
            edge_rows.append(
                np.column_stack([src, (so | (el << 8)), b0, b1])
            )
            edge_cnts.append(np.ones((src.shape[0],), np.int64))
            pending_rows += src.shape[0]
        tv = np.asarray(outb["trans_valid"])
        if tv.any():
            mid = np.asarray(outb["edge_src"])[tv]  # mid node = in-edge dst
            mo = np.asarray(outb["edge_src_orient"])[tv].astype(np.uint32)
            eli = np.asarray(outb["trans_el_in"])[tv].astype(np.uint32)
            elo = np.asarray(outb["edge_len"])[tv].astype(np.uint32)
            trans_rows.append(np.column_stack([
                mid, (mo | (eli << 8) | (elo << 16)),
                np.asarray(outb["trans_mb0"])[tv],
                np.asarray(outb["trans_mb1"])[tv],
                np.asarray(outb["edge_b0"])[tv],
                np.asarray(outb["edge_b1"])[tv],
            ]))
            trans_cnts.append(np.ones((mid.shape[0],), np.int64))
            pending_rows += mid.shape[0]
        if pending_rows >= COMPACT_ROWS:
            _compact_pending()
            pending_rows = sum(r.shape[0] for r in
                               node_keys + edge_rows + trans_rows)
    _compact_pending()
    # vectorized edge dedup/count (sort + run-length, no python dict loop)
    edge_accum: Dict[Tuple, int] = {}
    if edge_rows:
        urows, counts = edge_rows[0], edge_cnts[0]
        for i in range(urows.shape[0]):
            so_el = int(urows[i, w])
            edge_accum[
                (urows[i, :w].tobytes(), so_el & 0xFF, so_el >> 8,
                 int(urows[i, w + 1]), int(urows[i, w + 2]))
            ] = int(counts[i])
    if node_keys:
        uniq, cov = node_keys[0], node_cnts[0]
    else:
        uniq = np.zeros((0, w), np.uint32)
        cov = np.zeros((0,), np.int64)

    # map edge src bytes -> node index
    idx_of = {uniq[i].tobytes(): i for i in range(uniq.shape[0])}
    edges: Dict[Tuple, int] = {}
    for (sb, so, el, b0, b1), c in edge_accum.items():
        si = idx_of.get(sb)
        if si is None:
            continue
        edges[(si, so, el, b0, b1)] = c
    # transit dedup/count (same sort + run-length scheme as edges)
    transits: Dict[Tuple, int] = {}
    if trans_rows:
        urows, counts = trans_rows[0], trans_cnts[0]
        for i in range(urows.shape[0]):
            mi = idx_of.get(urows[i, :w].tobytes())
            if mi is None:
                continue
            packed = int(urows[i, w])
            transits[
                (mi, packed & 0xFF, (packed >> 8) & 0xFF, int(urows[i, w + 1]),
                 int(urows[i, w + 2]), (packed >> 16) & 0xFF,
                 int(urows[i, w + 3]), int(urows[i, w + 4]))
            ] = int(counts[i])
    return SparseGraph(
        k=k, gap=gap, node_words=uniq,
        node_cov=np.minimum(cov, 255).astype(np.int32), edges=edges,
        transits=transits,
    )


def _unpack_edge_bases(el: int, b0: int, b1: int) -> List[int]:
    out = []
    for i in range(el):
        p = el - 1 - i
        if p < 16:
            out.append((b0 >> (2 * p)) & 3)
        else:
            out.append((b1 >> (2 * (p - 16))) & 3)
    return out


def _pack_bases(bases) -> Tuple[int, int, int]:
    """Inverse of _unpack_edge_bases: (el, b0, b1), first base most
    significant — the device packing convention of _sparse_batch."""
    el = len(bases)
    b0 = b1 = 0
    for i, b in enumerate(bases):
        p = el - 1 - i
        if p < 16:
            b0 |= (int(b) & 3) << (2 * p)
        else:
            b1 |= (int(b) & 3) << (2 * (p - 16))
    return el, b0, b1


def prune_sparse(g: SparseGraph, node_cov_cutoff: int = 1,
                 edge_cov_cutoff: int = 1) -> SparseGraph:
    """RemovingWeakNodesAndEdges2 (build_edge.cpp:52): drop low-coverage
    nodes and edges."""
    keep_node = g.node_cov > node_cov_cutoff
    edges = {
        key: c
        for key, c in g.edges.items()
        if c > edge_cov_cutoff and keep_node[key[0]]
    }
    # nodes keep their indices; deleted nodes simply lose their edges
    # (transits at a deleted mid node just miss at lookup time)
    g2 = SparseGraph(
        k=g.k, gap=g.gap, node_words=g.node_words,
        node_cov=np.where(keep_node, g.node_cov, 0), edges=edges,
        transits=g.transits,
    )
    return g2


def save_sparse_graph(g: SparseGraph, prefix: str) -> None:
    """Checkpoint the built (unpruned) sparse graph to *.ht_idx (nodes)
    and *.ht_content (kmer-edges) — the role of SavingSparseKmerGraph2
    (build_graph.cpp:645), written right after the build like the
    reference (before pruning)."""
    with open(prefix + ".ht_idx", "wb") as fh:
        np.savez(fh, k=np.int64(g.k), gap=np.int64(g.gap),
                 node_words=g.node_words, node_cov=g.node_cov)
    if g.edges:
        rows = np.array(
            [(s, o, l, b0, b1, c)
             for (s, o, l, b0, b1), c in g.edges.items()],
            np.int64,
        )
    else:
        rows = np.zeros((0, 6), np.int64)
    with open(prefix + ".ht_content", "wb") as fh:
        np.save(fh, rows)
        trows = (
            np.array([key + (c,) for key, c in g.transits.items()], np.int64)
            if g.transits else np.zeros((0, 9), np.int64)
        )
        np.save(fh, trows)


def load_sparse_graph(prefix: str) -> SparseGraph:
    """Reload a *.ht_idx/*.ht_content checkpoint
    (LoadingSparseKmerGraph2, build_graph.cpp:728)."""
    with open(prefix + ".ht_idx", "rb") as fh:
        z = np.load(fh)
        k = int(z["k"])
        gap = int(z["gap"])
        node_words = z["node_words"]
        node_cov = z["node_cov"]
    with open(prefix + ".ht_content", "rb") as fh:
        rows = np.load(fh)
        # pre-transit checkpoints (older format) simply END after the
        # first array: detect clean EOF instead of swallowing arbitrary
        # errors (a truncated/corrupt second array must fail loudly)
        if fh.peek(1)[:1] == b"":
            trows = np.zeros((0, 9), np.int64)
        else:
            trows = np.load(fh)
    edges = {
        (int(s), int(o), int(l), int(b0), int(b1)): int(c)
        for s, o, l, b0, b1, c in rows
    }
    transits = {tuple(int(v) for v in r[:8]): int(r[8]) for r in trows}
    return SparseGraph(k=k, gap=gap, node_words=node_words,
                       node_cov=node_cov, edges=edges, transits=transits)


def run_sparse_pregraph(
    cfg: AssemblyConfig,
    k: int,
    prefix: str,
    gap: int = 15,
    node_cov_cutoff: int = 1,
    edge_cov_cutoff: int = 1,
    batch_size: int = 4096,
    progress: bool = True,
    run_mode: int = 0,
) -> List[Tuple[str, float]]:
    """Sparse pregraph driver: reads -> sampled graph -> unitigs.

    Emits *.contig / *.ContigIndex / *.preGraphBasic directly (the sparse
    graph's unitig walk subsumes the dense path's pregraph+contig
    contraction; graph-cleaning refinements on the sparse graph itself are
    pruning-based, see prune_sparse).  Continue with map + scaff.

    ``run_mode`` mirrors sparse_pregraph -r (pregraph_sparse.cpp:642-672):
      0 = build graph (checkpointing it) + edges + preArcs
      1 = load the *.ht_idx/*.ht_content checkpoint + edges + preArcs
      2 = build + checkpoint the graph only
      3 = load checkpoint, write edge-side files only
      4 = load checkpoint, write preArcs only
    """
    from ..io import files as fio

    def stream():
        for lib in cfg.libs_for_contig():
            yield from rio.iter_lib_reads(lib)

    if run_mode in (0, 2):
        g = build_sparse_graph(
            rio.batch_reads(stream(), batch_size, cfg.max_rd_len), k, gap,
            batches2=rio.batch_reads(stream(), batch_size, cfg.max_rd_len),
        )
        if progress:
            log.info(
                "sparse graph: %d nodes (1/%d sampling), %d raw edges",
                g.node_words.shape[0], g.gap, len(g.edges),
            )
        save_sparse_graph(g, prefix)
        if run_mode == 2:
            return []
    else:
        g = load_sparse_graph(prefix)
        if progress:
            log.info(
                "sparse graph loaded from %s.ht_idx: %d nodes, %d edges",
                prefix, g.node_words.shape[0], len(g.edges),
            )
    g = prune_sparse(g, node_cov_cutoff, edge_cov_cutoff)
    n_tips = remove_sparse_tips(g)
    if n_tips and progress:
        log.info("sparse tips: %d node(s) clipped", n_tips)
    n_arms = collapse_sparse_arms(g)
    if n_arms:
        n_tips2 = remove_sparse_tips(g)
        if progress:
            log.info("sparse arms: %d collapsed (+%d tip nodes)",
                     n_arms, n_tips2)
    # standard stage files so `contig -g prefix` runs on sparse output
    # (the reference flow: sparse_pregraph -> contig -> map -> scaff)
    only = {0: "all", 1: "all", 3: "edges", 4: "prearcs"}[run_mode]
    n_rec = write_sparse_pregraph_files(g, prefix, cfg.max_rd_len, only=only)
    if progress:
        log.info("sparse pregraph files: %d edge record(s)", n_rec)
    if run_mode == 4:
        return []
    unitigs = sparse_to_unitigs(g)
    unitigs = [(s, c) for s, c in unitigs if len(s) >= k + 2]
    unitigs.sort(key=lambda x: (-len(x[0]), x[0]))
    records = [(i + 1, s, c) for i, (s, c) in enumerate(unitigs)]
    pal = [fio.is_palindrome(s) for _, s, _ in records]
    d2r = fio.dir_to_ref_ids(pal)
    # directed rep ids in the *.contig headers (see checkpoint.write_contigs)
    records = [(int(d2r[2 * i]), s, c)
               for i, (_, s, c) in enumerate(records)]
    fio.write_contigs(prefix, records)
    fio.write_contig_index(prefix, [len(s) for _, s, _ in records], pal)
    fio.write_updated_edges(
        prefix, [(len(s), p, c) for (_, s, c), p in zip(records, pal)])
    if progress:
        from ..utils.simulate import assembly_stats

        log.info("sparse unitigs: %s",
                 assembly_stats([s for s, _ in unitigs]))
    return unitigs


@dataclasses.dataclass
class SparseChain:
    """A maximal unambiguous directed chain of the sparse graph."""

    seq: str
    cov: float  # mean node coverage along the chain
    start: Tuple[int, int]  # (node index, orientation)
    end: Tuple[int, int]
    nodes: List[int]  # node indices visited, in order
    first_cov: int  # coverage of the chain's first kmer-edge (0 = none)
    first_bases: Tuple[int, ...] = ()  # appended bases of the first kmer-edge


def _state_kmer(g: SparseGraph, i: int, o: int) -> np.ndarray:
    wds = g.node_words[i]
    if o:
        wds = np.asarray(
            kops.reverse_complement(jnp.asarray(wds)[None], g.k)
        )[0]
    return wds


def _seq_of_state(g: SparseGraph, st) -> str:
    return kops.kmer_to_string(_state_kmer(g, *st), g.k)


def _adjacency(g: SparseGraph):
    """Directed adjacency over oriented nodes, twin-mirrored.

    Returns (adj, radj) where adj[state] = [(bases, dst_state, cov), ...]
    and radj[state] = number of incoming edges.  Edges touching deleted
    (cov 0) nodes are dropped."""
    k = g.k
    idx_of = {
        g.node_words[i].tobytes(): i for i in range(g.node_words.shape[0])
    }
    # dedup identical (src, bases, dst) since an edge may be observed
    # directly on both strands AND mirrored
    edge_cov: Dict[Tuple, int] = {}
    for (si, so, el, b0, b1), cov in g.edges.items():
        if g.node_cov[si] == 0:
            continue
        bases = tuple(_unpack_edge_bases(el, b0, b1))
        # destination k-mer: walk src's oriented k-mer through the bases
        wds = jnp.asarray(_state_kmer(g, si, so))[None]
        for b in bases:
            wds = kops.shift_left_append(wds, jnp.uint32(b), k)
        dst_plain = np.asarray(wds)[0]
        rc = np.asarray(
            kops.reverse_complement(jnp.asarray(dst_plain)[None], k)
        )[0]
        if kops.kmer_to_int(rc) < kops.kmer_to_int(dst_plain):
            dst_key, do = rc, 1
        else:
            dst_key, do = dst_plain, 0
        di = idx_of.get(dst_key.tobytes())
        if di is None or g.node_cov[di] == 0:
            continue
        edge_cov[((si, so), bases, (di, do))] = (
            edge_cov.get(((si, so), bases, (di, do)), 0) + cov
        )
        # mirror: flip(dst) -> flip(src); its bases are
        # comp(reverse(first m bases of the src oriented k-mer string))
        src_str = _seq_of_state(g, (si, so))
        m = len(bases)
        mbases = tuple(
            (3 - int(kops._BASE_FROM_CHAR[ord(c)])) & 3
            for c in reversed(src_str[:m])
        )
        mkey = ((di, 1 - do), mbases, (si, 1 - so))
        edge_cov[mkey] = edge_cov.get(mkey, 0) + cov

    adj: Dict[Tuple[int, int], List] = {}
    radj: Dict[Tuple[int, int], int] = {}
    for (st, bases, dst), cov in sorted(edge_cov.items()):
        adj.setdefault(st, []).append((bases, dst, cov))
        radj[dst] = radj.get(dst, 0) + 1
    return adj, radj


def sparse_chains(g: SparseGraph,
                  join_splits: bool = False) -> List[SparseChain]:
    """Walk unambiguous sparse chains (build_edge.cpp kmer2edges:888,
    host-side over the small graph).  Every chain is reported in BOTH
    orientations (mirror chains pair up as twins); isolated nodes become
    single-k-mer chains."""
    adj, radj = _adjacency(g)
    out: List[SparseChain] = []
    guard = set()
    n_edges = sum(len(v) for v in adj.values())

    def walk(start, first):
        bases, dst, fcov = first
        seq = _seq_of_state(g, start) + "".join("ACGT"[b] for b in bases)
        covs = [int(g.node_cov[start[0]]), int(g.node_cov[dst[0]])]
        nodes = [start[0], dst[0]]
        cur = dst
        steps = 0
        while (
            radj.get(cur, 0) == 1
            and len(adj.get(cur, [])) == 1
            and cur not in guard
            and steps < n_edges + 2
        ):
            guard.add(cur)
            bases, nxt, _ = adj[cur][0]
            seq += "".join("ACGT"[b] for b in bases)
            covs.append(int(g.node_cov[nxt[0]]))
            nodes.append(nxt[0])
            cur = nxt
            steps += 1
        out.append(SparseChain(
            seq=seq, cov=float(np.mean(covs)), start=start, end=cur,
            nodes=nodes, first_cov=int(fcov), first_bases=tuple(first[0]),
        ))

    for i in range(g.node_words.shape[0]):
        if g.node_cov[i] == 0:
            continue
        isolated = True
        for o in (0, 1):
            st = (i, o)
            outs = adj.get(st, [])
            if outs or radj.get(st, 0):
                isolated = False
            if not outs:
                continue
            if len(outs) > 1 or radj.get(st, 0) != 1:
                for e in outs:
                    walk(st, e)
        if isolated:
            out.append(SparseChain(
                seq=_seq_of_state(g, (i, 0)), cov=float(g.node_cov[i]),
                start=(i, 0), end=(i, 0), nodes=[i], first_cov=0,
            ))
    if join_splits:
        out = _join_error_splits(g, out, adj, radj)
    return out


def _join_error_splits(g: SparseGraph, chains: List[SparseChain],
                       adj, radj) -> List[SparseChain]:
    """Re-join chains split by sequencing errors.

    A single error re-selects minimizers locally, so a true chain loses
    one kmer-edge and breaks into a DEAD-END tail and a DEAD-START head
    whose sequences still overlap by k-d exact bases (d <= gap, the
    distance between the flanking selected k-mers).  The reference's
    dense graph sees every k-mer and never breaks here (README.md:158
    claims sparse ~= dense contiguity); this pass restores that by
    merging on a unique maximal exact overlap in [k-gap, k-1], required
    unique in BOTH directions (repeat-ambiguous joins stay split).
    Mirror chains join symmetrically, preserving twin pairing."""
    k, gap = g.k, g.gap
    min_ov = max(k - gap, 12)
    m = min_ov
    comp = bytes.maketrans(b"ACGTN", b"TGCAN")

    heads: Dict[str, List[int]] = {}
    for j, ch in enumerate(chains):
        if radj.get(ch.start, 0) == 0 and len(ch.seq) >= k:
            heads.setdefault(ch.seq[:m], []).append(j)
    succ_cand: Dict[int, set] = {}
    pred_cand: Dict[int, set] = {}
    best_ov: Dict[Tuple[int, int], int] = {}
    for i, ch in enumerate(chains):
        if adj.get(ch.end) or len(ch.seq) < k:
            continue  # ends at a branch, not an error break
        rc_i = ch.seq.encode().translate(comp)[::-1].decode()
        for L in range(min(k - 1, len(ch.seq)), min_ov - 1, -1):
            probe = ch.seq[len(ch.seq) - L : len(ch.seq) - L + m]
            for j in heads.get(probe, ()):
                if j == i:
                    continue
                cj = chains[j]
                if L > len(cj.seq) or ch.seq[-L:] != cj.seq[:L]:
                    continue
                if cj.seq == rc_i:
                    continue  # hairpin to own twin
                succ_cand.setdefault(i, set()).add(j)
                pred_cand.setdefault(j, set()).add(i)
                best_ov.setdefault((i, j), L)
    nxt: Dict[int, int] = {}
    for i, s in succ_cand.items():
        if len(s) != 1:
            continue
        j = next(iter(s))
        if len(pred_cand.get(j, ())) == 1:
            nxt[i] = j
    if not nxt:
        return chains
    has_pred = set(nxt.values())
    used = [False] * len(chains)
    out: List[SparseChain] = []
    for i in range(len(chains)):
        if used[i] or i in has_pred:
            continue
        run = [i]
        used[i] = True
        cur = i
        while cur in nxt and not used[nxt[cur]]:
            cur = nxt[cur]
            run.append(cur)
            used[cur] = True
        if len(run) == 1:
            out.append(chains[i])
            continue
        seq = chains[run[0]].seq
        covw = chains[run[0]].cov * len(seq)
        nodes = list(chains[run[0]].nodes)
        for a, b in zip(run, run[1:]):
            L = best_ov[(a, b)]
            nxt_ch = chains[b]
            seq += nxt_ch.seq[L:]
            covw += nxt_ch.cov * (len(nxt_ch.seq) - L)
            nodes.extend(nxt_ch.nodes)
        out.append(SparseChain(
            seq=seq, cov=covw / max(len(seq), 1),
            start=chains[run[0]].start, end=chains[run[-1]].end,
            nodes=nodes, first_cov=chains[run[0]].first_cov,
            first_bases=chains[run[0]].first_bases,
        ))
    # cycle leftovers (every member has a pred): emit unmerged
    for i in range(len(chains)):
        if not used[i]:
            out.append(chains[i])
            used[i] = True
    return out


def _delete_edge_record(g: SparseGraph, st, bases, dst) -> bool:
    """Delete the underlying g.edges record behind the oriented edge
    (st --bases--> dst), whether it was observed directly or as the
    twin mirror (see _adjacency's mirror construction)."""
    el, b0, b1 = _pack_bases(bases)
    key = (st[0], st[1], el, b0, b1)
    if key in g.edges:
        del g.edges[key]
        return True
    # the edge was the mirror of a record whose src is flip(dst): its
    # bases are comp(reverse(first m bases of seq(st)))
    src_str = _seq_of_state(g, st)
    m = len(bases)
    mbases = tuple(
        (3 - int(kops._BASE_FROM_CHAR[ord(c)])) & 3
        for c in reversed(src_str[:m])
    )
    el, b0, b1 = _pack_bases(mbases)
    key = (dst[0], 1 - dst[1], el, b0, b1)
    if key in g.edges:
        del g.edges[key]
        return True
    return False


def collapse_sparse_arms(g: SparseGraph, max_rounds: int = 4) -> int:
    """Bubble/branch ARM-PAIR collapse on the sparse chain graph.

    A sequencing error inside the gap between two selected nodes spawns
    a minority parallel arm between the same branch-state pair — either
    a direct error EDGE or a short error-node detour.  The dense path
    cleans these with tour-bus on the k-mer graph (bubble.c), but the
    sparse graph contracts before conversion, so its arms exceed the
    dense tour-bus window and every surviving error arm breaks a chain
    at both endpoints (the r4 contiguity gap: 0.78x the dense bar).
    The reference's own pruning is absolute-cov only
    (sparsePregraph/build_edge.cpp:52); this pass is the relative
    minority test the chain graph needs: parallel arms between the same
    (start, end) states collapse onto the strongest arm when the
    minority carries <1/4 of its support (the removeMinorTips ratio),
    iterated with tip clipping to fixpoint."""
    total = 0
    for _ in range(max_rounds):
        chains = sparse_chains(g)
        groups: Dict[Tuple, List[SparseChain]] = {}
        for ch in chains:
            if len(ch.nodes) < 2:
                continue
            groups.setdefault((ch.start, ch.end), []).append(ch)
        removed = 0
        for (s, e), arms in groups.items():
            if len(arms) < 2:
                continue
            arms.sort(key=lambda c: (-c.first_cov, -c.cov, c.seq))
            keep = arms[0]
            for arm in arms[1:]:
                minority = (arm.first_cov * 4 <= keep.first_cov
                            or arm.cov * 4 <= keep.cov)
                if not minority:
                    continue
                interior = [ni for ni in arm.nodes[1:-1]
                            if ni != s[0] and ni != e[0]]
                if interior:
                    for ni in interior:
                        if g.node_cov[ni]:
                            g.node_cov[ni] = 0
                            removed += 1
                elif _delete_edge_record(g, arm.start, arm.first_bases, e):
                    removed += 1
        if not removed:
            break
        total += removed
        g.edges = {
            key: c for key, c in g.edges.items() if g.node_cov[key[0]] > 0
        }
    return total


def remove_sparse_tips(g: SparseGraph, max_rounds: int = 5) -> int:
    """Sparse-graph tip clipping (removeMinorTips, build_edge.cpp:256):
    dead-end chains shorter than 2k bases whose attachment edge carries a
    minority (< 1/4) of the branch's outgoing coverage are deleted,
    iterated to fixpoint.  Mirror chains make the one-sided (dead END)
    test cover dead-start tips too."""
    total = 0
    for _ in range(max_rounds):
        adj, radj = _adjacency(g)
        removed = 0
        for ch in sparse_chains(g):
            if len(ch.nodes) < 2 or len(ch.seq) >= 2 * g.k:
                continue
            dead_end = len(adj.get(ch.end, ())) == 0
            dead_start = radj.get(ch.start, 0) == 0
            if not dead_end or dead_start:  # isolated handled by cov cutoffs
                continue
            competing = sum(c for _, _, c in adj.get(ch.start, ()))
            if ch.first_cov * 4 > competing:
                continue
            for ni in ch.nodes[1:]:  # keep the attachment branch node
                if g.node_cov[ni]:
                    g.node_cov[ni] = 0
                    removed += 1
        total += removed
        if not removed:
            break
    # drop edges whose src got deleted (dst checks happen in _adjacency)
    if total:
        g.edges = {
            key: c for key, c in g.edges.items() if g.node_cov[key[0]] > 0
        }
    return total


def sparse_to_unitigs(g: SparseGraph) -> List[Tuple[str, float]]:
    """(sequence, mean_node_cov) per unitig, each reported once in the
    lexicographically smaller orientation."""
    comp = bytes.maketrans(b"ACGTN", b"TGCAN")
    dedup: Dict[str, Tuple[str, float]] = {}
    for ch in sparse_chains(g, join_splits=True):
        rc = ch.seq.encode().translate(comp)[::-1].decode()
        key = min(ch.seq, rc)
        if key not in dedup or len(ch.seq) > len(dedup[key][0]):
            dedup[key] = (key, ch.cov)
    return list(dedup.values())


def write_sparse_pregraph_files(
    g: SparseGraph, prefix: str, max_rd_len: int, only: str = "all",
) -> int:
    """Emit standard pregraph stage files from the sparse graph
    (convert_soapdenovo.cpp:248 + build_preArc.cpp roles): *.edge.gz,
    *.vertex, *.preArc, *.preGraphBasic — so the standard ``contig`` stage
    runs on sparse output unchanged.  Chains share junction k-mers, the
    same k-base overlap convention as dense edges.

    preArc multiplicity is the per-pair read TRANSIT count
    (build_preArc.cpp:1043): the number of reads observed crossing the
    junction node from chain i's last kmer-edge into chain j's first
    kmer-edge, both strands summed.  Pairs with zero recorded transits
    (or pre-transit checkpoints) fall back to the successor chain's
    first kmer-edge coverage so graph connectivity is preserved.

    Returns the number of undirected edge records."""
    from ..io import files as fio

    chains = sparse_chains(g, join_splits=True)
    n = len(chains)
    comp = bytes.maketrans(b"ACGTN", b"TGCAN")

    def flip(st):
        return (st[0], 1 - st[1])

    key_of = {
        (ch.seq, ch.start, ch.end): i for i, ch in enumerate(chains)
    }
    twin = list(range(n))
    for i, ch in enumerate(chains):
        rcseq = ch.seq.encode().translate(comp)[::-1].decode()
        j = key_of.get((rcseq, flip(ch.end), flip(ch.start)))
        twin[i] = j if j is not None else i
    # undirected reps in deterministic order (edge_file_order convention:
    # the rep is the direction with the lexicographically smaller seq)
    reps: List[int] = []
    seen = [False] * n
    for i in sorted(range(n), key=lambda x: (chains[x].seq, x)):
        if seen[i]:
            continue
        j = twin[i]
        rep = i if chains[i].seq <= chains[j].seq else j
        reps.append(rep)
        seen[i] = seen[j] = True
    dir_to_file: Dict[int, int] = {}
    fid = 1
    for rep in reps:
        j = twin[rep]
        dir_to_file[rep] = fid
        if j != rep:
            dir_to_file[j] = fid + 1
            fid += 2
        else:
            fid += 1

    def records():
        for rep in reps:
            ch = chains[rep]
            bal = 1 if twin[rep] != rep else 0
            yield (len(ch.seq) - g.k, ch.seq,
                   min(int(round(ch.cov * 10)), 16000), bal)

    n_rec = 0
    if only in ("all", "edges"):
        n_rec = fio.write_edges(prefix, g.k, records())
        vset = sorted(
            {ch.start[0] for ch in chains} | {ch.end[0] for ch in chains}
        )
        if vset:
            vkeys = g.node_words[np.asarray(vset, np.int64)]
        else:
            vkeys = np.zeros((0, g.node_words.shape[1]), np.uint32)
        n_vertex = fio.write_vertex(prefix, vkeys, g.k)
        fio.write_pre_graph_basic(prefix, n_vertex, g.k, fid - 1, max_rd_len)
    if only == "edges":
        return n_rec

    starts: Dict[Tuple[int, int], List[int]] = {}
    for i, ch in enumerate(chains):
        if ch.first_cov:  # isolated single-node chains have no junctions
            starts.setdefault(ch.start, []).append(i)
    rows: List[Tuple[int, int]] = []
    mult: List[int] = []
    for i, ch in enumerate(chains):
        if not ch.first_cov:
            continue
        # in-edge (last edge of chain i) keyed by its mirror bases ==
        # the twin chain's first edge bases
        el_in, mb0, mb1 = _pack_bases(chains[twin[i]].first_bases)
        for j in starts.get(ch.end, ()):
            rows.append((dir_to_file[i], dir_to_file[j]))
            # per-pair read transit count (build_preArc.cpp:1043): reads
            # crossing the junction via (last edge of i, first edge of j).
            # Each directed row carries ONLY its own strand's count —
            # the reverse-strand observation lives on the mirrored pair
            # tw(j) -> tw(i) at the flipped junction, and load-time
            # symmetrization (add1Arc, loadPreGraph.c:579; repo
            # checkpoint.py load_contig_graph) adds the twin row's
            # weight, reproducing the reference per-arc multiplicity.
            el_out, ob0, ob1 = _pack_bases(chains[j].first_bases)
            t_fwd = g.transits.get((ch.end[0], ch.end[1], el_in, mb0, mb1,
                                    el_out, ob0, ob1), 0)
            t_rev = g.transits.get((ch.end[0], 1 - ch.end[1], el_out, ob0,
                                    ob1, el_in, mb0, mb1), 0)
            # zero transits on BOTH strands (no single read spans both
            # kmer-edges, e.g. coverage split across strands at low
            # depth): keep the pair for connectivity with the
            # successor-cov approximation, consistently in both rows
            mult.append(t_fwd if (t_fwd + t_rev) > 0
                        else chains[j].first_cov)
    order = sorted(range(len(rows)), key=lambda x: rows[x])
    fio.write_pre_arcs(
        prefix,
        np.asarray([rows[x] for x in order], np.int64).reshape(-1, 2),
        np.asarray([mult[x] for x in order], np.int64),
    )
    return n_rec
