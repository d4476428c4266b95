"""Pregraph stage: reads -> k-mer table -> pruned graph -> edges -> preArcs.

TPU-native counterpart of standardPregraph/pregraph.c ``call_pregraph:62``
and the two full read streams that dominate its runtime
(prlHashReads.c ``prlRead2HashTable:304`` — the count pass — and
prlRead2path.c ``prlRead2edge:786`` — the arc pass).  Each stream is:
host decode -> (B, L) uint8 code batches -> device rolling k-mer
extraction -> sort/segment-reduce -> merge, with the table capacity grown
in powers of two (recompiles amortize out).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AssemblyConfig
from ..io import reads as rio
from ..ops import kmer as kops
from ..ops import sortcount as sc
from . import edges as edge_mod
from . import kmer_graph as kg

log = logging.getLogger("soapdenovo2_tpu.pregraph")


def _next_pow2(x: int) -> int:
    return 1 << max(10, (x - 1).bit_length())


def count_reads_to_table(
    batches: Iterable[rio.ReadBatch],
    k: int,
    max_len: int,
    init_capacity: int = 1 << 20,
) -> Tuple[sc.KmerTable, int]:
    """Stream read batches into a merged, sorted k-mer table.

    Returns (table, n_reads).  Per batch: extract -> flatten -> local
    sort/count.  Batch tables are held in a pending list and merged into
    the running table only once their total size reaches the table size
    (LSM-style deferred merging — amortized O(n log n) instead of the
    O(n_batches * table) of merge-per-batch).  The NEXT batch is shipped
    to the device before the current result is consumed, overlapping host
    decode with device compute (the reference's AIO double-buffering
    role, prlHashReads.c:762).
    """
    kops.validate_k(k)
    table = sc.empty_table(init_capacity, k)
    capacity = init_capacity
    n_reads = 0
    pending: list = []
    pending_rows = 0  # upper bound on pending live rows (static shapes)
    n_bound = 0  # upper bound on table live entries — NO device readback
    FLUSH_N = 32  # constant merge fan-in => one XLA shape per capacity

    @jax.jit
    def batch_table(codes, lengths):
        out = kops.extract_kmers(codes, lengths, k)
        b, p, w = out["words"].shape
        words = out["words"].reshape(b * p, w)
        valid = out["valid"].reshape(b * p)
        left = out["left"].reshape(b * p)
        right = out["right"].reshape(b * p)
        # RAW batch tables (no per-batch sort or reduce): merge_many
        # sorts and reduces everything once per FLUSH_N batches, and
        # saturating addition makes the deferred reduction exact
        return sc.count_batch(words, valid, left, right, b * p,
                              compact=False)

    def flush():
        nonlocal table, capacity, pending, pending_rows, n_bound
        if not pending:
            return
        # pad to the constant fan-in with empty same-shape tables so the
        # fused merge compiles once per table capacity
        batch_cap = pending[0].keys.shape[0]
        while len(pending) < FLUSH_N:
            pending.append(sc.empty_table(batch_cap, k))
        # growth check on a HOST-side upper bound (device readbacks cost
        # seconds over the tunnel).  Raw pending rows hugely overcount
        # unique keys, so when the bound trips, first collapse the pending
        # batches ALONE (capacity == row count: truncation-free and
        # exact), then read the true counts once and grow only if needed.
        if n_bound + pending_rows > capacity:
            l1 = sc.merge_many(tuple(pending), pending_rows)
            tn, ln = (int(v) for v in np.asarray(
                jnp.stack([table.n, l1.n])
            ))  # ONE stacked readback
            if tn + ln > capacity:
                capacity = _next_pow2((tn + ln) * 2)
                grown = sc.empty_table(capacity, k)
                grown = grown._replace(
                    keys=grown.keys.at[: table.keys.shape[0]].set(table.keys),
                    covs=grown.covs.at[: table.covs.shape[0]].set(table.covs),
                    n=table.n,
                )
                table = grown
            table = sc.merge_many((table, l1), capacity)
            n_bound = tn + ln
        else:
            table = sc.merge_many(tuple([table] + pending), capacity)
            n_bound += pending_rows
        pending = []
        pending_rows = 0

    in_flight = None  # (device codes, device lengths, n)
    for batch in batches:
        batch = batch.trimmed()
        dev = (jnp.asarray(batch.codes), jnp.asarray(batch.lengths), batch.n)
        if in_flight is not None:
            codes_d, lengths_d, n = in_flight
            n_reads += n
            bt = batch_table(codes_d, lengths_d)
            pending.append(bt)
            pending_rows += bt.keys.shape[0]
            if len(pending) >= FLUSH_N:
                flush()
        in_flight = dev
    if in_flight is not None:
        codes_d, lengths_d, n = in_flight
        n_reads += n
        bt = batch_table(codes_d, lengths_d)
        pending.append(bt)
        pending_rows += bt.keys.shape[0]
    flush()
    return table, n_reads


def shrink_table(table: sc.KmerTable, k: int) -> sc.KmerTable:
    """Trim capacity to the next power of two above the live count."""
    n = int(table.n)
    cap = _next_pow2(n + 1)
    if cap >= table.keys.shape[0]:
        return table
    return sc.KmerTable(
        keys=table.keys[:cap], covs=table.covs[:cap], n=table.n
    )


# ---------------------------------------------------------------------------
# Arc pass: read -> edge paths -> preArcs
# ---------------------------------------------------------------------------


def _last_seen_scan(hits):
    """Per row: value of the last non-negative entry strictly before p."""
    def combine(a, b):
        return jnp.where(b >= 0, b, a)

    prev = jax.lax.associative_scan(combine, hits, axis=1)
    # shift right by one: position p sees the scan up to p-1
    shifted = jnp.concatenate(
        [jnp.full_like(prev[:, :1], -1), prev[:, :-1]], axis=1
    )
    return shifted


@dataclasses.dataclass
class ArcAccumulator:
    """Sorted (from_edge, to_edge) -> multiplicity table built by merges.

    Replaces the reference's per-thread preArc memory managers + lookup
    lists (prlRead2path.c ``thread_add1preArc:388``) with sort/segment
    reduction over packed 2-word keys.
    """

    keys: jax.Array  # (C, 2) uint32 — [from, to], sentinel tail
    mult: jax.Array  # (C,) int32
    n: jax.Array

    @staticmethod
    def empty(capacity: int = 1 << 16) -> "ArcAccumulator":
        return ArcAccumulator(
            keys=jnp.full((capacity, 2), 0xFFFFFFFF, jnp.uint32),
            mult=jnp.zeros((capacity,), jnp.int32),
            n=jnp.zeros((), jnp.int32),
        )

    def add_pairs(self, from_e, to_e, valid) -> "ArcAccumulator":
        batch = _arc_batch_table(from_e, to_e, valid)
        return self.merge(batch)

    def grow_to(self, cap: int) -> "ArcAccumulator":
        if cap <= self.keys.shape[0]:
            return self
        grown = ArcAccumulator.empty(cap)
        return dataclasses.replace(
            grown,
            keys=grown.keys.at[: self.keys.shape[0]].set(self.keys),
            mult=grown.mult.at[: self.mult.shape[0]].set(self.mult),
            n=self.n,
        )

    def merge(self, other: "ArcAccumulator") -> "ArcAccumulator":
        need = int(self.n) + int(other.n)
        cap = self.keys.shape[0]
        while need > cap:
            cap *= 2
        self = self.grow_to(cap)
        return _merge_arcs_many((self, other), cap)


@jax.jit
def _arc_batch_table(from_e, to_e, valid) -> ArcAccumulator:
    """RAW per-batch arc table: no sort, duplicates uncollapsed, every
    valid row live with mult 1.  Arc multiplicity addition is plain (not
    saturating), so deferring ALL reduction to the LSM flush is exact and
    the per-batch sort would be pure overhead (same argument as the raw
    count-pass tables, sortcount.count_batch compact=False)."""
    keys = jnp.stack(
        [
            jnp.where(valid, from_e, -1).astype(jnp.uint32),
            jnp.where(valid, to_e, -1).astype(jnp.uint32),
        ],
        axis=1,
    )
    mult = valid.astype(jnp.int32)
    return ArcAccumulator(
        keys=keys, mult=mult, n=jnp.sum(valid.astype(jnp.int32))
    )


@functools.partial(jax.jit, static_argnames=("capacity",))
def _merge_arcs_many(tables, capacity: int) -> ArcAccumulator:
    """Merge any number of arc tables in ONE sort + segment-reduce
    (the LSM flush of the arc pass, mirroring sortcount.merge_many)."""
    keys = jnp.concatenate([t.keys for t in tables], axis=0)
    mult = jnp.concatenate([t.mult for t in tables], axis=0)
    sk, perm = sc.argsort_kmers(keys)
    mult = mult[perm]
    # mult values are unbounded -> full-range (16-bit split) scan path
    ukeys, sums, n_live = sc.reduce_sorted_groups(
        sk, mult[:, None], capacity, exact_max=None
    )
    return ArcAccumulator(keys=ukeys, mult=sums[:, 0], n=n_live)


jax.tree_util.register_dataclass(
    ArcAccumulator, data_fields=["keys", "mult", "n"], meta_fields=[]
)


def read_paths_batch(
    codes,
    lengths,
    k: int,
    table_keys,
    state_edge,
    state_rank,
    patch_keys,
    patch_edge,
    patch_twin,
):
    """Map one read batch onto edges; emit per-position edge hits.

    Returns hits (B, P) int32 edge ids (-1 = none), the vectorized analog
    of prlRead2path.c ``searchKmer:348`` + ``parse1read`` + the
    ``search1kmerPlus:550`` patch lookups.
    """
    out = kops.extract_kmers(codes, lengths, k)
    idx = sc.lookup_kmers(table_keys, out["words"])  # (B, P)
    orient = out["is_rc"].astype(jnp.int32)
    state = jnp.where(idx >= 0, idx * 2 + orient, 0)
    hit = jnp.where(
        (idx >= 0) & out["valid"], state_edge[state], -1
    )
    if patch_keys.shape[0] > 0:
        out1 = kops.extract_kmers(codes, lengths, k + 1)
        pidx = sc.lookup_kmers(patch_keys, out1["words"])  # (B, P1)
        p_or = out1["is_rc"]
        p_hit = jnp.where(
            (pidx >= 0) & out1["valid"],
            jnp.where(p_or, patch_twin[jnp.maximum(pidx, 0)], patch_edge[jnp.maximum(pidx, 0)]),
            -1,
        )
        # pad to P positions (P1 = P - 1)
        pad = jnp.full((p_hit.shape[0], hit.shape[1] - p_hit.shape[1]), -1, jnp.int32)
        p_hit = jnp.concatenate([p_hit, pad], axis=1)
        hit = jnp.where(hit >= 0, hit, p_hit)
    return hit


@functools.partial(jax.jit, static_argnames=("k",))
def _arc_pairs_from_batch(codes, lengths, k, table_keys, state_edge, state_rank,
                          patch_keys, patch_edge, patch_twin):
    hits = read_paths_batch(
        codes, lengths, k, table_keys, state_edge, state_rank,
        patch_keys, patch_edge, patch_twin,
    )
    prev = _last_seen_scan(hits)
    is_arc = (hits >= 0) & (prev >= 0) & (hits != prev)
    return prev.reshape(-1), hits.reshape(-1), is_arc.reshape(-1), hits


def build_arcs(
    batches: Iterable[rio.ReadBatch],
    eg: edge_mod.EdgeGraph,
    table: sc.KmerTable,
    k: int,
    record_paths: bool = False,
) -> Tuple[ArcAccumulator, np.ndarray, Optional[List[np.ndarray]]]:
    """Second read stream: accumulate preArcs (and optionally read paths).

    Returns (arcs, marker_on_edge, paths).  ``marker_on_edge`` counts reads
    whose collapsed path (>=3 edges) crosses each edge, capped at 255
    (prlRead2path.c ``recordPathBin:482``).
    """
    arcs = ArcAccumulator.empty()
    capacity = arcs.keys.shape[0]
    state_edge = jnp.asarray(eg.state_edge)
    state_rank = jnp.asarray(eg.state_rank)
    patch_keys = jnp.asarray(eg.patch_keys)
    patch_edge = jnp.asarray(eg.patch_edge)
    patch_twin = jnp.asarray(eg.patch_twin)
    marker = np.zeros((eg.n_edges,), np.int32)
    paths: Optional[List[np.ndarray]] = [] if record_paths else None
    pending: list = []
    pending_rows = 0
    n_bound = 0  # host-side upper bound on live arcs (readback-free)
    FLUSH_N = 32  # constant merge fan-in => one XLA shape per capacity

    def flush():
        nonlocal arcs, capacity, pending, pending_rows, n_bound
        if not pending:
            return
        batch_cap = pending[0].keys.shape[0]
        while len(pending) < FLUSH_N:
            pending.append(ArcAccumulator.empty(batch_cap))
        if n_bound + pending_rows > capacity:
            # collapse pending alone (exact), then one stacked readback
            l1 = _merge_arcs_many(tuple(pending), pending_rows)
            an, ln = (int(v) for v in np.asarray(
                jnp.stack([arcs.n, l1.n])
            ))
            while an + ln > capacity:
                capacity *= 2
            arcs = arcs.grow_to(capacity)
            arcs = _merge_arcs_many((arcs, l1), capacity)
            n_bound = an + ln
        else:
            arcs = arcs.grow_to(capacity)
            arcs = _merge_arcs_many(tuple([arcs] + pending), capacity)
            n_bound += pending_rows
        pending = []
        pending_rows = 0

    def consume(prev, hit, is_arc, hits2d, n_rows):
        nonlocal pending, pending_rows
        bt = _arc_batch_table(prev, hit, is_arc)
        pending.append(bt)
        pending_rows += bt.keys.shape[0]
        if len(pending) >= FLUSH_N:
            flush()
        if record_paths:
            h = np.asarray(hits2d)[:n_rows]
            for row in h:
                path = _collapse_path(row)
                if len(path) >= 3:
                    paths.append(path)
                    marker[path] = np.minimum(marker[path] + 1, 255)

    in_flight = None  # ship next batch to device before consuming current
    for batch in batches:
        batch = batch.trimmed()
        dev = (jnp.asarray(batch.codes), jnp.asarray(batch.lengths), batch.n)
        if in_flight is not None:
            codes_d, lengths_d, n = in_flight
            consume(*_arc_pairs_from_batch(
                codes_d, lengths_d, k, table.keys, state_edge, state_rank,
                patch_keys, patch_edge, patch_twin,
            ), n)
        in_flight = dev
    if in_flight is not None:
        codes_d, lengths_d, n = in_flight
        consume(*_arc_pairs_from_batch(
            codes_d, lengths_d, k, table.keys, state_edge, state_rank,
            patch_keys, patch_edge, patch_twin,
        ), n)
    flush()
    return arcs, marker, paths


def _collapse_path(row: np.ndarray) -> np.ndarray:
    row = row[row >= 0]
    if row.size == 0:
        return row
    keep = np.ones(row.shape, bool)
    keep[1:] = row[1:] != row[:-1]
    return row[keep]


# ---------------------------------------------------------------------------
# Full stage driver
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PregraphResult:
    k: int
    table: sc.KmerTable
    graph: kg.PreGraph
    edges: edge_mod.EdgeGraph
    arcs: ArcAccumulator
    marker_on_edge: np.ndarray
    paths: Optional[List[np.ndarray]]
    kmer_freq: np.ndarray
    n_reads: int
    max_read_len: int


def run_pregraph(
    cfg: AssemblyConfig,
    k: int,
    d_cutoff: int = 0,
    record_paths: bool = False,
    batch_size: int = 16384,
    genome_size: int = 0,
    progress: bool = True,
) -> PregraphResult:
    """pregraph.c call_pregraph:62, end to end in memory."""
    t0 = time.time()
    max_len = cfg.max_rd_len

    from ..io import native_reads

    def read_batches():
        for lib in cfg.libs_for_contig():
            yield from native_reads.batch_reads_lib(lib, batch_size, max_len)

    # -z genome-size hint pre-sizes the table so capacity never grows
    # mid-stream (each growth is a fresh XLA merge shape)
    init_cap = _next_pow2(int(genome_size * 1.7)) if genome_size else 1 << 20
    table, n_reads = count_reads_to_table(
        read_batches(), k, max_len, init_capacity=init_cap
    )
    table = shrink_table(table, k)
    if progress:
        log.info(
            "count pass: %d reads -> %d kmers (%.1fs)",
            n_reads, int(table.n), time.time() - t0,
        )

    g = kg.from_table(table)
    if d_cutoff > 0:
        g = kg.de_low_cov(g, jnp.int32(d_cutoff))
    g = kg.mark_linear(g)
    freq = np.asarray(kg.kmer_freq_hist(g))

    g, n_single = kg.remove_single_tips(g, k)
    g, n_minor = kg.remove_minor_tips(g, k)
    if progress:
        # one combined readback — every device->host sync costs seconds
        # over the remote-device tunnel
        ns, nm = np.asarray(jnp.stack([n_single, n_minor]))
        log.info("tips: %d single, %d minor removed", int(ns), int(nm))

    eg = edge_mod.build_edges(g, k)
    if progress:
        log.info("edges: %d directed (%.1fs)", eg.n_edges, time.time() - t0)

    arcs, marker, paths = build_arcs(
        read_batches(),
        eg, sc.KmerTable(keys=g.keys, covs=g.covs, n=g.n), k,
        record_paths=record_paths,
    )
    if progress:
        log.info(
            "arc pass: %d preArcs (%.1fs)", int(arcs.n), time.time() - t0
        )
    return PregraphResult(
        k=k,
        table=table,
        graph=g,
        edges=eg,
        arcs=arcs,
        marker_on_edge=marker,
        paths=paths,
        kmer_freq=freq,
        n_reads=n_reads,
        max_read_len=max_len,
    )
