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
import os
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


# one LSM merge program peaks at ~6x the table bytes; past 2^25 rows per
# operand the 128M-row merge alone exceeds a 16 GB chip's HBM (measured:
# 18.4 G needed at 2^27 capacity, the 50 Mb OOM).  Larger tables run the
# PREFIX-PARTITIONED path: P key-range partitions, each its own bounded
# LSM table, concatenated order-preserving at the end — the single-chip
# sequential analog of the multi-chip hash sharding.
PARTITION_ROWS = 1 << 24


@functools.partial(jax.jit, static_argnames=("out_rows",))
def _slice_sorted_run(keys, covs, lo, hi, out_rows: int):
    """Rows [lo, hi) of a sorted run rotated to the front and truncated
    to ``out_rows`` (static; callers size it from the known partition
    sizes so nothing drops), sentinel tail.  lo/hi are traced scalars."""
    k2 = jnp.roll(keys, -lo, axis=0)[:out_rows]
    c2 = jnp.roll(covs, -lo, axis=0)[:out_rows]
    m = jnp.arange(out_rows, dtype=jnp.int32) < (hi - lo)
    k2 = jnp.where(m[:, None], k2, jnp.uint32(0xFFFFFFFF))
    c2 = jnp.where(m[:, None], c2, jnp.uint16(0))
    return sc.KmerTable(keys=k2, covs=c2, n=(hi - lo).astype(jnp.int32))


def _finalize_partitioned(tables, k: int, d_cutoff: int) -> sc.KmerTable:
    """Per-partition -d prune + compaction, then order-preserving
    concatenation into one dense sorted table (partitions are key
    ranges, so concatenation IS the globally sorted table)."""
    P = len(tables)
    pruned = []
    for t in tables:
        g = kg.from_table(t)
        if d_cutoff > 0:
            g = kg.de_low_cov(g, jnp.int32(d_cutoff))
        pruned.append(g)
    lives = np.asarray(
        jnp.stack([jnp.sum((~g.deleted).astype(jnp.int32))
                   for g in pruned])
    )
    u_cap = _next_pow2(int(lives.max()) + 1)
    total = int(lives.sum())
    w = tables[0].keys.shape[1]
    final_cap = _next_pow2(total + u_cap)
    fk = jnp.full((final_cap, w), 0xFFFFFFFF, jnp.uint32)
    fc = jnp.zeros((final_cap, sc.N_COV), jnp.uint16)
    off = 0
    for g, lv in zip(pruned, lives):
        gc = kg._compact_to(g, min(u_cap, g.keys.shape[0]))
        fk = jax.lax.dynamic_update_slice(fk, gc.keys, (off, 0))
        fc = jax.lax.dynamic_update_slice(fc, gc.covs, (off, 0))
        off += int(lv)
    return sc.KmerTable(keys=fk, covs=fc, n=jnp.int32(total))


def count_reads_to_table(
    batches: Iterable[rio.ReadBatch],
    k: int,
    max_len: int,
    init_capacity: int = 1 << 20,
    device_cache: Optional[list] = None,
    partitions: int = 1,
    prune_d: int = 0,
) -> Tuple[sc.KmerTable, int]:
    """Stream read batches into a merged, sorted k-mer table.

    Returns (table, n_reads).  Per batch: extract -> 12-byte packed
    RawRows (no sort).  Every FLUSH_N batches: ONE 3-operand sort +
    segment-reduce collapses the raw rows to unique keys
    (``reduce_raws``), then a log-stage bitonic merge folds them into the
    running sorted table (``merge_sorted_tables``) — the table never
    rides the full sort network.  The NEXT batch is shipped to the device
    before the current result is consumed, overlapping host decode with
    device compute (the reference's AIO double-buffering role,
    prlHashReads.c:762).

    Growth protocol: each flush reads back ONE scalar (the true unique
    count of the reduced raws, ~25 ms on the remote tunnel) and grows the
    running table's capacity by sentinel-append (sorted order is
    preserved, so growth never re-merges).
    """
    kops.validate_k(k)
    P = max(1, partitions)
    if P > 1:
        cap_p = max(1 << 20, _next_pow2(init_capacity // P))
        tables = [sc.empty_table(cap_p, k) for _ in range(P)]
        capacity = P * cap_p
        w0b = kops.top_word_bits(k)
        # EQUAL-LOAD boundaries: canonical keys (min of kmer and its rc)
        # have density ~2(1-x) over the word0 range, so equal-width
        # partitions load linearly (measured 6.0M..0.4M across 8); the
        # quantile of p/P sits at 1 - sqrt(1 - p/P)
        fracs = 1.0 - np.sqrt(1.0 - np.arange(1, P) / P)
        bvals = jnp.asarray(
            np.minimum(
                (fracs * float(1 << w0b)).astype(np.uint64),
                (1 << w0b) - 1,
            ).astype(np.uint32)
        )
        table = None
    else:
        capacity = init_capacity
        table = sc.empty_table(capacity, k)
    n_reads = 0
    table_n = 0  # host-side upper bound on live table entries
    pending: list = []
    pending_rows = 0
    # fan-in scaled so a flush covers ~0.5M read rows regardless of the
    # batch size (bigger batches = fewer tunnel dispatches; the flush
    # working set stays constant).  Constant per batch shape => one XLA
    # shape per capacity.
    flush_n = [32]
    cache_bytes = [0]

    @jax.jit
    def batch_rows(codes, lengths):
        out = kops.extract_kmers(codes, lengths, k)
        b, p, w = out["words"].shape
        return sc.raw_rows(
            out["words"].reshape(b * p, w),
            out["valid"].reshape(b * p),
            out["left"].reshape(b * p),
            out["right"].reshape(b * p),
        )

    @functools.partial(jax.jit, static_argnames=("L",))
    def batch_rows_packed(packed, lengths, n_rows, n_cols, L):
        # 2-bit packed upload (4x less tunnel traffic); unpack on device
        codes = kops.unpack_codes(packed, lengths, L, n_rows, n_cols)
        return batch_rows.__wrapped__(codes, lengths)

    def ship(batch):
        """Start the host->device transfer for one batch; returns a
        thunk producing the raw rows."""
        L = batch.codes.shape[1]
        pi = kops.pack_codes_host(batch.codes, batch.lengths)
        if pi is None:  # N-heavy batch: unpacked fallback
            codes_d = jnp.asarray(batch.codes)
            lengths_d = jnp.asarray(batch.lengths)
            if device_cache is not None:
                device_cache.append(None)  # cache unusable for this run
            return lambda: batch_rows(codes_d, lengths_d)
        packed, nr, nc = pi
        args = (jnp.asarray(packed), jnp.asarray(batch.lengths),
                jnp.asarray(nr), jnp.asarray(nc))
        if device_cache is not None:
            # the packed batch stays HBM-resident (~0.4 MB each): the arc
            # pass replays it without a second decode + tunnel upload.
            # Budgeted: past ~2 GB the cache is abandoned (None marker)
            # and the arc pass re-streams — unbounded retention would
            # OOM HBM at human-scale read volumes
            cache_bytes[0] += packed.nbytes + 4 * packed.shape[0]
            if cache_bytes[0] <= (2 << 30):
                device_cache.append((args, L, batch.n))
            elif not device_cache or device_cache[-1] is not None:
                # abandoned: DROP the resident entries too — 2 GB of HBM
                # held for a cache that will never be replayed starves
                # the large-table merges
                device_cache[:] = [None]
        return lambda: batch_rows_packed(*args, L=L)

    part_n = np.zeros((P,), np.int64)  # per-partition live counts

    def flush():
        nonlocal table, capacity, pending, pending_rows, table_n, tables, \
            cap_p, part_n
        if not pending:
            return
        batch_cap = pending[0].keys.shape[0]
        # pow2 fan-in bounded by flush_n: a rows-triggered early flush
        # (small table capacity) must not pad back up to the full fan-in
        # — the 34M-row sort against a 4M-row table blew HBM at 2 Mb
        target = min(flush_n[0],
                     1 << max(len(pending) - 1, 0).bit_length())
        while len(pending) < target:
            pending.append(sc.empty_raw(batch_cap, k))
        rcap = min(capacity, pending_rows)
        l1 = sc.reduce_raws(tuple(pending), rcap)
        ln = int(l1.n)  # ONE scalar readback per flush
        if ln > rcap:  # truncated: redo at a truncation-free capacity
            rcap = _next_pow2(ln)
            l1 = sc.reduce_raws(tuple(pending), rcap)
        if P > 1:
            # key-range split of the sorted run; per-partition bounded
            # merges keep every program under the HBM ceiling
            b = jnp.searchsorted(l1.keys[:, 0], bvals).astype(jnp.int32)
            bounds = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), b,
                 l1.n[None].astype(jnp.int32)]
            )
            bnp = np.asarray(bounds)
            run_sizes = np.diff(bnp)
            need = int((part_n + run_sizes).max())
            if need > cap_p:
                # modest headroom only: P resident tables make doubling
                # ruinous (x2 growth at 18M live = 8 x 64M x 26 B = 13 GB
                # resident, the 50 Mb ResourceExhausted)
                cap_p = _next_pow2(int(need * 1.25))
                tables = [sc.grow_table(t, cap_p) for t in tables]
                capacity = P * cap_p
            # tight static run buffer: the merge network pads to the
            # combined pow2, so an rcap-sized operand would quadruple
            # every per-partition merge
            run_cap = _next_pow2(int(run_sizes.max()) + 1)
            log.debug("partition flush: P=%d cap_p=%d run_cap=%d rcap=%d "
                      "l1=%s runs=%s", P, cap_p, run_cap,
                      l1.keys.shape[0], l1.keys.shape, run_sizes.tolist())
            prev_merged = None
            for p in range(P):
                if run_sizes[p] == 0:
                    continue
                run_p = _slice_sorted_run(l1.keys, l1.covs,
                                          bounds[p], bounds[p + 1],
                                          run_cap)
                # bound merge-workspace co-residency at TWO (async
                # dispatch would let all P go live at once — the 50 Mb
                # OOM) by blocking on partition p-1 only after p has
                # dispatched: merge p computes while p-1's completion
                # rides the tunnel.  Retry transient remote-compile
                # RESOURCE_EXHAUSTED: the compile helper fails
                # sporadically under a loaded worker, succeeding on the
                # same shape seconds later.
                for attempt in range(4):
                    try:
                        tables[p] = sc.merge_sorted_tables(
                            tables[p], run_p, cap_p)
                        if prev_merged is not None:
                            jax.block_until_ready(
                                tables[prev_merged].n)
                        prev_merged = p
                        break
                    except jax.errors.JaxRuntimeError as exc:
                        # Only the remote-COMPILE service flakes are
                        # transient; a run-time HBM OOM at this shape is
                        # deterministic and must fail fast, not stall
                        # 90 s+.  The compile-service failures carry
                        # compile/compilation markers in their text.
                        msg = str(exc)
                        transient = ("RESOURCE_EXHAUSTED" in msg and
                                     ("ompil" in msg or "XLA" in msg))
                        if not transient or attempt == 3:
                            raise
                        log.warning("partition merge retry %d (%s)",
                                    attempt + 1, msg[:80])
                        time.sleep(5 * (attempt + 1))
            part_n = np.asarray(
                jnp.stack([t.n for t in tables])
            ).astype(np.int64)
            table_n = int(part_n.sum())
            pending = []
            pending_rows = 0
            return
        if table_n + ln > capacity:
            capacity = _next_pow2((table_n + ln) * 2)
            table = sc.grow_table(table, capacity)
        table = sc.merge_sorted_tables(table, l1, capacity)
        # EXACT live count (second scalar readback per flush): the
        # ln-sum upper bound overcounts cross-flush duplicates, inflating
        # capacity (and every merge's working set) by 2-4x on real data
        table_n = int(table.n)
        pending = []
        pending_rows = 0

    in_flight = None  # (thunk, n)
    for batch in batches:
        batch = batch.trimmed()
        flush_n[0] = min(32, max(8, (32 * 16384) // batch.codes.shape[0]))
        if P > 1:
            # halve the flush working set: the 34M-row reduce beside P
            # resident partition tables was the 50 Mb runtime OOM
            # (divisor 1 measured clean twice at the 50 Mb shapes —
            # 2^27 total capacity over 8 partitions — and saves ~30
            # flush round-trips; 2 remains the escape hatch for larger
            # per-partition tables)
            div = int(os.environ.get("SOAP_COUNT_FLUSH_DIV", "1"))
            flush_n[0] = max(4, flush_n[0] // max(div, 1))
        dev = (ship(batch), batch.n)
        if in_flight is not None:
            thunk, n = in_flight
            n_reads += n
            bt = thunk()
            pending.append(bt)
            pending_rows += bt.keys.shape[0]
            if len(pending) >= flush_n[0] or pending_rows >= 2 * capacity:
                flush()
        in_flight = dev
    if in_flight is not None:
        thunk, n = in_flight
        n_reads += n
        bt = thunk()
        pending.append(bt)
        pending_rows += bt.keys.shape[0]
    flush()
    if P > 1:
        table = _finalize_partitioned(tables, k, prune_d)
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
        batch = _raw_arc_rows(from_e, to_e, valid)
        l1 = _reduce_raw_arcs((batch,), batch.keys.shape[0])
        need = int(self.n) + int(l1.n)
        cap = self.keys.shape[0]
        while need > cap:
            cap *= 2
        return _merge_sorted_arcs(self.grow_to(cap), l1, cap)

    def grow_to(self, cap: int) -> "ArcAccumulator":
        """Sentinel-append growth (sorted order is preserved)."""
        c = self.keys.shape[0]
        if cap <= c:
            return self
        return ArcAccumulator(
            keys=jnp.concatenate(
                [self.keys,
                 jnp.full((cap - c, 2), 0xFFFFFFFF, jnp.uint32)]
            ),
            mult=jnp.concatenate(
                [self.mult, jnp.zeros((cap - c,), jnp.int32)]
            ),
            n=self.n,
        )


class RawArcs:
    """Unsorted (from, to) arc observations, 8 bytes each; one row = one
    occurrence (multiplicity 1 implicit)."""

    def __init__(self, keys, n):
        self.keys = keys
        self.n = n


jax.tree_util.register_pytree_node(
    RawArcs,
    lambda r: ((r.keys, r.n), None),
    lambda _, c: RawArcs(*c),
)


@jax.jit
def _raw_arc_rows(from_e, to_e, valid) -> RawArcs:
    """RAW per-batch arc rows: no sort, no mult column — duplicates stay
    uncollapsed until the flush (arc addition is exact under any merge
    order, same argument as the raw count-pass rows)."""
    keys = jnp.stack(
        [
            jnp.where(valid, from_e, -1).astype(jnp.uint32),
            jnp.where(valid, to_e, -1).astype(jnp.uint32),
        ],
        axis=1,
    )
    return RawArcs(keys=keys, n=jnp.sum(valid.astype(jnp.int32)))


def _empty_raw_arcs(n: int) -> RawArcs:
    return RawArcs(
        keys=jnp.full((n, 2), 0xFFFFFFFF, jnp.uint32),
        n=jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("capacity",))
def _reduce_raw_arcs(raws, capacity: int) -> ArcAccumulator:
    """ONE 2-operand sort + segment-reduce over raw arc rows (the flush
    side of the arc pass; the running table merges separately)."""
    keys = jnp.concatenate([r.keys for r in raws], axis=0)
    out = jax.lax.sort((keys[:, 0], keys[:, 1]), num_keys=2)
    sk = jnp.stack(out, axis=-1)
    ones = (~sc._is_sentinel(sk)).astype(jnp.int32)
    ukeys, sums, n_live = sc.reduce_sorted_groups_shift(
        sk, ones[:, None], capacity, exact_max=1
    )
    return ArcAccumulator(keys=ukeys, mult=sums[:, 0], n=n_live)


@functools.partial(jax.jit, static_argnames=("capacity",))
def _merge_sorted_arcs(a: ArcAccumulator, b: ArcAccumulator,
                       capacity: int) -> ArcAccumulator:
    """log-stage bitonic merge of two SORTED arc tables + pairwise fold.

    Each input has unique (from, to) keys, so a key appears at most twice
    after the merge — fold the duplicate neighbour instead of running the
    general segment reduction (same working-set argument as
    sortcount.merge_sorted_tables)."""
    from ..ops import bitonic

    ops = bitonic.merge_sorted_ops(
        (a.keys[:, 0], a.keys[:, 1], a.mult.astype(jnp.uint32)),
        (b.keys[:, 0], b.keys[:, 1], b.mult.astype(jnp.uint32)),
        num_keys=2,
    )
    k0, k1, m = ops
    n = k0.shape[0]
    live = ~((k0 == jnp.uint32(0xFFFFFFFF)) & (k1 == jnp.uint32(0xFFFFFFFF)))
    m = jnp.where(live, m, 0)
    idx = jnp.arange(n)
    same_next = (
        (k0 == jnp.roll(k0, -1)) & (k1 == jnp.roll(k1, -1))
        & live & (idx < n - 1)
    )
    same_prev = jnp.concatenate([jnp.zeros((1,), bool), same_next[:-1]])
    s = jnp.where(same_next, m + jnp.roll(m, -1), m)
    head = live & ~same_prev
    packed, n_live = bitonic.compact_by_shifts(head, (k0, k1, s))
    take = min(capacity, n)
    uk0, uk1, um = (p[:take] for p in packed)
    if capacity > n:
        pad = capacity - n
        uk0 = jnp.concatenate([uk0, jnp.zeros((pad,), jnp.uint32)])
        uk1 = jnp.concatenate([uk1, jnp.zeros((pad,), jnp.uint32)])
        um = jnp.concatenate([um, jnp.zeros((pad,), jnp.uint32)])
    live_out = jnp.arange(capacity) < n_live
    ukeys = jnp.stack(
        [jnp.where(live_out, uk0, jnp.uint32(0xFFFFFFFF)),
         jnp.where(live_out, uk1, jnp.uint32(0xFFFFFFFF))], axis=-1
    )
    mult = jnp.where(live_out, um, 0).astype(jnp.int32)
    return ArcAccumulator(keys=ukeys, mult=mult,
                          n=n_live.astype(jnp.int32))


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
    table_dir=None,
    dir_steps: int = 0,
    dir_shift: int = 0,
    patch_dir=None,
    pdir_steps: int = 0,
    pdir_shift: int = 0,
):
    """Map one read batch onto edges; emit per-position edge hits.

    Returns hits (B, P) int32 edge ids (-1 = none), the vectorized analog
    of prlRead2path.c ``searchKmer:348`` + ``parse1read`` + the
    ``search1kmerPlus:550`` patch lookups.
    """
    out = kops.extract_kmers(codes, lengths, k)
    if table_dir is not None:
        idx = sc.lookup_kmers_dir(table_keys, out["words"], table_dir,
                                  dir_steps, dir_shift)  # (B, P)
    else:
        idx = sc.lookup_kmers(table_keys, out["words"])  # (B, P)
    orient = out["is_rc"].astype(jnp.int32)
    state = jnp.where(idx >= 0, idx * 2 + orient, 0)
    hit = jnp.where(
        (idx >= 0) & out["valid"], state_edge[state], -1
    )
    if patch_keys.shape[0] > 0:
        p_hit = patch_hits(out, k, patch_keys, patch_edge, patch_twin,
                           patch_dir, pdir_steps, pdir_shift)
        hit = jnp.where(hit >= 0, hit, p_hit)
    return hit


def patch_hits(out, k: int, patch_keys, patch_edge, patch_twin,
               patch_dir=None, pdir_steps: int = 0, pdir_shift: int = 0):
    """(k+1)-mer patch lookup WITHOUT a second full extraction
    (prlRead2path.c does one chop pass and search1kmerPlus:550 on top of
    it): the (k+1)-mer at position p is the forward k-mer plus the next
    base, both already produced by the k extraction ``out``."""
    from . import edges as _edges

    canon_k = out["words"]
    is_rc = out["is_rc"]
    fwd_k = jnp.where(
        is_rc[..., None], kops.reverse_complement(canon_k, k), canon_k
    )
    # forward-frame next base (undo the orientation swap of "right")
    def _comp_or_n(x):
        return jnp.where(x < kops.BASE_N, (3 - x) & 3, kops.BASE_N)

    right_f = jnp.where(
        is_rc, _comp_or_n(out["left"].astype(jnp.int32)),
        out["right"].astype(jnp.int32),
    )
    ok1 = out["valid"] & (right_f < 4)
    wide = _edges._widen_kmer(fwd_k, k)
    plus = kops.shift_left_append(
        wide, jnp.maximum(right_f, 0).astype(jnp.uint32), k + 1
    )
    rcp = kops.reverse_complement(plus, k + 1)
    canon1, rc1 = kops.canonical(plus, rcp)
    if patch_dir is not None:
        pidx = sc.lookup_kmers_dir(patch_keys, canon1, patch_dir,
                                   pdir_steps, pdir_shift)  # (B, P)
    else:
        pidx = sc.lookup_kmers(patch_keys, canon1)  # (B, P)
    return jnp.where(
        (pidx >= 0) & ok1,
        jnp.where(rc1, patch_twin[jnp.maximum(pidx, 0)],
                  patch_edge[jnp.maximum(pidx, 0)]),
        -1,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "dir_steps", "dir_shift", "L",
                              "pdir_steps", "pdir_shift")
)
def _arc_pairs_from_batch_packed(packed, lengths, n_rows, n_cols, L,
                                 k, table_keys, state_edge, state_rank,
                                 patch_keys, patch_edge, patch_twin,
                                 table_dir=None, dir_steps: int = 0,
                                 dir_shift: int = 0, patch_dir=None,
                                 pdir_steps: int = 0, pdir_shift: int = 0):
    codes = kops.unpack_codes(packed, lengths, L, n_rows, n_cols)
    return _arc_pairs_from_batch.__wrapped__(
        codes, lengths, k, table_keys, state_edge, state_rank,
        patch_keys, patch_edge, patch_twin, table_dir, dir_steps, dir_shift,
        patch_dir, pdir_steps, pdir_shift,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "dir_steps", "dir_shift",
                              "pdir_steps", "pdir_shift")
)
def _arc_pairs_from_batch(codes, lengths, k, table_keys, state_edge, state_rank,
                          patch_keys, patch_edge, patch_twin,
                          table_dir=None, dir_steps: int = 0,
                          dir_shift: int = 0, patch_dir=None,
                          pdir_steps: int = 0, pdir_shift: int = 0):
    hits = read_paths_batch(
        codes, lengths, k, table_keys, state_edge, state_rank,
        patch_keys, patch_edge, patch_twin,
        table_dir, dir_steps, dir_shift,
        patch_dir, pdir_steps, pdir_shift,
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
    cached: Optional[list] = None,
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
    # prefix directory: cuts the per-kmer lookup from log2(C) to
    # ~log2(max_bucket) dependent gathers.  Built ON DEVICE — the host
    # variant downloaded the whole key table (~128 MB at 16M kmers)
    table_dir, dsteps, dshift = sc.build_prefix_dir_device(table.keys, k)
    # (k+1)-mer patch dir: the undirected patch lookup is a ~20-step
    # bisection chain at E-scale patch tables; small runs keep the
    # bench-warmed directory-free shapes
    if eg.patch_keys.shape[0] > (1 << 20):
        patch_dir, psteps, pshift = sc.build_prefix_dir_device(
            patch_keys, k + 1)
    else:
        patch_dir, psteps, pshift = None, 0, 0
    marker = np.zeros((eg.n_edges,), np.int32)
    paths: Optional[List[np.ndarray]] = [] if record_paths else None
    pending: list = []
    pending_rows = 0
    n_bound = 0  # host-side upper bound on live arcs (readback-free)
    flush_n = [32]  # scaled per batch size below; one XLA shape per cap

    def flush():
        nonlocal arcs, capacity, pending, pending_rows, n_bound
        if not pending:
            return
        batch_cap = pending[0].keys.shape[0]
        target = min(flush_n[0],
                     1 << max(len(pending) - 1, 0).bit_length())
        while len(pending) < target:
            pending.append(_empty_raw_arcs(batch_cap))
        rcap = min(_next_pow2(capacity), _next_pow2(pending_rows))
        l1 = _reduce_raw_arcs(tuple(pending), rcap)
        ln = int(l1.n)  # ONE scalar readback per flush
        if ln > rcap:  # truncated: redo at a truncation-free capacity
            rcap = _next_pow2(ln)
            l1 = _reduce_raw_arcs(tuple(pending), rcap)
        if n_bound + ln > capacity:
            capacity = _next_pow2((n_bound + ln) * 2)
        arcs = _merge_sorted_arcs(arcs.grow_to(capacity), l1, capacity)
        n_bound = int(arcs.n)  # exact live count, see count-pass note
        pending = []
        pending_rows = 0

    def consume(prev, hit, is_arc, hits2d, n_rows):
        nonlocal pending, pending_rows
        bt = _raw_arc_rows(prev, hit, is_arc)
        pending.append(bt)
        pending_rows += bt.keys.shape[0]
        if len(pending) >= flush_n[0]:
            flush()
        if record_paths:
            h = np.asarray(hits2d)[:n_rows]
            for row in h:
                path = _collapse_path(row)
                if len(path) >= 3:
                    paths.append(path)
                    marker[path] = np.minimum(marker[path] + 1, 255)

    def ship(batch):
        L = batch.codes.shape[1]
        pi = kops.pack_codes_host(batch.codes, batch.lengths)
        if pi is None:
            codes_d = jnp.asarray(batch.codes)
            lengths_d = jnp.asarray(batch.lengths)
            return lambda: _arc_pairs_from_batch(
                codes_d, lengths_d, k, table.keys, state_edge, state_rank,
                patch_keys, patch_edge, patch_twin,
                table_dir, dsteps, dshift,
                patch_dir, psteps, pshift,
            )
        packed, nr, nc = pi
        args = (jnp.asarray(packed), jnp.asarray(batch.lengths),
                jnp.asarray(nr), jnp.asarray(nc))
        return lambda: _arc_pairs_from_batch_packed(
            *args, L=L, k=k, table_keys=table.keys,
            state_edge=state_edge, state_rank=state_rank,
            patch_keys=patch_keys, patch_edge=patch_edge,
            patch_twin=patch_twin, table_dir=table_dir,
            dir_steps=dsteps, dir_shift=dshift,
            patch_dir=patch_dir, pdir_steps=psteps, pdir_shift=pshift,
        )

    if cached is not None:
        # device-resident packed batches from the count pass: no decode,
        # no upload — straight into the lookup program
        for args, L, n in cached:
            flush_n[0] = min(32, max(8, (32 * 16384) // args[0].shape[0]))
            out = _arc_pairs_from_batch_packed(
                *args, L=L, k=k, table_keys=table.keys,
                state_edge=state_edge, state_rank=state_rank,
                patch_keys=patch_keys, patch_edge=patch_edge,
                patch_twin=patch_twin, table_dir=table_dir,
                dir_steps=dsteps, dir_shift=dshift,
                patch_dir=patch_dir, pdir_steps=psteps, pdir_shift=pshift,
            )
            consume(*out, n)
        flush()
        return arcs, marker, paths

    in_flight = None  # ship next batch to device before consuming current
    for batch in batches:
        batch = batch.trimmed()
        flush_n[0] = min(32, max(8, (32 * 16384) // batch.codes.shape[0]))
        dev = (ship(batch), batch.n)
        if in_flight is not None:
            thunk, n = in_flight
            consume(*thunk(), n)
        in_flight = dev
    if in_flight is not None:
        thunk, n = in_flight
        consume(*thunk(), n)
    flush()
    return arcs, marker, paths


def _collapse_path(row: np.ndarray) -> np.ndarray:
    row = row[row >= 0]
    if row.size == 0:
        return row
    keep = np.ones(row.shape, bool)
    keep[1:] = row[1:] != row[:-1]
    return row[keep]


def build_arcs_sharded(
    batches: Iterable[rio.ReadBatch],
    eg: edge_mod.EdgeGraph,
    table: sc.KmerTable,
    k: int,
    mesh,
    record_paths: bool = False,
) -> Tuple[ArcAccumulator, np.ndarray, Optional[List[np.ndarray]]]:
    """Multi-chip arc pass: (from, to) pairs all_to_all-routed to their
    hash owner and LSM-accumulated per shard (prlRead2path.c:786's
    per-thread preArc ownership re-expressed over ICI).  Same return
    contract as ``build_arcs``; the gathered union is bit-identical to
    the single-device arc table."""
    from ..parallel import shard_streams as ss

    stream = ss.ShardedArcStream(
        mesh, k, table.keys, eg.state_edge, eg.state_rank,
        eg.patch_keys, eg.patch_edge, eg.patch_twin,
    )
    n_shards = mesh.devices.size
    marker = np.zeros((eg.n_edges,), np.int32)
    paths: Optional[List[np.ndarray]] = [] if record_paths else None

    def record(hits_dev, n_rows):
        h = np.asarray(hits_dev)[:n_rows]
        for row in h:
            path = _collapse_path(row)
            if len(path) >= 3:
                paths.append(path)
                marker[path] = np.minimum(marker[path] + 1, 255)

    in_flight = None  # (hits device array, live rows) — one-batch delay
    for batch in batches:
        batch = batch.trimmed()
        codes, lengths = batch.codes, batch.lengths
        pad = (-codes.shape[0]) % n_shards
        if pad:
            codes = np.concatenate(
                [codes, np.full((pad, codes.shape[1]), kops.BASE_N, np.uint8)]
            )
            lengths = np.concatenate([lengths, np.zeros((pad,), lengths.dtype)])
        hits = stream.add_batch(codes, lengths)
        if record_paths:
            if in_flight is not None:
                record(*in_flight)
            in_flight = (hits, batch.n)
    if record_paths and in_flight is not None:
        record(*in_flight)
    keys, mult, n = stream.finish()
    uk, um = ss.gather_arc_union(keys, mult, n)
    cap = _next_pow2(uk.shape[0] + 1)
    keys_p = np.full((cap, 2), 0xFFFFFFFF, np.uint32)
    mult_p = np.zeros((cap,), np.int32)
    keys_p[: uk.shape[0]] = uk
    mult_p[: um.shape[0]] = um
    arcs = ArcAccumulator(
        keys=jnp.asarray(keys_p),
        mult=jnp.asarray(mult_p),
        n=jnp.asarray(np.int32(uk.shape[0])),
    )
    return arcs, marker, paths


# ---------------------------------------------------------------------------
# Full stage driver
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PregraphResult:
    k: int
    table: Optional[sc.KmerTable]
    graph: Optional[kg.PreGraph]
    edges: edge_mod.EdgeGraph
    arcs: ArcAccumulator
    marker_on_edge: np.ndarray
    paths: Optional[List[np.ndarray]]
    kmer_freq: np.ndarray
    n_reads: int
    max_read_len: int
    # sharded path: the table/graph stay distributed; only the E-scale
    # branch-vertex keys come to the host (vertex-file content)
    branch_keys: Optional[np.ndarray] = None


def run_pregraph(
    cfg: AssemblyConfig,
    k: int,
    d_cutoff: int = 0,
    record_paths: bool = False,
    batch_size: int = 16384,
    genome_size: int = 0,
    progress: bool = True,
    mesh="auto",
) -> PregraphResult:
    """pregraph.c call_pregraph:62, end to end in memory.

    ``mesh``: "auto" shards the count and arc read streams over all
    visible devices (the reference's thread-pool parallelism over ICI,
    prlHashReads.c:83); None or a 1-device mesh runs single-chip.
    """
    t0 = time.time()
    max_len = cfg.max_rd_len

    from ..io import native_reads

    if mesh == "auto":
        from ..parallel.shard_streams import default_mesh

        mesh = default_mesh()
    if mesh is not None and mesh.devices.size < 2:
        mesh = None

    def read_batches():
        for lib in cfg.libs_for_contig():
            yield from native_reads.batch_reads_lib(lib, batch_size, max_len)

    # -z genome-size hint pre-sizes the table so capacity never grows
    # mid-stream (each growth is a fresh XLA merge shape)
    init_cap = _next_pow2(int(genome_size * 1.7)) if genome_size else 1 << 20
    if mesh is not None:
        # fully sharded path: the k-mer table NEVER gathers onto one
        # device — graph simplification and the arc pass run over the
        # hash-owner shards (parallel/shard_graph.py)
        from ..parallel import shard_count as pc
        from ..parallel import shard_graph as sgm

        skeys, scovs, sn, n_reads, dropped = pc.count_stream_sharded(
            read_batches(), k, mesh, max_len, batch_size,
            init_cap_per_shard=max(
                1 << 14, init_cap // mesh.devices.size
            ),
        )
        if dropped:
            raise RuntimeError(
                f"sharded count dropped {dropped} k-mers; raise bucket_cap"
            )
        gs, freq = sgm.from_sharded_count(mesh, k, skeys, scovs, sn,
                                          d_cutoff=d_cutoff)
        if progress:
            log.info("count pass: %d reads (%.1fs, sharded x%d)",
                     n_reads, time.time() - t0, mesh.devices.size)
        gs, n_single = sgm.clip_tips_sharded(gs, thin=True)
        gs, n_minor = sgm.clip_tips_sharded(gs, thin=False)
        if progress:
            log.info("tips: %d single, %d minor removed",
                     n_single, n_minor)
        eg, _labels = sgm.build_edges_sharded(gs)
        if progress:
            log.info("edges: %d directed (%.1fs)", eg.n_edges,
                     time.time() - t0)
        arcs, marker, paths = sgm.build_arcs_sharded_dist(
            read_batches(), eg, gs, record_paths=record_paths,
        )
        if progress:
            log.info("arc pass: %d preArcs (%.1fs)", int(arcs.n),
                     time.time() - t0)
        return PregraphResult(
            k=k, table=None, graph=None, edges=eg, arcs=arcs,
            marker_on_edge=marker, paths=paths, kmer_freq=freq,
            n_reads=n_reads, max_read_len=max_len,
            branch_keys=sgm.download_branch_keys(gs),
        )

    batch_cache: list = []
    # tables past the per-program HBM ceiling stream through the
    # prefix-partitioned LSM (see PARTITION_ROWS), which applies the -d
    # prune + compaction during its order-preserving reassembly
    n_part = 1 if init_cap <= 2 * PARTITION_ROWS else min(
        16, 1 << max(1, (init_cap // PARTITION_ROWS - 1).bit_length()))
    table, n_reads = count_reads_to_table(
        read_batches(), k, max_len, init_capacity=init_cap,
        device_cache=batch_cache,
        partitions=n_part, prune_d=d_cutoff,
    )
    table = shrink_table(table, k)
    if progress:
        log.info(
            "count pass: %d reads -> %d kmers (%.1fs%s)",
            n_reads, int(table.n), time.time() - t0,
            f", {n_part} partitions" if n_part > 1 else "",
        )

    g = kg.from_table(table)
    if d_cutoff > 0 and n_part == 1:
        g = kg.de_low_cov(g, jnp.int32(d_cutoff))
        # error-kmer singletons are typically 2/3 of the table: squeeze
        # them out so every later pass runs at live size, not capacity
        g = kg.compact_graph(g)
    g = kg.mark_linear(g)
    freq = np.asarray(kg.kmer_freq_hist(g))

    # one prefix directory serves every pass over this key table (tips,
    # edges): keys never change, only flags
    pdir_info = sc.build_prefix_dir_device(g.keys, k)
    g, n_single = kg.remove_single_tips(g, k, pdir_info=pdir_info)
    g, n_minor = kg.remove_minor_tips(g, k, pdir_info=pdir_info)
    if progress:
        # one combined readback — every device->host sync costs seconds
        # over the remote-device tunnel
        ns, nm = np.asarray(jnp.stack([n_single, n_minor]))
        log.info("tips: %d single, %d minor removed", int(ns), int(nm))

    eg = edge_mod.build_edges(g, k)
    if progress:
        log.info("edges: %d directed (%.1fs)", eg.n_edges, time.time() - t0)

    cached = batch_cache if None not in batch_cache else None
    arcs, marker, paths = build_arcs(
        read_batches() if cached is None else (),
        eg, sc.KmerTable(keys=g.keys, covs=g.covs, n=g.n), k,
        record_paths=record_paths,
        cached=cached,
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
