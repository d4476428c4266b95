"""Sharded arc and map passes over a jax.sharding.Mesh.

Completes the multi-chip story for all three full read streams of the
reference (the count pass lives in parallel/shard_count.py):

  * arc pass   — prlRead2path.c ``prlRead2edge:786``: thread t owns the
    preArcs whose *from* edge hashes to t (the per-thread preArc memory
    managers, ``thread_add1preArc:388``).  Here: each device maps its
    slice of the read batch onto edges, forms (from, to) transition
    pairs, buckets them by ``mix32(from) % n_shards`` and routes the
    buckets to their owner shard with ``jax.lax.all_to_all`` over ICI;
    each shard LSM-accumulates its owned arcs with the same raw-rows →
    sort/segment-reduce → bitonic-merge cycle as the single-chip path.
    Shard arc tables partition (from, to) key space disjointly, so their
    union equals the single-device arc table exactly.

  * map pass   — prlRead2Ctg.c ``prlRead2Ctg:779``: threads share the
    read batches and the (read-only) contig k-mer index.  Here: read
    batches are sharded over the mesh (data parallel), the contig index
    is replicated (it is read-only and small next to the k-mer table),
    and per-read placements come back sharded over the batch dimension.
    No collective is needed — the reference's shared-memory read of the
    index is the replication.
"""

from __future__ import annotations

import functools
import logging
from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import kmer as kops
from ..ops import sortcount as sc
from .shard_count import AXIS, make_mesh, _next_pow2

log = logging.getLogger("soapdenovo2_tpu.parallel")


def default_mesh() -> Optional[Mesh]:
    """A 1-D mesh over all visible devices, or None when single-device.

    ``SD2TPU_AUTO_MESH=0`` disables auto-sharding (the test suite sets it
    so single-chip semantics are the default there; dedicated sharding
    tests construct meshes explicitly)."""
    import os

    if os.environ.get("SD2TPU_AUTO_MESH", "1") == "0":
        return None
    if len(jax.devices()) < 2:
        return None
    return make_mesh()


def _mix32(x):
    """murmur3 finalizer on uint32 — decorrelates edge ids from shards."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def _bucket_pairs(from_e, to_e, valid, n_shards: int, cap: int):
    """Bucket (from, to) u32 pairs by owner shard, gather-based (no
    scatters; same pattern as shard_count._bucket_rows).  Returns
    ((n_shards, cap, 2) keys, dropped count)."""
    n = from_e.shape[0]
    shard = (_mix32(from_e) % jnp.uint32(n_shards)).astype(jnp.int32)
    shard = jnp.where(valid, shard, n_shards)  # invalid sorts last
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((shard, iota), num_keys=1, is_stable=True)
    shard_s = shard[perm]
    f_s = from_e[perm].astype(jnp.uint32)
    t_s = to_e[perm].astype(jnp.uint32)
    counts = jnp.bincount(shard_s, length=n_shards + 1)[:n_shards]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)]
    )[:n_shards]
    grid_s = jnp.repeat(jnp.arange(n_shards, dtype=jnp.int32), cap)
    grid_r = jnp.tile(jnp.arange(cap, dtype=jnp.int32), n_shards)
    filled = grid_r < counts[grid_s]
    src = jnp.where(filled, offsets[grid_s] + grid_r, 0)
    bf = jnp.where(filled, f_s[src], jnp.uint32(0xFFFFFFFF))
    bt = jnp.where(filled, t_s[src], jnp.uint32(0xFFFFFFFF))
    keys = jnp.stack([bf, bt], axis=-1).reshape(n_shards, cap, 2)
    dropped = jnp.sum(jnp.maximum(counts - cap, 0))
    return keys, dropped


class ShardedArcStream:
    """Streaming preArc accumulation over a device mesh — the multi-chip
    form of models/pregraph.py ``build_arcs``.

    Lookup state (k-mer table keys + per-state edge annotations + (k+1)-mer
    patch) is replicated across the mesh; read batches are sharded; arc
    observations are routed to their hash owner over ICI and accumulated
    in per-shard sorted LSM tables.
    """

    FLUSH_N = 16

    def __init__(self, mesh: Mesh, k: int, table_keys, state_edge,
                 state_rank, patch_keys, patch_edge, patch_twin,
                 init_cap_per_shard: int = 1 << 12,
                 bucket_cap: Optional[int] = None):
        self.mesh = mesh
        self.k = k
        self.n_shards = mesh.devices.size
        self.bucket_cap = bucket_cap  # resolved on first batch
        self.capacity = init_cap_per_shard  # per shard
        self._pending: list = []
        self._pending_drop: list = []
        self._table = None  # (keys (S*cap, 2), mult (S*cap,)) sharded
        self._n = None
        self._n_bound = 0
        self.dropped = 0
        self._sh2 = NamedSharding(mesh, P(AXIS, None))
        self._sh1 = NamedSharding(mesh, P(AXIS))
        self._rep = NamedSharding(mesh, P())
        dp = lambda x: jax.device_put(jnp.asarray(x), self._rep)
        tdir, self._dir_steps, self._dir_shift = sc.build_prefix_dir(
            np.asarray(table_keys), k
        )
        self._state = (
            dp(table_keys), dp(state_edge), dp(state_rank),
            dp(patch_keys), dp(patch_edge), dp(patch_twin),
            dp(tdir),
        )
        self._route_cache = {}

    # -- jitted programs ----------------------------------------------------

    def _route_fn(self, cap: int):
        if cap in self._route_cache:
            return self._route_cache[cap]
        n_shards, k = self.n_shards, self.k
        from ..models import pregraph as pgm

        dsteps, dshift = self._dir_steps, self._dir_shift

        def per_shard(codes, lengths, tkeys, se, sr, pk, pe, pt, tdir):
            hits = pgm.read_paths_batch(
                codes, lengths, k, tkeys, se, sr, pk, pe, pt,
                tdir, dsteps, dshift,
            )
            prev = pgm._last_seen_scan(hits)
            is_arc = (hits >= 0) & (prev >= 0) & (hits != prev)
            keys, dropped = _bucket_pairs(
                prev.reshape(-1), hits.reshape(-1), is_arc.reshape(-1),
                n_shards, cap,
            )
            keys = jax.lax.all_to_all(keys, AXIS, 0, 0, tiled=True)
            return keys.reshape(n_shards * cap, 2), dropped[None], hits

        fn = jax.jit(jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(AXIS, None), P(AXIS)) + (P(),) * 7,
            out_specs=(P(AXIS, None), P(AXIS), P(AXIS, None)),
        ))
        self._route_cache[cap] = fn
        return fn

    @functools.lru_cache(maxsize=None)
    def _reduce_fn(self, rcap: int, fan_in: int):
        def per_shard(keys):
            flat = keys.reshape(-1, 2)
            out = jax.lax.sort((flat[:, 0], flat[:, 1]), num_keys=2)
            sk = jnp.stack(out, axis=-1)
            ones = (~sc._is_sentinel(sk)).astype(jnp.int32)
            uk, sums, n_live = sc.reduce_sorted_groups_shift(
                sk, ones[:, None], rcap, exact_max=1
            )
            return uk, sums[:, 0], n_live[None]

        fn = jax.jit(jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(None, AXIS, None),),
            out_specs=(P(AXIS, None), P(AXIS), P(AXIS)),
        ))
        return fn

    @functools.lru_cache(maxsize=None)
    def _merge_fn(self, capacity: int):
        def per_shard(tk, tm, lk, lm):
            from ..models import pregraph as pgm

            a = pgm.ArcAccumulator(keys=tk, mult=tm,
                                   n=jnp.zeros((), jnp.int32))
            b = pgm.ArcAccumulator(keys=lk, mult=lm,
                                   n=jnp.zeros((), jnp.int32))
            m = pgm._merge_sorted_arcs.__wrapped__(a, b, capacity)
            return m.keys, m.mult, m.n[None]

        fn = jax.jit(jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(AXIS, None), P(AXIS)) * 2,
            out_specs=(P(AXIS, None), P(AXIS), P(AXIS)),
        ))
        return fn

    # -- streaming API ------------------------------------------------------

    def add_batch(self, codes: np.ndarray, lengths: np.ndarray):
        """Feed one (B, L) batch; B must divide the mesh.  Returns the
        per-position edge-hit matrix (device array, batch-sharded) for
        callers recording read paths (-R)."""
        B, L = codes.shape
        if self.bucket_cap is None:
            # arcs are transitions only: budget ~8 per read per shard-slice,
            # never below one full row so short batches cannot drop
            per_dev = B // self.n_shards
            self.bucket_cap = max(256, (per_dev * 8) // self.n_shards)
        codes_d = jax.device_put(jnp.asarray(codes), self._sh2)
        lengths_d = jax.device_put(jnp.asarray(lengths), self._sh1)
        keys, dropped, hits = self._route_fn(self.bucket_cap)(
            codes_d, lengths_d, *self._state
        )
        self._pending.append(keys)
        self._pending_drop.append(dropped)
        if len(self._pending) >= self.FLUSH_N:
            self._flush()
        return hits

    def _flush(self):
        if not self._pending:
            return
        fan_in = self.FLUSH_N
        rows = self.n_shards * self.bucket_cap  # per shard per batch
        while len(self._pending) < fan_in:
            self._pending.append(jax.device_put(
                jnp.full((self.n_shards * rows, 2), 0xFFFFFFFF, jnp.uint32),
                self._sh2,
            ))
        keys = jnp.stack(self._pending, axis=0)
        drop = int(np.asarray(jnp.stack(self._pending_drop)).sum())
        if drop:
            # an overflowing bucket loses arc observations — surface it
            # loudly; callers can re-run with a larger bucket_cap
            self.dropped += drop
            log.warning("sharded arc pass dropped %d observations "
                        "(bucket_cap=%d too small)", drop, self.bucket_cap)
        rcap = min(self.capacity, fan_in * rows)
        lk, lm, ln = self._reduce_fn(rcap, fan_in)(keys)
        ln_max = int(np.asarray(ln).max())  # one readback per flush
        if ln_max > rcap:
            rcap = _next_pow2(ln_max)
            lk, lm, ln = self._reduce_fn(rcap, fan_in)(keys)
            ln_max = int(np.asarray(ln).max())
        if self._n_bound + ln_max > self.capacity:
            self.capacity = _next_pow2((self._n_bound + ln_max) * 2)
        if self._table is None:
            tk = jax.device_put(
                jnp.full((self.n_shards * self.capacity, 2), 0xFFFFFFFF,
                         jnp.uint32), self._sh2)
            tm = jax.device_put(
                jnp.zeros((self.n_shards * self.capacity,), jnp.int32),
                self._sh1)
        else:
            tk, tm, cur_cap = self._table
            if cur_cap < self.capacity:
                grow = self.capacity - cur_cap
                gk = jnp.full((self.n_shards, grow, 2), 0xFFFFFFFF, jnp.uint32)
                gm = jnp.zeros((self.n_shards, grow), jnp.int32)
                tk = jnp.concatenate(
                    [tk.reshape(self.n_shards, cur_cap, 2), gk], axis=1
                ).reshape(self.n_shards * self.capacity, 2)
                tm = jnp.concatenate(
                    [tm.reshape(self.n_shards, cur_cap), gm], axis=1
                ).reshape(self.n_shards * self.capacity)
                tk = jax.device_put(tk, self._sh2)
                tm = jax.device_put(tm, self._sh1)
        # pad the L1 run up to the table capacity per shard so the merge
        # keeps one XLA shape per capacity
        if rcap < self.capacity:
            pk = jnp.full((self.n_shards, self.capacity - rcap, 2),
                          0xFFFFFFFF, jnp.uint32)
            pm = jnp.zeros((self.n_shards, self.capacity - rcap), jnp.int32)
            lk = jnp.concatenate(
                [lk.reshape(self.n_shards, rcap, 2), pk], axis=1
            ).reshape(self.n_shards * self.capacity, 2)
            lm = jnp.concatenate(
                [lm.reshape(self.n_shards, rcap), pm], axis=1
            ).reshape(self.n_shards * self.capacity)
            lk = jax.device_put(lk, self._sh2)
            lm = jax.device_put(lm, self._sh1)
        mk, mm, mn = self._merge_fn(self.capacity)(tk, tm, lk, lm)
        self._table = (mk, mm, self.capacity)
        self._n = mn
        self._n_bound = int(np.asarray(mn).max())  # exact live max
        self._pending = []
        self._pending_drop = []

    def finish(self):
        """Flush and return (keys (S*cap, 2), mult (S*cap,), n_per_shard):
        rows [s*cap, s*cap+n[s]) are shard s's sorted owned arcs."""
        self._flush()
        if self._table is None:
            return (
                jnp.full((self.n_shards * self.capacity, 2), 0xFFFFFFFF,
                         jnp.uint32),
                jnp.zeros((self.n_shards * self.capacity,), jnp.int32),
                jnp.zeros((self.n_shards,), jnp.int32),
            )
        tk, tm, _ = self._table
        return tk, tm, self._n.reshape(-1).astype(jnp.int32)


def gather_arc_union(keys, mult, n_per_shard) -> Tuple[np.ndarray, np.ndarray]:
    """Union of per-shard sorted arc tables as one host-sorted array.

    Shards own disjoint (from, to) keys, so concatenation + lexsort (no
    re-reduction) reproduces the single-device arc table exactly."""
    keys = np.asarray(keys)
    mult = np.asarray(mult)
    n = np.asarray(n_per_shard)
    s = n.shape[0]
    cap = keys.shape[0] // s
    parts_k, parts_m = [], []
    for i in range(s):
        lo = i * cap
        parts_k.append(keys[lo : lo + n[i]])
        parts_m.append(mult[lo : lo + n[i]])
    if not parts_k:
        return np.zeros((0, 2), np.uint32), np.zeros((0,), np.int32)
    uk = np.concatenate(parts_k)
    um = np.concatenate(parts_m)
    order = np.lexsort((uk[:, 1], uk[:, 0]))
    return uk[order], um[order]


def gather_table_union(keys, covs, n_per_shard):
    """Union of per-shard sorted k-mer sub-tables into ONE globally sorted
    host table (keys (N, W) uint32, covs (N, C) uint16)."""
    keys = np.asarray(keys)
    covs = np.asarray(covs)
    n = np.asarray(n_per_shard)
    s = n.shape[0]
    cap = keys.shape[0] // s
    parts_k, parts_c = [], []
    for i in range(s):
        lo = i * cap
        parts_k.append(keys[lo : lo + n[i]])
        parts_c.append(covs[lo : lo + n[i]])
    uk = np.concatenate(parts_k)
    uc = np.concatenate(parts_c)
    if uk.shape[0]:
        order = np.lexsort(tuple(uk[:, i] for i in range(uk.shape[1] - 1, -1, -1)))
        uk, uc = uk[order], uc[order]
    return uk, uc


# ---------------------------------------------------------------------------
# Sharded map pass
# ---------------------------------------------------------------------------


class ShardedMapper:
    """Data-parallel read→contig mapping over the mesh with a replicated
    contig index (prlRead2Ctg.c ``prlRead2Ctg:779``: shared read batches,
    shared read-only index)."""

    def __init__(self, mesh: Mesh, index):
        self.mesh = mesh
        self.k = index.k
        self.n_shards = mesh.devices.size
        self._sh2 = NamedSharding(mesh, P(AXIS, None))
        self._sh1 = NamedSharding(mesh, P(AXIS))
        rep = NamedSharding(mesh, P())
        dp = lambda x: jax.device_put(jnp.asarray(x), rep)
        self._idx = (
            dp(index.keys), dp(index.cid), dp(index.pos),
            dp(index.flip.astype(np.int8)), dp(index.ctg_len),
            dp(index.pdir),
        )
        self._pdir_steps = index.pdir_steps
        self._pdir_shift = index.pdir_shift
        self._fn_cache = {}

    def _fn(self, align_len: int, half_rule: bool):
        key = (align_len, half_rule)
        if key in self._fn_cache:
            return self._fn_cache[key]
        from ..models import mapping as mp
        k = self.k
        psteps, pshift = self._pdir_steps, self._pdir_shift

        def per_shard(codes, lengths, keys, cid, pos, flip, clen, pdir):
            return mp._map_batch.__wrapped__(
                codes, lengths, k, keys, cid, pos, flip, clen,
                align_len=align_len, half_rule=half_rule,
                pdir=pdir, pdir_steps=psteps, pdir_shift=pshift,
            )

        fn = jax.jit(jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(AXIS, None), P(AXIS)) + (P(),) * 6,
            out_specs=(P(AXIS),) * 4,
        ))
        self._fn_cache[key] = fn
        return fn

    def map_batch(self, codes: np.ndarray, lengths: np.ndarray,
                  align_len: int = 60, half_rule: bool = False):
        """Returns (ctg, position, mapped, multi_ctg) device arrays,
        batch-sharded; rows past the original B (mesh padding) are
        unmapped."""
        B, L = codes.shape
        pad = (-B) % self.n_shards
        if pad:
            codes = np.concatenate(
                [codes, np.full((pad, L), kops.BASE_N, np.uint8)]
            )
            lengths = np.concatenate(
                [lengths, np.zeros((pad,), lengths.dtype)]
            )
        codes_d = jax.device_put(jnp.asarray(codes), self._sh2)
        lengths_d = jax.device_put(jnp.asarray(lengths), self._sh1)
        return self._fn(align_len, half_rule)(codes_d, lengths_d, *self._idx)
