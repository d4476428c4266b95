"""Sharded k-mer counting over a jax.sharding.Mesh.

The TPU-native equivalent of the reference's ownership sharding
(prlHashReads.c:83 — thread t owns k-mers with ``hash % thrd_num == t``
inserted into its private KmerSet): device d owns k-mers with
``hash(kmer) % n_devices == d``.  The shared-memory insert becomes an
**all-to-all shuffle over ICI**: each device extracts k-mers from its
slice of the read batch, buckets them by owner via the hash, exchanges
fixed-capacity buckets with ``jax.lax.all_to_all``, then sort/segment-
reduces its owned k-mers into a local sorted sub-table.  Shard tables
partition k-mer space disjointly, so no cross-shard reconciliation is
ever needed — determinism for free, unlike the reference's
thread-order-dependent arc ordering (iterate.c:2686).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import kmer as kops
from ..ops import sortcount as sc

AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _bucket_by_shard(words, valid, left, right, n_shards: int, cap: int):
    """Sort local k-mers into (n_shards, cap) fixed-capacity buckets.

    Overflow beyond ``cap`` per bucket is dropped (returned as a count so
    callers can grow cap and retry); with a mixing hash the per-bucket load
    concentrates tightly around N/n_shards.
    """
    n, w = words.shape
    shard = (kops.hash_words(words) % jnp.uint32(n_shards)).astype(jnp.int32)
    shard = jnp.where(valid, shard, n_shards)  # invalid sorts last
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((shard, iota), num_keys=1, is_stable=True)
    shard_s = shard[perm]
    words_s = words[perm]
    left_s = left[perm]
    right_s = right[perm]
    # bucket placement by GATHER, not scatter (TPU scatters serialize):
    # slot (s, r) of the bucket grid reads sorted row offsets[s] + r
    counts = jnp.bincount(shard_s, length=n_shards + 1)[:n_shards]
    offsets = jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])[
        :n_shards
    ]
    grid_s = jnp.repeat(jnp.arange(n_shards, dtype=jnp.int32), cap)
    grid_r = jnp.tile(jnp.arange(cap, dtype=jnp.int32), n_shards)
    filled = grid_r < counts[grid_s]
    src = jnp.where(filled, offsets[grid_s] + grid_r, 0)
    bw = jnp.where(
        filled[:, None], words_s[src], jnp.uint32(0xFFFFFFFF)
    )
    bl = jnp.where(filled, left_s[src], jnp.uint8(255))
    br = jnp.where(filled, right_s[src], jnp.uint8(255))
    dropped = jnp.sum(jnp.maximum(counts - cap, 0))
    return (
        bw.reshape(n_shards, cap, w),
        bl.reshape(n_shards, cap),
        br.reshape(n_shards, cap),
        dropped,
    )


def sharded_count_step(mesh: Mesh, k: int, bucket_cap: int):
    """Build a jitted sharded counting step for a fixed mesh.

    Returns fn(codes (B, L), lengths (B,)) -> (table_keys, table_covs,
    n_live, dropped) where outputs are sharded over the mesh: each shard's
    rows hold the sorted unique k-mers it owns.
    """
    n_shards = mesh.devices.size

    def per_shard(codes, lengths):
        out = kops.extract_kmers(codes, lengths, k)
        b, p, w = out["words"].shape
        words = out["words"].reshape(b * p, w)
        valid = out["valid"].reshape(b * p)
        left = out["left"].reshape(b * p)
        right = out["right"].reshape(b * p)
        bw, bl, br, dropped = _bucket_by_shard(
            words, valid, left, right, n_shards, bucket_cap
        )
        # route buckets to their owners (the hash%n 'insert' of the
        # reference becomes an ICI all-to-all)
        bw = jax.lax.all_to_all(bw, AXIS, 0, 0, tiled=True)
        bl = jax.lax.all_to_all(bl, AXIS, 0, 0, tiled=True)
        br = jax.lax.all_to_all(br, AXIS, 0, 0, tiled=True)
        rw = bw.reshape(n_shards * bucket_cap, w)
        rl = bl.reshape(n_shards * bucket_cap)
        rr = br.reshape(n_shards * bucket_cap)
        rvalid = ~jnp.all(rw == jnp.uint32(0xFFFFFFFF), axis=-1)
        table = sc.count_batch(rw, rvalid, rl, rr, rw.shape[0])
        # global kmer-frequency histogram: psum over shards
        hist = jnp.bincount(
            jnp.clip(table.covs[:, 8].astype(jnp.int32), 0, 255), length=256
        )
        hist = hist.at[0].set(0)  # bin 0 = empty table rows, not a frequency
        hist = jax.lax.psum(hist, AXIS)
        return table.keys, table.covs, table.n[None], dropped[None], hist

    fn = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS), P()),
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Streaming sharded counting: per-shard LSM tables under shard_map
# ---------------------------------------------------------------------------


def _bucket_rows(words, valid, flank, n_shards: int, cap: int):
    """Bucket (key, packed-flank) rows by owner shard — gather-based, no
    scatters (see ``_bucket_by_shard``).  Returns ((n_shards, cap, W) keys,
    (n_shards, cap) flank, dropped count)."""
    n, w = words.shape
    shard = (kops.hash_words(words) % jnp.uint32(n_shards)).astype(jnp.int32)
    shard = jnp.where(valid, shard, n_shards)
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((shard, iota), num_keys=1, is_stable=True)
    shard_s = shard[perm]
    words_s = words[perm]
    flank_s = flank[perm]
    counts = jnp.bincount(shard_s, length=n_shards + 1)[:n_shards]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)]
    )[:n_shards]
    grid_s = jnp.repeat(jnp.arange(n_shards, dtype=jnp.int32), cap)
    grid_r = jnp.tile(jnp.arange(cap, dtype=jnp.int32), n_shards)
    filled = grid_r < counts[grid_s]
    src = jnp.where(filled, offsets[grid_s] + grid_r, 0)
    bw = jnp.where(filled[:, None], words_s[src], jnp.uint32(0xFFFFFFFF))
    bf = jnp.where(filled, flank_s[src], jnp.uint32(0))
    dropped = jnp.sum(jnp.maximum(counts - cap, 0))
    return (
        bw.reshape(n_shards, cap, w),
        bf.reshape(n_shards, cap),
        dropped,
    )


class ShardedCountStream:
    """Streaming k-mer counting over a device mesh — the multi-chip form
    of models/pregraph.py ``count_reads_to_table``.

    Per read batch (sharded over devices): each device extracts canonical
    k-mers from its slice, buckets them by ``hash(kmer) % n_shards``, and
    an ``all_to_all`` over ICI routes every bucket to its owner (the
    distributed analog of prlHashReads.c:83's ``hash % thrd_num`` insert
    into the owner thread's private KmerSet).  Owned rows accumulate as
    RAW (unsorted) blocks; every FLUSH_N batches each shard runs ONE
    sort + segment-reduce over its raw rows and bitonic-merges the result
    into its sorted sub-table — the same LSM flush as the single-chip
    path, jitted per shard under shard_map.  Shard tables partition k-mer
    space disjointly, so their union equals the single-device table
    exactly and is shard-count invariant.
    """

    FLUSH_N = 32

    def __init__(self, mesh: Mesh, k: int, batch_b: int, max_len: int,
                 init_cap_per_shard: int = 1 << 16,
                 bucket_cap: Optional[int] = None):
        self.mesh = mesh
        self.k = k
        self.w = kops.num_words(k)
        self.n_shards = mesh.devices.size
        if batch_b % self.n_shards:
            raise ValueError("batch size must divide the mesh")
        per_dev_kmers = (batch_b // self.n_shards) * (max_len - k + 1)
        if bucket_cap is None:
            bucket_cap = max(
                128, int(2.0 * per_dev_kmers / self.n_shards)
            )
        self.bucket_cap = bucket_cap
        self.rows_per_flushblock = self.n_shards * bucket_cap  # per shard
        self.capacity = init_cap_per_shard  # per shard
        self.max_len = max_len
        self.batch_b = batch_b
        # multi-host (DCN): with jax.distributed initialized, the mesh
        # spans every process's devices; each process feeds its OWN slice
        # of the batch and every host-side control decision below derives
        # from fully-replicated reductions so the processes never diverge
        # (SURVEY.md 2.4: k-mer table sharded over devices/hosts).
        self.n_proc = jax.process_count()
        self._pending: list = []
        self._table = None  # (keys, covs) sharded; lazy init
        self._n_bound = 0  # host upper bound on per-shard live entries
        self.n_reads = 0
        self.dropped = 0
        self._route = self._build_route()
        self._sh2 = NamedSharding(mesh, P(AXIS, None))
        self._sh1 = NamedSharding(mesh, P(AXIS))

    # -- multi-host data placement -----------------------------------------

    def _put(self, local: np.ndarray, sharding, global_rows: int):
        """Build a (possibly multi-process) global array from this
        process's row slice."""
        if self.n_proc == 1:
            return jax.device_put(jnp.asarray(local), sharding)
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(local),
            (global_rows,) + tuple(local.shape[1:]),
        )

    # -- jitted programs ----------------------------------------------------

    def _build_route(self):
        n_shards, k, cap = self.n_shards, self.k, self.bucket_cap

        def per_shard(codes, lengths):
            out = kops.extract_kmers(codes, lengths, k)
            b, p, w = out["words"].shape
            words = out["words"].reshape(b * p, w)
            valid = out["valid"].reshape(b * p)
            flank = out["left"].reshape(b * p).astype(jnp.uint32) | (
                out["right"].reshape(b * p).astype(jnp.uint32) << 3
            )
            bw, bf, dropped = _bucket_rows(words, valid, flank, n_shards, cap)
            bw = jax.lax.all_to_all(bw, AXIS, 0, 0, tiled=True)
            bf = jax.lax.all_to_all(bf, AXIS, 0, 0, tiled=True)
            return (
                bw.reshape(n_shards * cap, w),
                bf.reshape(n_shards * cap),
                jax.lax.psum(dropped[None], AXIS),  # replicated: every
                # process reads the same total (multi-host safety)
            )

        fn = jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(AXIS, None), P(AXIS)),
            out_specs=(P(AXIS, None), P(AXIS), P()),
        )
        self._route_core = jax.jit(fn)

        @functools.partial(jax.jit, static_argnames=("L",))
        def routed_packed(packed, lengths, n_rows, n_cols, L):
            # device-side unpack (2-bit packed upload, 4x less tunnel
            # traffic); the elementwise unpack + tiny exception scatter
            # propagate through the batch sharding before the shard_map
            codes = kops.unpack_codes(packed, lengths, L, n_rows, n_cols)
            return fn(codes, lengths)

        return routed_packed

    @functools.lru_cache(maxsize=None)
    def _reduce_fn(self, rcap: int, fan_in: int):
        # takes the fan_in pending blocks as SEPARATE args and stacks
        # inside jit: host-side jnp.stack would not be legal on
        # multi-process (non-fully-addressable) arrays
        def per_shard(*args):
            keys = args[:fan_in]
            flank = args[fan_in:]
            raws = tuple(
                sc.RawRows(keys[i], flank[i], jnp.zeros((), jnp.int32))
                for i in range(fan_in)
            )
            t = sc.reduce_raws(raws, rcap)
            n_max = jax.lax.pmax(t.n[None], AXIS)
            return t.keys, t.covs, t.n[None], n_max

        fn = jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(AXIS, None),) * fan_in + (P(AXIS),) * fan_in,
            out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P()),
        )
        return jax.jit(fn)

    @functools.lru_cache(maxsize=None)
    def _merge_fn(self, capacity: int):
        def per_shard(tk, tc, lk, lc):
            a = sc.KmerTable(keys=tk, covs=tc, n=jnp.zeros((), jnp.int32))
            b = sc.KmerTable(keys=lk, covs=lc, n=jnp.zeros((), jnp.int32))
            m = sc.merge_sorted_tables(a, b, capacity)
            n_max = jax.lax.pmax(m.n[None], AXIS)
            return m.keys, m.covs, m.n[None], n_max

        fn = jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(AXIS, None),) * 4,
            out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P()),
        )
        return jax.jit(fn)

    @functools.lru_cache(maxsize=None)
    def _pad_block_fn(self):
        rows, w = self.rows_per_flushblock, self.w

        def per_shard():
            return (
                jnp.full((rows, w), 0xFFFFFFFF, jnp.uint32),
                jnp.zeros((rows,), jnp.uint32),
            )

        fn = jax.shard_map(per_shard, mesh=self.mesh, in_specs=(),
                           out_specs=(P(AXIS, None), P(AXIS)))
        return jax.jit(fn)

    @functools.lru_cache(maxsize=None)
    def _init_table_fn(self, capacity: int):
        w = self.w

        def per_shard():
            return (
                jnp.full((capacity, w), 0xFFFFFFFF, jnp.uint32),
                jnp.zeros((capacity, sc.N_COV), jnp.uint16),
            )

        fn = jax.shard_map(per_shard, mesh=self.mesh, in_specs=(),
                           out_specs=(P(AXIS, None), P(AXIS, None)))
        return jax.jit(fn)

    @functools.lru_cache(maxsize=None)
    def _grow_fn(self, old_cap: int, new_cap: int):
        w = self.w

        def per_shard(tk, tc):
            gk = jnp.full((new_cap - old_cap, w), 0xFFFFFFFF, jnp.uint32)
            gc = jnp.zeros((new_cap - old_cap, sc.N_COV), jnp.uint16)
            return (
                jnp.concatenate([tk, gk], axis=0),
                jnp.concatenate([tc, gc], axis=0),
            )

        fn = jax.shard_map(per_shard, mesh=self.mesh,
                           in_specs=(P(AXIS, None), P(AXIS, None)),
                           out_specs=(P(AXIS, None), P(AXIS, None)))
        return jax.jit(fn)

    # -- streaming API ------------------------------------------------------

    def add_batch(self, codes: np.ndarray, lengths: np.ndarray, n: int):
        """Feed one batch.  Single-process: the full (B, L) batch.
        Multi-process: this process's (B/n_proc, L) row slice — every
        process must call add_batch the same number of times."""
        pi = None
        if self.n_proc == 1:
            # single-process: ship 2-bit packed (multi-process keeps the
            # unpacked path — the N-exception rows are global indices and
            # per-process slices would need offset bookkeeping)
            pi = kops.pack_codes_host(np.asarray(codes),
                                     np.asarray(lengths))
        if pi is not None:
            packed, nr, nc = pi
            bw, bf, dropped = self._route(
                jax.device_put(jnp.asarray(packed), self._sh2),
                jax.device_put(jnp.asarray(lengths), self._sh1),
                jnp.asarray(nr), jnp.asarray(nc),
                L=codes.shape[1],
            )
        else:
            codes_d = self._put(codes, self._sh2, self.batch_b)
            lengths_d = self._put(lengths, self._sh1, self.batch_b)
            bw, bf, dropped = self._route_core(codes_d, lengths_d)
        self._pending.append((bw, bf, dropped))
        self.n_reads += n
        if len(self._pending) >= self.FLUSH_N:
            self._flush()

    def _flush(self):
        if not self._pending:
            return
        fan_in = self.FLUSH_N
        rows = self.rows_per_flushblock
        while len(self._pending) < fan_in:
            pad_k, pad_f = self._pad_block_fn()()
            self._pending.append((pad_k, pad_f, None))
        for p in self._pending:
            if p[2] is not None:
                # replicated psum scalar: same on every process
                self.dropped += int(np.asarray(p[2])[0])
        args = [p[0] for p in self._pending] + [p[1] for p in self._pending]
        rcap = min(self.capacity, fan_in * rows)
        lk, lc, ln, lmax = self._reduce_fn(rcap, fan_in)(*args)
        ln_max = int(np.asarray(lmax)[0])  # replicated readback
        if ln_max > rcap:
            rcap = _next_pow2(ln_max)
            lk, lc, ln, lmax = self._reduce_fn(rcap, fan_in)(*args)
            ln_max = int(np.asarray(lmax)[0])
        if self._n_bound + ln_max > self.capacity:
            self.capacity = _next_pow2((self._n_bound + ln_max) * 2)
        if self._table is None:
            tk, tc = self._init_table_fn(self.capacity)()
        else:
            tk, tc, cur_cap = self._table
            if cur_cap < self.capacity:
                tk, tc = self._grow_fn(cur_cap, self.capacity)(tk, tc)
        # pad the L1 run to the table capacity per shard (merge needs no
        # shape match, but keeping one merge shape per capacity avoids
        # recompiles); merge_sorted_ops pads internally, so pass as-is.
        mk, mc, mn, mmax = self._merge_fn(self.capacity)(tk, tc, lk, lc)
        self._table = (mk, mc, self.capacity)
        self._n = mn
        # exact per-shard live max (the ln-sum bound overcounts
        # cross-flush duplicates and inflates capacity); pmax-replicated
        # so every process grows capacity identically
        self._n_bound = int(np.asarray(mmax)[0])
        self._pending = []

    def finish(self):
        """Flush and return (keys, covs, n_per_shard) — device arrays
        sharded P(shard, None); rows [s*cap, s*cap+n[s]) are shard s's
        sorted sub-table."""
        self._flush()
        if self._table is None:
            tk, tc = self._init_table_fn(self.capacity)()
            zn = jax.jit(jax.shard_map(
                lambda: jnp.zeros((1,), jnp.int32), mesh=self.mesh,
                in_specs=(), out_specs=P(AXIS)))()
            return tk, tc, zn
        tk, tc, _ = self._table
        return tk, tc, self._n  # int32 (n,) per-shard live counts


def _next_pow2(x: int) -> int:
    return 1 << max(10, (x - 1).bit_length())


def count_stream_sharded(batches, k: int, mesh: Mesh, max_len: int,
                         batch_b: int, **kw):
    """Convenience driver: stream an iterable of io.reads.ReadBatch
    through a ShardedCountStream.  Returns (keys, covs, n_per_shard,
    n_reads, dropped)."""
    stream = None
    for batch in batches:
        batch = batch.trimmed()
        codes, lengths = batch.codes, batch.lengths
        B, L = codes.shape
        if B % mesh.devices.size:
            pad = mesh.devices.size - B % mesh.devices.size
            codes = np.concatenate(
                [codes, np.full((pad, L), kops.BASE_N, np.uint8)]
            )
            lengths = np.concatenate(
                [lengths, np.zeros((pad,), lengths.dtype)]
            )
        if stream is None:
            stream = ShardedCountStream(
                mesh, k, codes.shape[0], max(max_len, L, k), **kw
            )
        stream.add_batch(codes, lengths, batch.n)
    if stream is None:
        raise ValueError("no batches")
    keys, covs, n = stream.finish()
    return keys, covs, n, stream.n_reads, stream.dropped


def count_reads_sharded(
    codes: np.ndarray, lengths: np.ndarray, k: int, mesh: Mesh,
    bucket_cap: Optional[int] = None,
):
    """Count one read batch across the mesh; returns host arrays
    (keys, covs, n_per_shard, dropped, hist)."""
    n_shards = mesh.devices.size
    B, L = codes.shape
    if B % n_shards:
        pad = n_shards - B % n_shards
        codes = np.concatenate(
            [codes, np.full((pad, L), kops.BASE_N, np.uint8)]
        )
        lengths = np.concatenate([lengths, np.zeros((pad,), lengths.dtype)])
        B += pad
    if bucket_cap is None:
        per_dev_kmers = (B // n_shards) * (L - k + 1)
        bucket_cap = max(256, int(2.0 * per_dev_kmers / n_shards))
    step = sharded_count_step(mesh, k, bucket_cap)
    sharding = NamedSharding(mesh, P(AXIS, None))
    sharding1 = NamedSharding(mesh, P(AXIS))
    codes_d = jax.device_put(jnp.asarray(codes), sharding)
    lengths_d = jax.device_put(jnp.asarray(lengths), sharding1)
    keys, covs, n, dropped, hist = step(codes_d, lengths_d)
    return (
        np.asarray(keys),
        np.asarray(covs),
        np.asarray(n),
        np.asarray(dropped),
        np.asarray(hist),
    )
