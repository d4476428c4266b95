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
