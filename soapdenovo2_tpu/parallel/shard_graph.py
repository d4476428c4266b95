"""Sharded k-mer GRAPH passes over a jax.sharding.Mesh.

Round 3 sharded the three read streams but still gathered the counted
k-mer table onto ONE device for every graph pass (tips, chain labels,
edge construction) — the human-scale blocker: the k-mer table is the
object the reference needs 150 GB hosts for (README.md:32), and a ~3G
k-mer table cannot live in one chip's HBM.  This module keeps the table
sharded by hash ownership end to end:

  * shard s owns k-mers with ``hash_words(kmer) % n_shards == s`` —
    exactly prlHashReads.c:83's ``hash % thrd_num`` ownership, with the
    owner's private KmerSet replaced by a sorted per-shard sub-table.
  * node gid = ``shard * cap + slot``; state gid = ``2 * gid + orient``
    (both states of a node live on its owner shard).
  * cross-shard reads ride TWO collective primitives, each one jitted
    shard_map program (request all_to_all → owner answers locally →
    answer all_to_all → un-bucket):
      - ``dist lookup``: canonical k-mer words → owner's sorted-table
        bisection (newhash.c search_kmerset's role) → node gid.
      - ``dist gather``: global ids → owner's flat-array rows (the
        pointer-chase of cutTipPreGraph.c / node2edge.c walks).
  * local passes (deLowCov, Mark1in1out, compaction, kmerFreq) never
    communicate; chain labeling is pointer doubling where each round's
    two gathers are dist gathers over ICI.

Edge-level results (E edges, ~100-1000x smaller than the k-mer table)
are assembled on the host from per-shard downloads; the per-state
(edge id, rank) annotations that the arc pass consumes stay sharded.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import kmer as kops
from ..ops import sortcount as sc
from .shard_count import AXIS

log = logging.getLogger("soapdenovo2_tpu.shard_graph")


def _next_pow2(x: int, lo: int = 256) -> int:
    return max(lo, 1 << max(x - 1, 0).bit_length())


# ---------------------------------------------------------------------------
# In-shard_map routing helpers (pure functions of local shards)
# ---------------------------------------------------------------------------


def _bucket_u32(rows, dst, n_shards: int, cap: int, fill=0xFFFFFFFF):
    """Bucket (n, V) uint32 rows into (n_shards, cap, V) by dst shard.

    ``dst == n_shards`` marks invalid rows (they sort last and are
    dropped).  Gather-based (no scatters).  Returns (buckets, perm,
    counts, offsets, dropped)."""
    n, v = rows.shape
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((dst.astype(jnp.int32), iota), num_keys=1,
                           is_stable=True)
    dst_s = dst[perm]
    rows_s = rows[perm]
    counts = jnp.bincount(dst_s, length=n_shards + 1)[:n_shards]
    offsets = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)]
    )[:n_shards]
    grid_s = jnp.repeat(jnp.arange(n_shards, dtype=jnp.int32), cap)
    grid_r = jnp.tile(jnp.arange(cap, dtype=jnp.int32), n_shards)
    filled = grid_r < counts[grid_s]
    src = jnp.where(filled, offsets[grid_s] + grid_r, 0)
    b = jnp.where(filled[:, None], rows_s[src], jnp.uint32(fill))
    dropped = jnp.sum(jnp.maximum(counts - cap, 0))
    return b.reshape(n_shards, cap, v), perm, counts, offsets, dropped


def _unbucket_u32(ans, perm, counts, offsets, n: int, cap: int, fill):
    """Inverse of _bucket_u32 for the ANSWER layout: ans (n_shards, cap, V)
    holds per-destination answers in bucket order; returns (n, V) aligned
    with the original row order (overflowed rows get ``fill``)."""
    n_shards = ans.shape[0]
    v = ans.shape[2]
    iota = jnp.arange(n, dtype=jnp.int32)
    # position p of the dst-sorted order lived in bucket (s, r):
    # s = dst_sorted[p] reconstructed from offsets, r = p - offsets[s]
    s_of = jnp.searchsorted(offsets, iota, side="right") - 1
    s_of = jnp.clip(s_of, 0, n_shards - 1)
    r_of = iota - offsets[s_of]
    ok = r_of < jnp.minimum(counts[s_of], cap)
    flat = ans.reshape(n_shards * cap, v)
    src = jnp.clip(s_of * cap + r_of, 0, n_shards * cap - 1)
    val_sorted = jnp.where(ok[:, None], flat[src], jnp.uint32(fill))
    # invert the sort permutation: carried iota of a sort keyed by perm
    inv = jnp.zeros((n,), jnp.int32)
    _, inv = jax.lax.sort((perm, iota), num_keys=1, is_stable=True)
    return val_sorted[inv]


def _roundtrip(rows, dst, n_shards: int, cap: int, answer_fn, out_v: int,
               fill=0xFFFFFFFF):
    """Route rows to dst shards, let owners answer, route answers back.

    ``answer_fn((n_shards*cap, V) uint32) -> (n_shards*cap, out_v)
    uint32`` runs on the OWNER shard; requests it received from shard i
    occupy rows [i*cap, (i+1)*cap).  Returns ((n, out_v), dropped)."""
    n = rows.shape[0]
    b, perm, counts, offsets, dropped = _bucket_u32(rows, dst, n_shards, cap)
    breq = jax.lax.all_to_all(b, AXIS, 0, 0, tiled=True)
    ans = answer_fn(breq.reshape(n_shards * cap, -1))
    ans = ans.reshape(n_shards, cap, out_v)
    back = jax.lax.all_to_all(ans, AXIS, 0, 0, tiled=True)
    out = _unbucket_u32(back, perm, counts, offsets, n, cap, fill)
    return out, dropped


# ---------------------------------------------------------------------------
# Sharded graph state
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ShardedKmerGraph:
    """Hash-owner-sharded de Bruijn graph state (P(shard, None) arrays)."""

    mesh: Mesh
    k: int
    cap: int  # per-shard row capacity (uniform)
    keys: jax.Array  # (S*cap, W) uint32, per-shard sorted, sentinel tail
    covs: jax.Array  # (S*cap, 9) uint16
    deleted: jax.Array  # (S*cap,) bool
    linear: jax.Array  # (S*cap,) bool
    pdir: jax.Array  # (S*D,) int32 per-shard prefix directories
    pdir_steps: int
    pdir_shift: int

    @property
    def n_shards(self) -> int:
        return self.mesh.devices.size


def _mk_specs(mesh):
    return NamedSharding(mesh, P(AXIS, None)), NamedSharding(mesh, P(AXIS))


@functools.partial(jax.jit, static_argnames=("mesh", "k", "d"))
def _local_prune_mark(keys, covs, n_arr, mesh, k: int, d: int):
    """Per-shard: deLowCov (-d) + Mark1in1out, no communication."""
    from ..models import kmer_graph as kg

    def per_shard(keys_l, covs_l, n_l):
        c = keys_l.shape[0]
        live = jnp.arange(c, dtype=jnp.int32) < n_l[0]
        g = kg.PreGraph(keys=keys_l, covs=covs_l, n=n_l[0],
                        deleted=~live, linear=jnp.zeros((c,), bool))
        if d > 0:
            g = kg.de_low_cov.__wrapped__(g, jnp.int32(d))
        g = kg.mark_linear.__wrapped__(g)
        return g.covs, g.deleted, g.linear, jnp.sum(
            (~g.deleted).astype(jnp.int32))[None]

    return jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS), P(AXIS), P(AXIS)),
    )(keys, covs, n_arr)


@functools.partial(jax.jit, static_argnames=("mesh", "new_cap"))
def _compact_sharded(keys, covs, deleted, mesh, new_cap: int):
    """Per-shard squeeze of deleted rows (order-preserving)."""

    def per_shard(keys_l, covs_l, dele_l):
        c = keys_l.shape[0]
        flag = dele_l.astype(jnp.int32)
        iota = jnp.arange(c, dtype=jnp.int32)
        _, perm = jax.lax.sort((flag, iota), num_keys=1, is_stable=True)
        perm = perm[:new_cap]
        dl = dele_l[perm]
        ks = jnp.where(dl[:, None], jnp.uint32(0xFFFFFFFF), keys_l[perm])
        cv = jnp.where(dl[:, None], jnp.uint16(0), covs_l[perm])
        return ks, cv, dl

    return jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS)),
    )(keys, covs, deleted)


@functools.partial(jax.jit, static_argnames=("mesh", "bits", "shift"))
def _build_dirs(keys, mesh, bits: int, shift: int):
    """Per-shard prefix directory + its max bucket size (pmax)."""

    def per_shard(keys_l):
        d = sc._prefix_dir_device(keys_l, shift, 1 << bits)
        mx = jnp.max(jnp.diff(d))
        return d, jax.lax.pmax(mx[None], AXIS)

    return jax.shard_map(
        per_shard, mesh=mesh, in_specs=(P(AXIS, None),),
        out_specs=(P(AXIS), P()),
    )(keys)


def from_sharded_count(mesh: Mesh, k: int, keys, covs, n_per_shard,
                       d_cutoff: int = 0) -> Tuple[ShardedKmerGraph,
                                                   np.ndarray]:
    """Build a pruned, compacted ShardedKmerGraph from the sharded count
    stream's output; returns (graph, kmer_freq histogram)."""
    sh1 = NamedSharding(mesh, P(AXIS))
    n_arr = jax.device_put(
        np.asarray(n_per_shard).astype(np.int32).reshape(-1), sh1)
    covs, deleted, linear, live = _local_prune_mark(keys, covs, n_arr,
                                                    mesh, k, int(d_cutoff))
    freq = np.asarray(_freq_hist(keys, covs, deleted, mesh))
    live_np = np.asarray(live)
    new_cap = _next_pow2(int(live_np.max()) + 1)
    cap = keys.shape[0] // mesh.devices.size
    if new_cap < cap:
        keys, covs, deleted = _compact_sharded(keys, covs, deleted, mesh,
                                               new_cap)
        cap = new_cap
        # linear recomputed post-compaction (covs already pruned, d=0)
        _, _, linear, _ = _local_prune_mark(
            keys, covs, jax.device_put(live_np.astype(np.int32), sh1),
            mesh, k, 0)
        deleted = _deleted_from_keys(keys, mesh)
    w0_bits = kops.top_word_bits(k)
    eff = max(1, min(20, w0_bits))
    shift = w0_bits - eff
    pdir, mx = _build_dirs(keys, mesh, eff, shift)
    steps = max(1, int(np.asarray(mx)[0]).bit_length())
    g = ShardedKmerGraph(
        mesh=mesh, k=k, cap=cap, keys=keys, covs=covs,
        deleted=deleted, linear=linear, pdir=pdir,
        pdir_steps=steps, pdir_shift=shift,
    )
    return g, freq[1:256]


@functools.partial(jax.jit, static_argnames=("mesh",))
def _deleted_from_keys(keys, mesh):
    def per_shard(keys_l):
        return jnp.all(keys_l == jnp.uint32(0xFFFFFFFF), axis=-1)

    return jax.shard_map(per_shard, mesh=mesh, in_specs=(P(AXIS, None),),
                         out_specs=P(AXIS))(keys)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _freq_hist(keys, covs, deleted, mesh):
    def per_shard(keys_l, covs_l, dele_l):
        tot = jnp.clip(covs_l[:, 8].astype(jnp.int32), 0, 255)
        tot = jnp.where(dele_l, 0, tot)
        return jax.lax.psum(jnp.bincount(tot, length=256), AXIS)

    return jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS)),
        out_specs=P(),
    )(keys, covs, deleted)


# ---------------------------------------------------------------------------
# Distributed lookup + gather programs
# ---------------------------------------------------------------------------


def _owner_lookup_local(qwords, keys_l, dele_l, pdir_l, steps, shift, cap,
                        shard_id):
    idx = sc.lookup_kmers_dir(keys_l, qwords, pdir_l, steps, shift)
    safe = jnp.maximum(idx, 0)
    live = (idx >= 0) & ~dele_l[safe]
    gid = jnp.where(live, shard_id * cap + idx, -1)
    return gid


def make_dist_lookup(g: ShardedKmerGraph, qcap: int):
    """One jitted program: (q, W) canonical k-mer words per shard ->
    (q,) node gids (-1 = absent/deleted) + total dropped count."""
    mesh, k, cap = g.mesh, g.k, g.cap
    n_shards = g.n_shards
    steps, shift = g.pdir_steps, g.pdir_shift
    w = kops.num_words(k)

    def per_shard(qwords, qvalid, keys_l, dele_l, pdir_l):
        me = jax.lax.axis_index(AXIS).astype(jnp.int32)
        h = kops.hash_words(qwords) % jnp.uint32(n_shards)
        dst = jnp.where(qvalid, h.astype(jnp.int32), n_shards)

        def answer(rows):
            gid = _owner_lookup_local(rows[:, :w], keys_l, dele_l, pdir_l,
                                      steps, shift, cap, me)
            return gid.astype(jnp.uint32)[:, None]

        out, dropped = _roundtrip(qwords, dst, n_shards, qcap, answer, 1)
        gid = out[:, 0].astype(jnp.int32)
        gid = jnp.where(qvalid, gid, -1)
        return gid, jax.lax.psum(dropped[None], AXIS)

    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS, None), P(AXIS),
                  P(AXIS)),
        out_specs=(P(AXIS), P()),
    ))


def make_dist_gather(mesh: Mesh, rows_per_shard: int, qcap: int,
                     n_vals: int):
    """One jitted program: (q,) global row ids per shard + sharded value
    table (rows_per_shard, n_vals) u32 -> (q, n_vals) gathered values.
    Invalid ids (< 0) return 0xFFFFFFFF rows."""
    n_shards = mesh.devices.size

    def per_shard(gidx, vals_l):
        ok = gidx >= 0
        safe = jnp.maximum(gidx, 0)
        dst = jnp.where(ok, safe // rows_per_shard, n_shards)
        slot = (safe % rows_per_shard).astype(jnp.uint32)[:, None]

        def answer(rows):
            s = jnp.minimum(rows[:, 0].astype(jnp.int32),
                            rows_per_shard - 1)
            return vals_l[s]

        out, dropped = _roundtrip(slot, dst, n_shards, qcap, answer,
                                  n_vals)
        return out, jax.lax.psum(dropped[None], AXIS)

    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS, None)),
        out_specs=(P(AXIS, None), P()),
    ))


def make_dist_update(mesh: Mesh, rows_per_shard: int, qcap: int,
                     n_vals: int, combine: str = "set"):
    """One jitted program: route (gid, payload...) command rows to their
    owner shard, which applies them to its value table.  ``combine``:
    'set' (last write wins per slot via scatter-drop) or 'or' (bitwise)."""
    n_shards = mesh.devices.size

    def per_shard(gidx, payload, vals_l):
        ok = gidx >= 0
        safe = jnp.maximum(gidx, 0)
        dst = jnp.where(ok, safe // rows_per_shard, n_shards)
        slot = (safe % rows_per_shard).astype(jnp.uint32)
        rows = jnp.concatenate([slot[:, None], payload], axis=1)
        b, _, _, _, dropped = _bucket_u32(rows, dst, n_shards, qcap)
        breq = jax.lax.all_to_all(b, AXIS, 0, 0, tiled=True)
        flat = breq.reshape(n_shards * qcap, -1)
        valid = flat[:, 0] != jnp.uint32(0xFFFFFFFF)
        s = jnp.where(valid, flat[:, 0].astype(jnp.int32), rows_per_shard)
        if combine == "or":
            new = vals_l.at[s].max(flat[:, 1:], mode="drop")
        else:
            new = vals_l.at[s].set(flat[:, 1:], mode="drop")
        return new, jax.lax.psum(dropped[None], AXIS)

    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS, None), P(AXIS, None)),
        out_specs=(P(AXIS, None), P()),
    ))


# ---------------------------------------------------------------------------
# Sharded linear-successor states (linear_next_states over the mesh)
# ---------------------------------------------------------------------------


def _local_exit_queries(keys_l, covs_l, dele_l, lin_l, k: int):
    """Per-shard canonical next-kmer queries for both states of every
    node (valid only for live linear nodes) — the local half of
    kmer_graph.linear_next_states."""
    covs = covs_l
    right_b = jnp.argmax(covs[:, 4:8], axis=-1).astype(jnp.uint32)
    left_b = jnp.argmax(covs[:, 0:4], axis=-1).astype(jnp.uint32)
    exit0 = right_b
    exit1 = (3 - left_b) & 3
    cur1 = kops.reverse_complement(keys_l, k)
    n0 = kops.shift_left_append(keys_l, exit0, k)
    n1 = kops.shift_left_append(cur1, exit1, k)
    c0, r0 = kops.canonical(n0, kops.reverse_complement(n0, k))
    c1, r1 = kops.canonical(n1, kops.reverse_complement(n1, k))
    q = jnp.stack([c0, c1], axis=1).reshape(-1, keys_l.shape[1])
    isrc = jnp.stack([r0, r1], axis=1).reshape(-1)
    lin_live = lin_l & ~dele_l
    qvalid = jnp.repeat(lin_live, 2)
    return q, isrc, qvalid


def make_linear_successors(g: ShardedKmerGraph, qcap: int):
    """(per shard) -> (on_chain (2cap,), nxt global state ids (2cap,),
    dropped)."""
    mesh, k, cap, n_shards = g.mesh, g.k, g.cap, g.n_shards
    steps, shift = g.pdir_steps, g.pdir_shift
    w = kops.num_words(k)

    def per_shard(keys_l, covs_l, dele_l, lin_l, pdir_l):
        me = jax.lax.axis_index(AXIS).astype(jnp.int32)
        q, isrc, qvalid = _local_exit_queries(keys_l, covs_l, dele_l,
                                              lin_l, k)
        h = kops.hash_words(q) % jnp.uint32(n_shards)
        dst = jnp.where(qvalid, h.astype(jnp.int32), n_shards)

        def answer(rows):
            gid = _owner_lookup_local(rows[:, :w], keys_l, dele_l, pdir_l,
                                      steps, shift, cap, me)
            return gid.astype(jnp.uint32)[:, None]

        out, dropped = _roundtrip(q, dst, n_shards, qcap, answer, 1)
        gid = out[:, 0].astype(jnp.int32)
        nxt = jnp.where(qvalid & (gid >= 0),
                        2 * gid + isrc.astype(jnp.int32), -1)
        return qvalid, nxt, jax.lax.psum(dropped[None], AXIS)

    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS),
                  P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P()),
    ))


# ---------------------------------------------------------------------------
# Distributed chain labeling (pointer doubling over ICI)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ShardedLabels:
    """ChainLabels with global state ids, arrays sharded P(shard)."""

    on_chain: jax.Array
    head: jax.Array  # (S,) int32 global state gid of the chain head
    rank: jax.Array
    length: jax.Array  # at head slots
    attach: jax.Array  # at head slots (global state id or -1)
    is_cycle: jax.Array
    is_head: jax.Array


class _LabelPrograms:
    """Compiled program set for one (mesh, states_per_shard, qcap)."""

    def __init__(self, mesh: Mesh, sps: int, qcap: int):
        self.mesh = mesh
        self.sps = sps  # states per shard
        self.qcap = qcap
        n_shards = mesh.devices.size
        self.n_shards = n_shards

        def prep(on, nxt):
            # prv[s] = nxt[s^1] ^ 1 — the mirror state s^1 is the
            # ADJACENT local slot (both states of a node are co-located)
            sidx = jax.lax.axis_index(AXIS).astype(jnp.int32) * sps \
                + jnp.arange(sps, dtype=jnp.int32)
            flip_nxt = jnp.where((jnp.arange(sps) & 1) == 0,
                                 jnp.roll(nxt, -1), jnp.roll(nxt, 1))
            prv = jnp.where(flip_nxt >= 0, flip_nxt ^ 1, -1)
            return sidx, prv

        def gather2(gidx, tbl):
            ok = gidx >= 0
            safe = jnp.maximum(gidx, 0)
            dst = jnp.where(ok, safe // sps, n_shards)
            slot = (safe % sps).astype(jnp.uint32)[:, None]

            def answer(rows):
                s = jnp.minimum(rows[:, 0].astype(jnp.int32), sps - 1)
                return tbl[s]

            out, dropped = _roundtrip(slot, dst, n_shards, qcap, answer,
                                      tbl.shape[1])
            return out, dropped

        def init_fn(on, nxt, is_head):
            sidx, prv = prep(on, nxt)
            # prv_on = on_chain[prv] (one distributed gather)
            onu = on.astype(jnp.uint32)[:, None]
            pv, d1 = gather2(prv, onu)
            prv_on = (prv >= 0) & (pv[:, 0] == 1)
            natural_head = on & ~prv_on
            ih = natural_head if is_head is None else is_head
            ptr = jnp.where(ih | ~on, sidx,
                            jnp.where(prv_on, prv, sidx))
            return ptr, natural_head, jax.lax.psum(d1[None] * 0 + d1[None],
                                                   AXIS)

        # one doubling round: (ptr2, val2) = (ptr[ptr], val + val[ptr])
        def round_add(ptr, val):
            tbl = jnp.stack([ptr.astype(jnp.uint32),
                             val.astype(jnp.uint32)], axis=1)
            out, _ = gather2(ptr, tbl)
            ptr2 = out[:, 0].astype(jnp.int32)
            val2 = val + out[:, 1].astype(jnp.int32)
            done = jnp.all(ptr2 == ptr)
            return ptr2, val2, jax.lax.psum(
                done[None].astype(jnp.int32), AXIS)

        def round_min(ptr, val):
            tbl = jnp.stack([ptr.astype(jnp.uint32),
                             val.astype(jnp.uint32)], axis=1)
            out, _ = gather2(ptr, tbl)
            ptr2 = out[:, 0].astype(jnp.int32)
            val2 = jnp.minimum(val, out[:, 1].astype(jnp.int32))
            done = jnp.all(ptr2 == ptr)
            return ptr2, val2, jax.lax.psum(
                done[None].astype(jnp.int32), AXIS)

        def finish_fn(on, nxt, ptr, rank, is_head):
            sidx, prv = prep(on, nxt)
            ihu = is_head.astype(jnp.uint32)[:, None]
            hv, _ = gather2(ptr, ihu)
            unreached = on & ~(hv[:, 0] == 1)
            head = jnp.where(on, ptr, -1)
            # length: members count per head slot, routed to the owner
            hdst = jnp.where(on, jnp.maximum(head, 0) // sps, n_shards)
            hslot = (jnp.maximum(head, 0) % sps).astype(jnp.uint32)
            b, _, _, _, dropped = _bucket_u32(
                hslot[:, None], hdst, n_shards, qcap)
            breq = jax.lax.all_to_all(b, AXIS, 0, 0, tiled=True)
            flat = breq.reshape(n_shards * qcap)
            valid = flat != jnp.uint32(0xFFFFFFFF)
            slots = jnp.where(valid, flat.astype(jnp.int32), sps)
            length = jnp.bincount(slots, length=sps + 1)[:sps]
            length = jnp.where(is_head, length, 0)
            # attach: each tail routes its nxt to its head's owner slot
            nxt_safe = jnp.where(nxt >= 0, nxt, 0)
            nv, _ = gather2(jnp.where(on, nxt, -1),
                            on.astype(jnp.uint32)[:, None])
            nxt_on = (nxt >= 0) & (nv[:, 0] == 1)
            is_tail = on & ~nxt_on
            adst = jnp.where(is_tail, jnp.maximum(head, 0) // sps, n_shards)
            arow = jnp.stack([
                (jnp.maximum(head, 0) % sps).astype(jnp.uint32),
                nxt.astype(jnp.uint32),
            ], axis=1)
            b2, _, _, _, d2 = _bucket_u32(arow, adst, n_shards, qcap)
            breq2 = jax.lax.all_to_all(b2, AXIS, 0, 0, tiled=True)
            flat2 = breq2.reshape(n_shards * qcap, 2)
            v2 = flat2[:, 0] != jnp.uint32(0xFFFFFFFF)
            s2 = jnp.where(v2, flat2[:, 0].astype(jnp.int32), sps)
            attach = jnp.full((sps,), -1, jnp.int32)
            attach = attach.at[s2].set(flat2[:, 1].astype(jnp.int32),
                                       mode="drop")
            attach = jnp.where(is_head, attach, -1)
            return (unreached, head, length, attach, is_tail,
                    jax.lax.psum((dropped + d2)[None], AXIS))

        sm = functools.partial(jax.shard_map, mesh=mesh)
        a1 = P(AXIS)
        self.init = jax.jit(sm(
            init_fn, in_specs=(a1, a1, a1), out_specs=(a1, a1, P())))
        self.init_nohead = jax.jit(sm(
            functools.partial(init_fn, is_head=None),
            in_specs=(a1, a1), out_specs=(a1, a1, P())))
        self.round_add = jax.jit(sm(
            round_add, in_specs=(a1, a1), out_specs=(a1, a1, P())))
        self.round_min = jax.jit(sm(
            round_min, in_specs=(a1, a1), out_specs=(a1, a1, P())))
        self.finish = jax.jit(sm(
            finish_fn, in_specs=(a1,) * 5,
            out_specs=(a1, a1, a1, a1, a1, P())))
        self.iota = jax.jit(sm(
            lambda: (jax.lax.axis_index(AXIS).astype(jnp.int32) * sps
                     + jnp.arange(sps, dtype=jnp.int32)),
            in_specs=(), out_specs=a1))


_label_prog_cache = {}


def _label_programs(mesh: Mesh, sps: int, qcap: int) -> _LabelPrograms:
    key = (mesh, sps, qcap)
    if key not in _label_prog_cache:
        _label_prog_cache[key] = _LabelPrograms(mesh, sps, qcap)
    return _label_prog_cache[key]


def label_chains_sharded(mesh: Mesh, on_chain, nxt,
                         qcap: Optional[int] = None) -> ShardedLabels:
    """Distributed pointer-doubling chain labels (ops/chains._label_core
    over the mesh).  Host-staged rounds: one replicated convergence
    scalar per doubling round."""
    n_shards = mesh.devices.size
    S = on_chain.shape[0]
    sps = S // n_shards
    if qcap is None:
        qcap = _next_pow2(2 * sps // n_shards + 16)
    prog = _label_programs(mesh, sps, qcap)
    sidx = prog.iota()

    def jump(ptr, val, rnd):
        for _ in range(2 * (max(S, 2) - 1).bit_length() + 2):
            ptr, val, done = rnd(ptr, val)
            if int(np.asarray(done)[0]) == n_shards:
                break
        return ptr, val

    # optimistic rank pass (no cycles)
    ptr, natural_head, _ = prog.init_nohead(on_chain, nxt)
    rank0 = jnp.where(on_chain & ~natural_head, 1, 0).astype(jnp.int32)
    rank0 = jax.device_put(rank0, NamedSharding(mesh, P(AXIS)))
    ptr_f, rank = jump(ptr, rank0, prog.round_add)
    unreached, head, length, attach, is_tail, dropped = prog.finish(
        on_chain, nxt, ptr_f, rank, natural_head)
    is_head = natural_head
    is_cycle = None
    if int(np.asarray(jnp.sum(unreached.astype(jnp.int32))))>0:
        # cycle pass: cut each cycle at its minimum global state id
        ptrA, natural_head, _ = prog.init_nohead(on_chain, nxt)
        ptrA, mn = jump(ptrA, sidx, prog.round_min)
        # reached a natural head?
        reached_tbl = natural_head.astype(jnp.uint32)
        # reuse finish's head-gather via a rank pass with corrected heads
        is_cycle = on_chain & ~_gather_flag(mesh, sps, qcap, ptrA,
                                            reached_tbl)
        art_head = is_cycle & (sidx == mn)
        is_head = natural_head | art_head
        ptr, _, _ = prog.init(on_chain, nxt, is_head)
        rank0 = jnp.where(on_chain & ~is_head, 1, 0).astype(jnp.int32)
        rank0 = jax.device_put(rank0, NamedSharding(mesh, P(AXIS)))
        ptr_f, rank = jump(ptr, rank0, prog.round_add)
        unreached, head, length, attach, is_tail, dropped = prog.finish(
            on_chain, nxt, ptr_f, rank, is_head)
        attach = jnp.where(is_cycle & is_head, -1, attach)
    if int(np.asarray(dropped)[0]):
        raise RuntimeError("label_chains_sharded dropped routed rows; "
                           "raise qcap")
    if is_cycle is None:
        is_cycle = jnp.zeros_like(on_chain)
    return ShardedLabels(
        on_chain=on_chain,
        head=head,
        rank=jnp.where(on_chain, rank, 0),
        length=length,
        attach=attach,
        is_cycle=is_cycle,
        is_head=is_head & on_chain,
    )


def _gather_flag(mesh, sps, qcap, gidx, flag_local):
    """flag[gidx] via one distributed gather (flag is a (S,) sharded
    uint32 0/1 array)."""
    n_shards = mesh.devices.size

    def per_shard(gi, fl):
        ok = gi >= 0
        safe = jnp.maximum(gi, 0)
        dst = jnp.where(ok, safe // sps, n_shards)
        slot = (safe % sps).astype(jnp.uint32)[:, None]

        def answer(rows):
            s = jnp.minimum(rows[:, 0].astype(jnp.int32), sps - 1)
            return fl[s][:, None]

        out, _ = _roundtrip(slot, dst, n_shards, qcap, answer, 1)
        return (out[:, 0] == 1) & ok

    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
    ))(gidx, flag_local)


# ---------------------------------------------------------------------------
# Sharded tip clipping (cutTipPreGraph.c removeSingleTips/removeMinorTips)
# ---------------------------------------------------------------------------


def _pack_label_table(labels: ShardedLabels, mesh: Mesh, sps: int):
    """Per-state u32 table for distributed gathers:
    cols = [on_chain, head, length, attach, head_of_flip, rank]."""

    def per_shard(on, head, length, attach, rank):
        headflip = jnp.where((jnp.arange(sps) & 1) == 0,
                             jnp.roll(head, -1), jnp.roll(head, 1))
        return jnp.stack([
            on.astype(jnp.uint32), head.astype(jnp.uint32),
            length.astype(jnp.uint32), attach.astype(jnp.uint32),
            headflip.astype(jnp.uint32), rank.astype(jnp.uint32),
        ], axis=1)

    a1 = P(AXIS)
    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=(a1,) * 5,
        out_specs=P(AXIS, None),
    ))(labels.on_chain, labels.head, labels.length, labels.attach,
       labels.rank)


class _TipPrograms:
    """Sharded mirror of kmer_graph._clip_apply — decisions at the tip
    start's shard, remote reads/writes routed to owners."""

    def __init__(self, g: ShardedKmerGraph, thin: bool, qcap: int):
        mesh, k, cap, n_shards = g.mesh, g.k, g.cap, g.n_shards
        steps, shift = g.pdir_steps, g.pdir_shift
        w = kops.num_words(k)
        sps = 2 * cap
        self.qcap = qcap

        def succ(keys_l, covs_l, dele_l, lin_l, pdir_l):
            me = jax.lax.axis_index(AXIS).astype(jnp.int32)
            single = covs_l[:, 8] == 1
            lin = (lin_l & single) if thin else lin_l
            q, isrc, qvalid = _local_exit_queries(keys_l, covs_l, dele_l,
                                                  lin, k)
            h = kops.hash_words(q) % jnp.uint32(n_shards)
            dst = jnp.where(qvalid, h.astype(jnp.int32), n_shards)

            def answer(rows):
                gid = _owner_lookup_local(rows[:, :w], keys_l, dele_l,
                                          pdir_l, steps, shift, cap, me)
                return gid.astype(jnp.uint32)[:, None]

            out, dropped = _roundtrip(q, dst, n_shards, qcap, answer, 1)
            gid = out[:, 0].astype(jnp.int32)
            nxt = jnp.where(qvalid & (gid >= 0),
                            2 * gid + isrc.astype(jnp.int32), -1)
            return qvalid, nxt, jax.lax.psum(dropped[None], AXIS)

        a1, a2 = P(AXIS), P(AXIS, None)
        self.succ = jax.jit(jax.shard_map(
            succ, mesh=mesh, in_specs=(a2, a2, a1, a1, a1),
            out_specs=(a1, a1, P()),
        ))

        def decide_apply(keys_l, covs_l, dele_l, lin_l, pdir_l, lbl_l):
            from ..models import kmer_graph as kg

            me = jax.lax.axis_index(AXIS).astype(jnp.int32)
            c = cap
            gl = kg.PreGraph(keys=keys_l, covs=covs_l,
                             n=jnp.zeros((), jnp.int32),
                             deleted=dele_l, linear=lin_l)
            single = covs_l[:, 8] == 1
            is_start, orient, base = kg._dead_end_starts(gl)
            if thin:
                is_start = is_start & single
            # first hop: oriented kmer + exit base -> canonical query
            cur = kg.oriented_kmer(keys_l, None, orient, k)
            nk = kops.shift_left_append(cur, base, k)
            canon, is_rc = kops.canonical(nk, kops.reverse_complement(nk, k))
            h = kops.hash_words(canon) % jnp.uint32(n_shards)
            dst = jnp.where(is_start, h.astype(jnp.int32), n_shards)

            def ans_lookup(rows):
                gid = _owner_lookup_local(rows[:, :w], keys_l, dele_l,
                                          pdir_l, steps, shift, cap, me)
                return gid.astype(jnp.uint32)[:, None]

            out, d1 = _roundtrip(canon, dst, n_shards, qcap, ans_lookup, 1)
            j = out[:, 0].astype(jnp.int32)
            first_state = jnp.where(j >= 0, 2 * j + is_rc.astype(jnp.int32),
                                    -1)

            def ans_lbl(rows):
                s = jnp.minimum(rows[:, 0].astype(jnp.int32), sps - 1)
                return lbl_l[s]

            def gather_lbl(gidx, valid):
                dstg = jnp.where(valid & (gidx >= 0),
                                 jnp.maximum(gidx, 0) // sps, n_shards)
                slot = (jnp.maximum(gidx, 0) % sps).astype(
                    jnp.uint32)[:, None]
                return _roundtrip(slot, dstg, n_shards, qcap, ans_lbl, 6)

            lf, d2 = gather_lbl(first_state, is_start)
            on_chain = is_start & (j >= 0) & (lf[:, 0] == 1)
            head = jnp.where(on_chain, lf[:, 1].astype(jnp.int32), -1)
            lh, d3 = gather_lbl(head, on_chain)
            chain_len = jnp.where(on_chain, lh[:, 2].astype(jnp.int32), 0)
            attach = jnp.where(on_chain, lh[:, 3].astype(jnp.int32),
                               first_state)
            tail_state = jnp.where(
                on_chain, lh[:, 4].astype(jnp.int32) ^ 1,
                jnp.arange(c, dtype=jnp.int32) * 0 - 1,
            )
            # tail of a non-chain tip is the start itself (local)
            self_state = (me * cap + jnp.arange(c, dtype=jnp.int32)) * 2 \
                + orient
            tail_state = jnp.where(on_chain, tail_state, self_state)
            count = 1 + chain_len
            has_attach = attach >= 0
            clippable = is_start & (j >= 0) & (count <= 2 * k) & has_attach

            # prev kmer words at the tail state's node (remote keys read)
            def ans_keys(rows):
                s = jnp.minimum(rows[:, 0].astype(jnp.int32), cap - 1)
                return keys_l[s]

            tnode = jnp.maximum(tail_state, 0) >> 1
            dstk = jnp.where(clippable, tnode // cap, n_shards)
            slotk = (tnode % cap).astype(jnp.uint32)[:, None]
            pk, d4 = _roundtrip(slotk, dstk, n_shards, qcap, ans_keys, w)
            t_or = jnp.maximum(tail_state, 0) & 1
            prev_kmer = jnp.where(
                (t_or == 1)[:, None], kops.reverse_complement(pk, k), pk)
            ch = kops.first_base(prev_kmer, k).astype(jnp.int32)

            # out node covs (remote read)
            def ans_covs(rows):
                s = jnp.minimum(rows[:, 0].astype(jnp.int32), cap - 1)
                cvu = covs_l[s].astype(jnp.uint32)
                return cvu

            out_state = jnp.maximum(attach, 0)
            out_node = out_state >> 1
            out_orient = out_state & 1
            dstc = jnp.where(clippable, out_node // cap, n_shards)
            slotc = (out_node % cap).astype(jnp.uint32)[:, None]
            oc, d5 = _roundtrip(slotc, dstc, n_shards, qcap, ans_covs,
                                covs_l.shape[1])
            oc = oc.astype(jnp.int32)
            oc = jnp.where(clippable[:, None], oc, 0)
            side_col = jnp.where(out_orient == 0, ch, 4 + (3 - ch))
            link_cov = jnp.take_along_axis(
                oc, jnp.clip(side_col, 0, 8)[:, None], axis=1)[:, 0]
            side_cols = jnp.where(out_orient[:, None] == 0, 0, 4) \
                + jnp.arange(4)[None, :]
            side_max = jnp.max(
                jnp.take_along_axis(oc, side_cols, axis=1), axis=1)
            deg = jnp.sum((oc[:, :8] > 0).astype(jnp.int32), axis=1)
            whole = deg == 1
            if thin:
                ok = clippable
            else:
                ok = clippable & (whole | (link_cov < side_max))

            # ---- apply ----
            # clipped chain heads -> owner flag table
            hdst = jnp.where(ok & on_chain, jnp.maximum(head, 0) // sps,
                             n_shards)
            hrow = (jnp.maximum(head, 0) % sps).astype(jnp.uint32)[:, None]
            b, _, _, _, d6 = _bucket_u32(hrow, hdst, n_shards, qcap)
            breq = jax.lax.all_to_all(b, AXIS, 0, 0, tiled=True)
            flat = breq.reshape(n_shards * qcap)
            hvalid = flat != jnp.uint32(0xFFFFFFFF)
            hslots = jnp.where(hvalid, flat.astype(jnp.int32), sps)
            clipped_head = jnp.zeros((sps,), bool).at[hslots].set(
                True, mode="drop")

            # member states: gather clipped_head at my labels' head
            my_on = lbl_l[:, 0] == 1
            my_head = lbl_l[:, 1].astype(jnp.int32)

            def ans_clip(rows):
                s = jnp.minimum(rows[:, 0].astype(jnp.int32), sps - 1)
                return clipped_head[s].astype(jnp.uint32)[:, None]

            mdst = jnp.where(my_on, jnp.maximum(my_head, 0) // sps,
                             n_shards)
            mrow = (jnp.maximum(my_head, 0) % sps).astype(
                jnp.uint32)[:, None]
            mc, d7 = _roundtrip(mrow, mdst, n_shards, qcap, ans_clip, 1)
            member_clipped = my_on & (mc[:, 0] == 1)
            del_member = member_clipped.reshape(c, 2).any(axis=1)

            # out-node commands: delete (whole) or cov zero (minor link)
            cmd_del = ok & whole
            cmd_zero = ok & ~whole
            crow = jnp.stack([
                (out_node % cap).astype(jnp.uint32),
                cmd_del.astype(jnp.uint32),
                jnp.clip(side_col, 0, 8).astype(jnp.uint32),
            ], axis=1)
            cdst = jnp.where(cmd_del | cmd_zero, out_node // cap, n_shards)
            cb, _, _, _, d8 = _bucket_u32(crow, cdst, n_shards, qcap)
            cbr = jax.lax.all_to_all(cb, AXIS, 0, 0, tiled=True)
            cflat = cbr.reshape(n_shards * qcap, 3)
            cvalid = cflat[:, 0] != jnp.uint32(0xFFFFFFFF)
            cslot = jnp.where(cvalid, cflat[:, 0].astype(jnp.int32), cap)
            cis_del = cvalid & (cflat[:, 1] == 1)
            del_out = jnp.zeros((c,), bool).at[
                jnp.where(cis_del, cslot, cap)].set(True, mode="drop")
            zslot = jnp.where(cvalid & ~cis_del, cslot, cap)
            covs_u = covs_l.at[
                zslot, jnp.where(cvalid, cflat[:, 2].astype(jnp.int32), 0)
            ].set(0, mode="drop")

            deleted = dele_l | ok | del_member | del_out
            covs_u = jnp.where(deleted[:, None], jnp.uint16(0), covs_u)
            g2 = kg.PreGraph(keys=keys_l, covs=covs_u,
                             n=jnp.zeros((), jnp.int32),
                             deleted=deleted, linear=lin_l)
            g2 = kg.mark_linear.__wrapped__(g2)
            n_clip = jax.lax.psum(jnp.sum(ok.astype(jnp.int32))[None], AXIS)
            drops = d1 + d2 + d3 + d4 + d5 + d6 + d7 + d8
            return (g2.covs, g2.deleted, g2.linear, n_clip,
                    jax.lax.psum(drops[None], AXIS))

        self.decide_apply = jax.jit(jax.shard_map(
            decide_apply, mesh=mesh,
            in_specs=(a2, a2, a1, a1, a1, a2),
            out_specs=(a2, a1, a1, P(), P()),
        ))


_tip_prog_cache = {}


def _tip_programs(g: ShardedKmerGraph, thin: bool, qcap: int):
    key = (g.mesh, g.cap, thin, qcap)
    if key not in _tip_prog_cache:
        _tip_prog_cache[key] = _TipPrograms(g, thin, qcap)
    return _tip_prog_cache[key]


def clip_tips_sharded(g: ShardedKmerGraph, thin: bool,
                      max_rounds: int = 100) -> Tuple[ShardedKmerGraph,
                                                      int]:
    """Sharded removeSingleTips (thin=True) / removeMinorTips fixpoint
    (thin=False); decision semantics mirror kmer_graph._clip_apply."""
    qcap = _next_pow2(4 * g.cap // g.n_shards + 64)
    prog = _tip_programs(g, thin, qcap)
    total = 0
    for _ in range(1 if thin else max_rounds):
        on_chain, nxt, dropped = prog.succ(g.keys, g.covs, g.deleted,
                                           g.linear, g.pdir)
        if int(np.asarray(dropped)[0]):
            raise RuntimeError("clip_tips_sharded: successor lookups "
                               "dropped; raise qcap")
        labels = label_chains_sharded(g.mesh, on_chain, nxt,
                                      qcap=_next_pow2(
                                          4 * g.cap // g.n_shards + 64))
        lbl = _pack_label_table(labels, g.mesh, 2 * g.cap)
        covs, deleted, linear, n_clip, drops = prog.decide_apply(
            g.keys, covs_arg(g), g.deleted, g.linear, g.pdir, lbl)
        if int(np.asarray(drops)[0]):
            raise RuntimeError("clip_tips_sharded: routed rows dropped; "
                               "raise qcap")
        g = dataclasses.replace(g, covs=covs, deleted=deleted,
                                linear=linear)
        n = int(np.asarray(n_clip)[0])
        total += n
        if n == 0:
            break
    return g, total


def covs_arg(g: ShardedKmerGraph):
    return g.covs


# ---------------------------------------------------------------------------
# Sharded edge (unitig) construction — node2edge.c over the mesh
# ---------------------------------------------------------------------------


class _EdgePrograms:
    """Program set for one (graph shape, scap/tcap bucket)."""

    def __init__(self, g: ShardedKmerGraph, qcap: int):
        mesh, k, cap, n_shards = g.mesh, g.k, g.cap, g.n_shards
        steps, shift = g.pdir_steps, g.pdir_shift
        w = kops.num_words(k)
        sps = 2 * cap
        self.w = w
        a1, a2 = P(AXIS), P(AXIS, None)
        sm = functools.partial(jax.shard_map, mesh=mesh)

        def counts(covs_l, dele_l, lin_l, lbl_l):
            branch = (~dele_l) & (~lin_l)
            right = covs_l[:, 4:8] > 0
            left = covs_l[:, 0:4] > 0
            nstart = jnp.sum(branch[:, None] & right) \
                + jnp.sum(branch[:, None] & left)
            on = lbl_l[:, 0] == 1
            # cycle head flags live in lbl col 5 high bit? keep separate:
            return jax.lax.pmax(nstart[None], AXIS)

        self.count_starts = jax.jit(sm(
            counts, in_specs=(a2, a1, a1, a2), out_specs=P()))

        def cyc_counts(cyc_head_l):
            return jax.lax.pmax(jnp.sum(cyc_head_l.astype(jnp.int32))[None],
                                AXIS)

        self.count_cyc = jax.jit(sm(
            cyc_counts, in_specs=(a1,), out_specs=P()))

        def _compact_lanes(mask_flat, scap):
            """Local lane compaction: indices of True entries (scap,)."""
            n = mask_flat.shape[0]
            keyf = jnp.where(mask_flat, 0, 1).astype(jnp.int32)
            iota = jnp.arange(n, dtype=jnp.int32)
            _, perm = jax.lax.sort((keyf, iota), num_keys=1, is_stable=True)
            lane = perm[:scap]
            valid = mask_flat[lane]
            return lane, valid

        def make_starts(scap: int):
            def starts_fn(keys_l, covs_l, dele_l, lin_l, pdir_l, lbl_l):
                from ..models import kmer_graph as kg

                me = jax.lax.axis_index(AXIS).astype(jnp.int32)
                branch = (~dele_l) & (~lin_l)
                right = covs_l[:, 4:8] > 0
                left = covs_l[:, 0:4] > 0
                sm_mask = jnp.stack(
                    [branch[:, None] & right,
                     branch[:, None] & left[:, ::-1]], axis=1,
                )  # (cap, 2, 4) same layout as single-dev _edges_masks
                lane, valid = _compact_lanes(sm_mask.reshape(-1), scap)
                s_node = lane >> 3
                s_orient = (lane >> 2) & 1
                s_base = (lane & 3).astype(jnp.uint32)
                node_key = keys_l[s_node]
                # first hop
                cur = kg.oriented_kmer(keys_l, s_node, s_orient, k)
                nk = kops.shift_left_append(cur, s_base, k)
                canon, is_rc = kops.canonical(
                    nk, kops.reverse_complement(nk, k))
                h = kops.hash_words(canon) % jnp.uint32(n_shards)
                dst = jnp.where(valid, h.astype(jnp.int32), n_shards)

                def ans_lookup(rows):
                    gid = _owner_lookup_local(rows[:, :w], keys_l, dele_l,
                                              pdir_l, steps, shift, cap, me)
                    return gid.astype(jnp.uint32)[:, None]

                out, d1 = _roundtrip(canon, dst, n_shards, qcap,
                                     ans_lookup, 1)
                j = out[:, 0].astype(jnp.int32)
                first_state = jnp.where(j >= 0,
                                        2 * j + is_rc.astype(jnp.int32), -1)

                def ans_lbl(rows):
                    s = jnp.minimum(rows[:, 0].astype(jnp.int32), sps - 1)
                    return lbl_l[s]

                fdst = jnp.where(valid & (j >= 0),
                                 jnp.maximum(first_state, 0) // sps,
                                 n_shards)
                frow = (jnp.maximum(first_state, 0) % sps).astype(
                    jnp.uint32)[:, None]
                lf, d2 = _roundtrip(frow, fdst, n_shards, qcap, ans_lbl, 6)
                chain_start = valid & (j >= 0) & (lf[:, 0] == 1)
                ch_len = jnp.where(chain_start,
                                   lf[:, 2].astype(jnp.int32), 0)
                attach = jnp.where(chain_start,
                                   lf[:, 3].astype(jnp.int32), -1)
                term_state = jnp.where(chain_start, attach, first_state)
                tail_state = jnp.where(
                    chain_start, lf[:, 4].astype(jnp.int32) ^ 1,
                    (me * cap + s_node) * 2 + s_orient)

                # remote keys at tail + term nodes
                def ans_keys(rows):
                    s = jnp.minimum(rows[:, 0].astype(jnp.int32), cap - 1)
                    return keys_l[s]

                tnode = jnp.maximum(tail_state, 0) >> 1
                tdst = jnp.where(valid & (tail_state >= 0), tnode // cap,
                                 n_shards)
                trow = (tnode % cap).astype(jnp.uint32)[:, None]
                pk, d3 = _roundtrip(trow, tdst, n_shards, qcap, ans_keys, w)
                t_or = jnp.maximum(tail_state, 0) & 1
                prev_kmer = jnp.where(
                    (t_or == 1)[:, None],
                    kops.reverse_complement(pk, k), pk)
                pfirst = kops.first_base(prev_kmer, k).astype(jnp.int32)

                enode = jnp.maximum(term_state, 0) >> 1
                edst = jnp.where(valid & (term_state >= 0), enode // cap,
                                 n_shards)
                erow = (enode % cap).astype(jnp.uint32)[:, None]
                ek, d4 = _roundtrip(erow, edst, n_shards, qcap, ans_keys, w)
                e_or = jnp.maximum(term_state, 0) & 1
                term_kmer = jnp.where(
                    (e_or == 1)[:, None],
                    kops.reverse_complement(ek, k), ek)
                tbase = jnp.where(
                    e_or == 0, kops.last_base(ek).astype(jnp.int32),
                    3 - kops.first_base(ek, k).astype(jnp.int32))
                # canonical key of the TERM node for host twin pairing
                term_key = ek
                # oriented first kmer of the edge
                fk_rc = kops.reverse_complement(node_key, k)
                first_kmer = jnp.where((s_orient == 1)[:, None], fk_rc,
                                       node_key)
                drops = jax.lax.psum((d1 + d2 + d3 + d4)[None], AXIS)
                head_gid = jnp.where(chain_start, first_state, -1)
                term_ok = term_state >= 0  # dangling chains have no edge
                return (valid, node_key, s_orient, s_base.astype(jnp.int32),
                        j, chain_start, ch_len, term_key,
                        e_or, pfirst, first_kmer,
                        tbase, head_gid, term_ok, drops)

            specs_out = (a1, a2, a1, a1, a1, a1, a1, a2, a1, a1, a2, a1,
                         a1, a1, P())
            return jax.jit(sm(
                starts_fn, in_specs=(a2, a2, a1, a1, a1, a2),
                out_specs=specs_out))

        self.make_starts = functools.lru_cache(maxsize=None)(make_starts)

        def make_cycles(ccap: int):
            def cyc_fn(keys_l, lbl_l, cyc_l, len_l):
                me = jax.lax.axis_index(AXIS).astype(jnp.int32)
                lane, valid = _compact_lanes(cyc_l, ccap)
                gid = me * sps + lane
                node = lane >> 1
                orient = lane & 1
                key = keys_l[node]
                length = len_l[lane]
                headflip = lbl_l[lane, 4].astype(jnp.int32)
                return valid, gid, key, orient, length, headflip

            return jax.jit(sm(
                cyc_fn, in_specs=(a2, a2, a1, a1),
                out_specs=(a1, a1, a2, a1, a1, a1)))

        self.make_cycles = functools.lru_cache(maxsize=None)(make_cycles)

        # state annotations: head gid -> edge id via replicated sorted map
        def annot_fn(lbl_l, sorted_heads, edge_ids):
            on = lbl_l[:, 0] == 1
            head = lbl_l[:, 1].astype(jnp.int32)
            pos = jnp.searchsorted(sorted_heads, head)
            safe = jnp.minimum(pos, jnp.maximum(sorted_heads.shape[0] - 1,
                                                0))
            hit = on & (sorted_heads.shape[0] > 0) \
                & (sorted_heads[safe] == head)
            state_edge = jnp.where(hit, edge_ids[safe], -1)
            state_rank = jnp.where(hit, lbl_l[:, 5].astype(jnp.int32), 0)
            return state_edge, state_rank

        self.annot = jax.jit(sm(
            annot_fn, in_specs=(a2, P(), P()),
            out_specs=(a1, a1)))

        def make_triples(tcap: int):
            def triples_fn(keys_l, covs_l, state_edge, state_rank,
                           e_cyc, e_len):
                # (edge, pos, base) rows for my interior states + per-edge
                # coverage partial sums
                e_pad = e_cyc.shape[0]
                ok = state_edge >= 0
                lane, valid = _compact_lanes(ok, tcap)
                se = state_edge[lane]
                sr = state_rank[lane]
                node = lane >> 1
                orient = lane & 1
                lb = kops.last_base(keys_l[node]).astype(jnp.int32)
                fb = kops.first_base(keys_l[node], k).astype(jnp.int32)
                base = jnp.where(orient == 0, lb, 3 - fb)
                es = jnp.maximum(se, 0)
                cyc = e_cyc[es] == 1
                elen = jnp.maximum(e_len[es], 1)
                pos = jnp.where(cyc, (sr - 1) % elen, sr)
                covs32 = covs_l.astype(jnp.int32)
                left_tot = jnp.repeat(covs32[:, 0:4].sum(axis=1), 2)
                symbol = jax.ops.segment_sum(
                    jnp.where(ok, left_tot, 0),
                    jnp.where(ok, state_edge, e_pad),
                    num_segments=e_pad + 1,
                )[:e_pad]
                symbol = jax.lax.psum(symbol, AXIS)
                return (valid, se, pos, base, symbol)

            return jax.jit(sm(
                triples_fn,
                in_specs=(a2, a2, a1, a1, P(), P()),
                out_specs=(a1, a1, a1, a1, P())))

        self.make_triples = functools.lru_cache(maxsize=None)(make_triples)

        def count_interior(state_edge):
            return jax.lax.pmax(
                jnp.sum((state_edge >= 0).astype(jnp.int32))[None], AXIS)

        self.count_interior = jax.jit(sm(
            count_interior, in_specs=(a1,), out_specs=P()))


_edge_prog_cache = {}


def _edge_programs(g: ShardedKmerGraph, qcap: int) -> _EdgePrograms:
    key = (g.mesh, g.cap, qcap)
    if key not in _edge_prog_cache:
        _edge_prog_cache[key] = _EdgePrograms(g, qcap)
    return _edge_prog_cache[key]


def build_edges_sharded(g: ShardedKmerGraph):
    """Contract all linear chains into directed edges with the k-mer
    table SHARDED throughout (node2edge.c kmer2edges over the mesh).

    Edge-level arrays (E rows) are assembled on the host in the
    single-device build's enumeration order — start triples sorted by
    (canonical key, orient, base) reproduce models/edges.build_edges's
    node-major scan, so edge IDS match the single-device build for
    acyclic graphs.  Returns (EdgeGraph with host arrays,
    state_edge (S*2cap,) SHARDED, state_rank SHARDED, labels)."""
    from ..models import edges as edge_mod

    mesh, k, cap = g.mesh, g.k, g.cap
    n_shards = g.n_shards
    w = kops.num_words(k)
    qcap = _next_pow2(8 * cap // n_shards + 64)
    prog = _edge_programs(g, qcap)

    succ = make_linear_successors(g, qcap)
    on_chain, nxt, dropped = succ(g.keys, g.covs, g.deleted, g.linear,
                                  g.pdir)
    if int(np.asarray(dropped)[0]):
        raise RuntimeError("build_edges_sharded: successor lookups "
                           "dropped; raise qcap")
    labels = label_chains_sharded(mesh, on_chain, nxt,
                                  qcap=qcap)
    lbl = _pack_label_table(labels, mesh, 2 * cap)

    # ---- start lanes ----
    nstart_max = int(np.asarray(
        prog.count_starts(g.covs, g.deleted, g.linear, lbl))[0])
    scap = _next_pow2(nstart_max + 1, lo=64)
    (valid, node_key, s_orient, s_base, j, chain_start, ch_len,
     term_key, term_or, pfirst, first_kmer, tbase, head_gid, term_ok,
     drops) = prog.make_starts(scap)(
        g.keys, g.covs, g.deleted, g.linear, g.pdir, lbl)
    if int(np.asarray(drops)[0]):
        raise RuntimeError("build_edges_sharded: start routing dropped; "
                           "raise qcap")
    valid = np.asarray(valid)
    keep = valid & (np.asarray(j) >= 0) & np.asarray(term_ok)
    node_key = np.asarray(node_key)[keep]
    s_orient = np.asarray(s_orient)[keep]
    s_base = np.asarray(s_base)[keep]
    chain_start = np.asarray(chain_start)[keep]
    ch_len = np.asarray(ch_len)[keep]
    term_key = np.asarray(term_key)[keep]
    term_or = np.asarray(term_or)[keep]
    pfirst = np.asarray(pfirst)[keep]
    first_kmer_all = np.asarray(first_kmer)[keep]
    tbase = np.asarray(tbase)[keep]
    head_gid = np.asarray(head_gid)[keep]

    # single-device enumeration order: node-major over the SORTED key
    # table = lexsort by (key words big-endian, orient, base)
    order = np.lexsort(
        (s_base, s_orient)
        + tuple(node_key[:, i] for i in range(w - 1, -1, -1))
    )
    node_key = node_key[order]
    s_orient = s_orient[order]
    s_base = s_base[order]
    chain_start = chain_start[order].astype(bool)
    ch_len = ch_len[order]
    term_key = term_key[order]
    term_or = term_or[order]
    pfirst = pfirst[order]
    first_kmer_all = first_kmer_all[order]
    tbase = tbase[order]
    head_gid = head_gid[order]
    nstarts = node_key.shape[0]

    # ---- cycle lanes ----
    cyc_flag, cyc_len = _cycle_heads(mesh, labels, 2 * cap)
    ncyc_max = int(np.asarray(prog.count_cyc(cyc_flag))[0])
    ncyc = 0
    if ncyc_max:
        ccap = _next_pow2(ncyc_max + 1, lo=64)
        cv, cgid, ckey, corient, clen, chf = prog.make_cycles(ccap)(
            g.keys, lbl, cyc_flag, cyc_len)
        cv = np.asarray(cv)
        cyc_gid = np.asarray(cgid)[cv]
        cyc_key = np.asarray(ckey)[cv]
        cyc_orient = np.asarray(corient)[cv]
        cyc_clen = np.asarray(clen)[cv]
        cyc_headflip = np.asarray(chf)[cv]
        corder = np.lexsort(
            (cyc_orient,)
            + tuple(cyc_key[:, i] for i in range(w - 1, -1, -1))
        )
        cyc_gid = cyc_gid[corder]
        cyc_key = cyc_key[corder]
        cyc_orient = cyc_orient[corder]
        cyc_clen = cyc_clen[corder]
        cyc_headflip = cyc_headflip[corder]
        ncyc = cyc_gid.shape[0]

    E = nstarts + ncyc
    edge_len = np.empty((E,), np.int64)
    edge_cycle = np.zeros((E,), bool)
    edge_chain_head = np.full((E,), -1, np.int64)  # GLOBAL state gid
    edge_len[:nstarts] = np.where(chain_start, ch_len + 1, 1)
    edge_chain_head[:nstarts] = np.where(chain_start, head_gid, -1)
    if ncyc:
        edge_len[nstarts:] = cyc_clen
        edge_cycle[nstarts:] = True
        edge_chain_head[nstarts:] = cyc_gid

    # twin pairing via (key bytes, orient, base) of the twin's start
    twin = np.full((E,), -1, np.int32)
    if nstarts:
        sid = {}
        for i in range(nstarts):
            sid[(node_key[i].tobytes(), int(s_orient[i]),
                 int(s_base[i]))] = i
        tb = 3 - pfirst
        for i in range(nstarts):
            keyt = (term_key[i].tobytes(), 1 - int(term_or[i]), int(tb[i]))
            twin[i] = sid.get(keyt, -1)
    if ncyc:
        h2e = {int(h): nstarts + i for i, h in enumerate(cyc_gid)}
        # the mirrored cycle's head: head[headstate ^ 1] (already gathered)
        for i in range(ncyc):
            twin[nstarts + i] = h2e.get(int(cyc_headflip[i]), -1)

    # ---- per-state annotations (stay sharded) ----
    e_pad = _next_pow2(E, lo=64)
    heads_order = np.argsort(edge_chain_head, kind="stable")
    sorted_heads = edge_chain_head[heads_order].astype(np.int32)
    sorted_ids = heads_order.astype(np.int32)
    nz = np.nonzero(sorted_heads >= 0)[0]
    sorted_heads = sorted_heads[nz]
    sorted_ids = sorted_ids[nz]
    state_edge, state_rank = prog.annot(
        lbl, jnp.asarray(sorted_heads), jnp.asarray(sorted_ids))

    # ---- sequence materialization ----
    seq_off = np.zeros((E + 1,), np.int64)
    np.cumsum(edge_len, out=seq_off[1:])
    total = int(seq_off[-1])
    seq_bases = np.full((total,), 255, np.uint8)
    tcap_max = int(np.asarray(prog.count_interior(state_edge))[0])
    tcap = _next_pow2(tcap_max + 1, lo=64)
    e_cyc_pad = np.zeros((e_pad,), np.int32)
    e_len_pad = np.zeros((e_pad,), np.int32)
    e_cyc_pad[:E] = edge_cycle
    e_len_pad[:E] = edge_len
    tv, te, tp, tb_, symbol = prog.make_triples(tcap)(
        g.keys, g.covs, state_edge, state_rank,
        jnp.asarray(e_cyc_pad), jnp.asarray(e_len_pad))
    tv = np.asarray(tv)
    te = np.asarray(te)[tv]
    tp = np.asarray(tp)[tv]
    tb2 = np.asarray(tb_)[tv]
    sel = (te >= 0) & (te < E)
    slots = seq_off[te[sel]] + tp[sel]
    seq_bases[slots] = tb2[sel].astype(np.uint8)
    symbol = np.asarray(symbol)[:E].astype(np.int64)

    # terminal base of non-cycle edges
    if nstarts:
        noncyc = np.arange(nstarts)
        seq_bases[seq_off[noncyc] + edge_len[noncyc] - 1] = \
            tbase.astype(np.uint8)

    first_kmer = np.zeros((E, w), np.uint32)
    first_kmer[:nstarts] = first_kmer_all
    if ncyc:
        fk = cyc_key
        rc = np.asarray(kops.reverse_complement(jnp.asarray(cyc_key), k))
        first_kmer[nstarts:] = np.where((cyc_orient == 1)[:, None], rc, fk)

    n_interior = np.where(edge_cycle, edge_len, edge_len - 1)
    cvg10 = np.zeros((E,), np.int32)
    nzi = n_interior > 0
    cvg10[nzi] = np.minimum(
        symbol[nzi] // n_interior[nzi] * 10, 16000).astype(np.int32)

    term_node_key = np.zeros((E, w), np.uint32)
    term_node_key[:nstarts] = term_key
    term_orient = np.zeros((E,), np.int8)
    term_orient[:nstarts] = term_or
    if ncyc:
        term_node_key[nstarts:] = cyc_key
        term_orient[nstarts:] = cyc_orient

    patch_keys, patch_edge, patch_twin = edge_mod.build_patch_table(
        seq_bases, seq_off, edge_len, edge_cycle, first_kmer, twin, k)

    eg = edge_mod.EdgeGraph(
        k=k,
        n_edges=E,
        seq_off=seq_off,
        seq_bases=seq_bases,
        first_kmer=first_kmer,
        from_node=np.zeros((E,), np.int32),  # node ids are sharded gids
        from_orient=np.concatenate(
            [s_orient.astype(np.int8),
             cyc_orient.astype(np.int8) if ncyc else
             np.zeros((0,), np.int8)]),
        to_node=np.zeros((E,), np.int32),
        to_orient=term_orient,
        cvg10=cvg10,
        twin=twin,
        is_cycle=edge_cycle,
        state_edge=state_edge,  # SHARDED device array (gid-indexed)
        state_rank=state_rank,  # SHARDED device array
        patch_keys=patch_keys,
        patch_edge=patch_edge,
        patch_twin=patch_twin,
    )
    return eg, labels


def _cycle_heads(mesh, labels: ShardedLabels, sps: int):
    def per_shard(is_cycle, is_head, length):
        flag = is_cycle & is_head
        return flag, jnp.where(flag, length, 0)

    a1 = P(AXIS)
    return jax.jit(jax.shard_map(
        per_shard, mesh=mesh, in_specs=(a1, a1, a1),
        out_specs=(a1, a1)))(labels.is_cycle, labels.is_head,
                             labels.length)


# ---------------------------------------------------------------------------
# Sharded arc pass with DISTRIBUTED k-mer lookups (no table replication)
# ---------------------------------------------------------------------------


class ShardedArcStreamDist:
    """Multi-chip arc pass where the k-mer table AND the per-state edge
    annotations stay hash-owner-sharded (prlRead2path.c's ownership model
    carried through: the round-2 stream replicated the whole lookup
    state, which caps out at one chip's HBM).  Per batch: each device
    extracts canonical k-mers from its read slice, routes each query to
    its hash owner, the owner answers with the EDGE id of the k-mer's
    hit state, and the requester reassembles per-position hits, forms
    (from, to) transitions and routes them to the from-edge's owner for
    LSM accumulation (reusing ShardedArcStream's reduce/merge)."""

    FLUSH_N = 16

    def __init__(self, g: ShardedKmerGraph, state_edge,
                 patch_keys, patch_edge, patch_twin,
                 init_cap_per_shard: int = 1 << 12,
                 bucket_cap: Optional[int] = None):
        from .shard_streams import ShardedArcStream

        self._g = g
        self.mesh = g.mesh
        self.k = g.k
        self.n_shards = g.n_shards
        self.bucket_cap = bucket_cap
        self.capacity = init_cap_per_shard
        self._pending: list = []
        self._pending_drop: list = []
        self._table = None
        self._n = None
        self._n_bound = 0
        self.dropped = 0
        self._sh2 = NamedSharding(self.mesh, P(AXIS, None))
        self._sh1 = NamedSharding(self.mesh, P(AXIS))
        self._rep = NamedSharding(self.mesh, P())
        dp = lambda x: jax.device_put(jnp.asarray(x), self._rep)
        self._patch = (dp(patch_keys), dp(patch_edge), dp(patch_twin))
        self._se = state_edge
        self._qcap = None
        self._route_cache = {}
        # borrow the per-shard LSM plumbing from the replicated stream
        self._reduce_fn = functools.partial(
            ShardedArcStream._reduce_fn.__wrapped__, self)
        self._reduce_fn = functools.lru_cache(maxsize=None)(self._reduce_fn)
        self._merge_fn = functools.lru_cache(maxsize=None)(
            functools.partial(ShardedArcStream._merge_fn.__wrapped__, self))
        self._flush_impl = ShardedArcStream._flush
        self.finish = functools.partial(ShardedArcStream.finish, self)

    def _route_fn(self, cap: int):
        if cap in self._route_cache:
            return self._route_cache[cap]
        from ..models import pregraph as pgm
        from .shard_streams import _bucket_pairs

        g = self._g
        n_shards, k, ncap = self.n_shards, self.k, g.cap
        steps, shift = g.pdir_steps, g.pdir_shift
        w = kops.num_words(k)
        sps = 2 * ncap
        qcap = self._qcap

        def per_shard(codes, lengths, keys_l, dele_l, pdir_l, se_l,
                      pk, pe, pt):
            me = jax.lax.axis_index(AXIS).astype(jnp.int32)
            out = kops.extract_kmers(codes, lengths, k)
            b, p, _ = out["words"].shape
            words = out["words"].reshape(b * p, w)
            valid = out["valid"].reshape(b * p)
            orient = out["is_rc"].reshape(b * p).astype(jnp.uint32)
            rows = jnp.concatenate([words, orient[:, None]], axis=1)
            h = kops.hash_words(words) % jnp.uint32(n_shards)
            dst = jnp.where(valid, h.astype(jnp.int32), n_shards)

            def answer(r):
                idx = sc.lookup_kmers_dir(keys_l, r[:, :w], pdir_l,
                                          steps, shift)
                safe = jnp.maximum(idx, 0)
                live = (idx >= 0) & ~dele_l[safe]
                st = jnp.clip(2 * safe + r[:, w].astype(jnp.int32),
                              0, sps - 1)
                edge = jnp.where(live, se_l[st], -1)
                return edge.astype(jnp.uint32)[:, None]

            ansr, d1 = _roundtrip(rows, dst, n_shards, qcap, answer, 1)
            hit = jnp.where(valid, ansr[:, 0].astype(jnp.int32), -1)
            hits = hit.reshape(b, p)
            if pk.shape[0] > 0:
                p_hit = pgm.patch_hits(out, k, pk, pe, pt)
                hits = jnp.where(hits >= 0, hits, p_hit)
            prev = pgm._last_seen_scan(hits)
            is_arc = (hits >= 0) & (prev >= 0) & (hits != prev)
            keys, d2 = _bucket_pairs(
                prev.reshape(-1), hits.reshape(-1), is_arc.reshape(-1),
                n_shards, cap,
            )
            keys = jax.lax.all_to_all(keys, AXIS, 0, 0, tiled=True)
            # d1 (lookup drops) must abort loudly — d2 (arc bucket
            # overflow) is the growable-capacity path the caller retries
            return (keys.reshape(n_shards * cap, 2),
                    (d2 + 0 * d1)[None], hits,
                    jax.lax.psum(d1[None], AXIS))

        fn = jax.jit(jax.shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(AXIS, None), P(AXIS), P(AXIS, None), P(AXIS),
                      P(AXIS), P(AXIS)) + (P(),) * 3,
            out_specs=(P(AXIS, None), P(AXIS), P(AXIS, None), P()),
        ))
        self._route_cache[cap] = fn
        return fn

    def add_batch(self, codes: np.ndarray, lengths: np.ndarray):
        B, L = codes.shape
        if self.bucket_cap is None:
            per_dev = B // self.n_shards
            self.bucket_cap = max(256, (per_dev * 8) // self.n_shards)
        if self._qcap is None:
            self._qcap = _next_pow2(
                2 * (B // self.n_shards) * (L - self.k + 1)
                // self.n_shards + 64)
        codes_d = jax.device_put(jnp.asarray(codes), self._sh2)
        lengths_d = jax.device_put(jnp.asarray(lengths), self._sh1)
        keys, dropped, hits, lk_drop = self._route_fn(self.bucket_cap)(
            codes_d, lengths_d, self._g.keys, self._g.deleted,
            self._g.pdir, self._se, *self._patch,
        )
        if int(np.asarray(lk_drop)[0]):
            raise RuntimeError("sharded arc pass: lookup routing dropped; "
                               "raise qcap")
        self._pending.append(keys)
        self._pending_drop.append(dropped)
        if len(self._pending) >= self.FLUSH_N:
            self._flush()
        return hits

    def _flush(self):
        self._flush_impl(self)


def build_arcs_sharded_dist(batches, eg, g: ShardedKmerGraph,
                            record_paths: bool = False):
    """Sharded arc pass over the sharded edge annotations; same return
    contract as models/pregraph.build_arcs."""
    from ..models import pregraph as pgm
    from .shard_streams import gather_arc_union

    stream = ShardedArcStreamDist(
        g, eg.state_edge, eg.patch_keys, eg.patch_edge, eg.patch_twin,
    )
    n_shards = g.n_shards
    marker = np.zeros((eg.n_edges,), np.int32)
    paths = [] if record_paths else None

    def record(hits_dev, n_rows):
        h = np.asarray(hits_dev)[:n_rows]
        for row in h:
            path = pgm._collapse_path(row)
            if len(path) >= 3:
                paths.append(path)
                marker[path] = np.minimum(marker[path] + 1, 255)

    in_flight = None
    for batch in batches:
        batch = batch.trimmed()
        codes, lengths = batch.codes, batch.lengths
        pad = (-codes.shape[0]) % n_shards
        if pad:
            codes = np.concatenate(
                [codes,
                 np.full((pad, codes.shape[1]), kops.BASE_N, np.uint8)]
            )
            lengths = np.concatenate(
                [lengths, np.zeros((pad,), lengths.dtype)])
        hits = stream.add_batch(codes, lengths)
        if record_paths:
            if in_flight is not None:
                record(*in_flight)
            in_flight = (hits, batch.n)
    if record_paths and in_flight is not None:
        record(*in_flight)
    keys, mult, n = stream.finish()
    uk, um = gather_arc_union(keys, mult, n)
    cap = _next_pow2(uk.shape[0] + 1)
    keys_p = np.full((cap, 2), 0xFFFFFFFF, np.uint32)
    mult_p = np.zeros((cap,), np.int32)
    keys_p[: uk.shape[0]] = uk
    mult_p[: um.shape[0]] = um
    arcs = pgm.ArcAccumulator(
        keys=jnp.asarray(keys_p),
        mult=jnp.asarray(mult_p),
        n=jnp.asarray(np.int32(uk.shape[0])),
    )
    return arcs, marker, paths


def download_branch_keys(g: ShardedKmerGraph) -> np.ndarray:
    """Branch-node (non-linear, live) canonical k-mers, host-sorted — the
    vertex-file content (output_pregraph.c output_vertex); E-scale, so
    the download never materializes the full table."""
    mesh = g.mesh

    def per_shard(keys_l, dele_l, lin_l):
        branch = (~dele_l) & (~lin_l)
        mx = jax.lax.pmax(jnp.sum(branch.astype(jnp.int32))[None], AXIS)
        return branch, mx

    branch, mx = jax.jit(jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P()),
    ))(g.keys, g.deleted, g.linear)
    bcap = _next_pow2(int(np.asarray(mx)[0]) + 1, lo=64)

    def compact(keys_l, branch_l):
        n = branch_l.shape[0]
        keyf = jnp.where(branch_l, 0, 1).astype(jnp.int32)
        iota = jnp.arange(n, dtype=jnp.int32)
        _, perm = jax.lax.sort((keyf, iota), num_keys=1, is_stable=True)
        lane = perm[:bcap]
        valid = branch_l[lane]
        return jnp.where(valid[:, None], keys_l[lane],
                         jnp.uint32(0xFFFFFFFF)), valid

    bk, bv = jax.jit(jax.shard_map(
        compact, mesh=mesh, in_specs=(P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS)),
    ))(g.keys, branch)
    bk = np.asarray(bk)[np.asarray(bv)]
    order = np.lexsort(tuple(bk[:, i] for i in range(bk.shape[1] - 1,
                                                     -1, -1)))
    return bk[order]
