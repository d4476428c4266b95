"""Sort-based k-mer counting and the sorted-table replacement for KmerSet.

The reference stores k-mers in per-thread open-addressing hash tables
(standardPregraph/newhash.c: ``put_kmerset:473`` increments 6-bit per-base
left/right coverage capped at 63 and an 8-bit total).  On TPU, pointer-free
and deterministic wins: the "hash table" is a **sorted flat array** of
multiword keys plus a (C, 9) coverage matrix

    cols 0..3 = left coverage per base (cap 63)
    cols 4..7 = right coverage per base (cap 63)
    col  8    = total occurrence count (cap 255)

Counting = sort + segment-reduce; merging two tables = concat + sort +
segment-reduce with saturating addition (identical semantics to repeated
saturating +1 increments, hence bit-equal coverage values to the
reference's capped counters).  Empty slots hold the all-ones sentinel and
sort to the end, so a table of static capacity C with a dynamic fill count
``n`` stays fully jit-compatible.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bitonic
from . import kmer as kops

COV_CAPS = jnp.array([63, 63, 63, 63, 63, 63, 63, 63, 255], dtype=jnp.int32)
N_COV = 9


class KmerTable(NamedTuple):
    """Sorted canonical-k-mer table (a pytree; capacity is static)."""

    keys: jax.Array  # (C, W) uint32, sorted ascending; sentinel-filled tail
    covs: jax.Array  # (C, N_COV) uint16
    n: jax.Array  # scalar int32, number of live entries


def empty_table(capacity: int, k: int) -> KmerTable:
    w = kops.num_words(k)
    return KmerTable(
        keys=jnp.full((capacity, w), 0xFFFFFFFF, dtype=jnp.uint32),
        covs=jnp.zeros((capacity, N_COV), dtype=jnp.uint16),
        n=jnp.zeros((), jnp.int32),
    )


def argsort_kmers(words):
    """Sort (N, W) multiword keys lexicographically; return (sorted, perm)."""
    n, w = words.shape
    iota = jnp.arange(n, dtype=jnp.int32)
    operands = tuple(words[:, i] for i in range(w)) + (iota,)
    out = jax.lax.sort(operands, num_keys=w)
    sorted_words = jnp.stack(out[:w], axis=-1)
    return sorted_words, out[w]


def _segment_ids(sorted_words):
    """0-based group ids over a sorted key array + new-group mask."""
    neq = jnp.any(sorted_words[1:] != sorted_words[:-1], axis=-1)
    is_new = jnp.concatenate([jnp.ones((1,), bool), neq])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    return seg, is_new


def _is_sentinel(words):
    return jnp.all(words == jnp.uint32(0xFFFFFFFF), axis=-1)


def _head_mask(sorted_words):
    """True at the first row of each group of equal sorted keys."""
    neq = jnp.any(sorted_words[1:] != sorted_words[:-1], axis=-1)
    return jnp.concatenate([jnp.ones((1,), bool), neq])


# ---------------------------------------------------------------------------
# MXU-tiled exact prefix sums (the scan engine under every segment reduce)
# ---------------------------------------------------------------------------


def exclusive_cumsum_cols(x, exact_max: int | None, tile: int = 512):
    """Exact per-column EXCLUSIVE prefix sums of a non-negative (N, C)
    int32 array, with the within-tile scan as one lower-triangular f32
    matmul on the MXU.

    XLA's native cumsum along a long leading axis is the dominant cost of
    the sort/segment-reduce counting path on TPU (it lowers to a
    logarithmic shift/add chain of full-array passes).  A strictly-lower-
    triangular ones matrix turns the within-tile scan into dense matmul
    work the MXU eats, leaving only a (N/tile, C) carry for the serial
    part.  f32 accumulation is EXACT while every within-tile sum stays
    under 2**24: callers pass ``exact_max`` (max per-row value) to pick
    the single-matmul path; values without a useful bound take the
    16-bit split path (two matmuls at tile=256, exact for the full u32
    range of row values).
    """
    n, c = x.shape
    if exact_max is not None and exact_max * tile < (1 << 24):
        split = False
    else:
        split = True
        tile = 256  # 256 * 65535 < 2**24: each half stays exact
    t = -(-n // tile)
    pad = t * tile - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, c), x.dtype)])
    if split:
        lo = (x & 0xFFFF).astype(jnp.float32)
        hi = ((x >> 16) & 0xFFFF).astype(jnp.float32)
        xt = jnp.concatenate([lo, hi], axis=1).reshape(t, tile, 2 * c)
    else:
        xt = x.astype(jnp.float32).reshape(t, tile, c)
    tri = jnp.tril(jnp.ones((tile, tile), jnp.float32), k=-1)
    within = jnp.einsum(
        "ij,tjc->tic", tri, xt, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    if split:
        within = within[..., :c] + (within[..., c:] << 16)
        xi = (x.reshape(t, tile, c)).astype(jnp.int32)
    else:
        xi = xt.astype(jnp.int32)
    tile_tot = within[:, -1, :] + xi[:, -1, :]  # (T, C) inclusive totals
    carry = jnp.cumsum(tile_tot, axis=0) - tile_tot  # exclusive, tiny
    out = (within + carry[:, None, :]).reshape(t * tile, c)
    return out[:n]


def reduce_sorted_groups(sorted_words, cols, capacity: int,
                         exact_max: int | None):
    """Sorted rows -> front-compacted unique keys + per-key column sums.

    The whole segment reduction is ONE exclusive prefix sum plus a head
    scatter: with ``cols`` zeroed on sentinel rows, group j's sum is
    ``S_ex[head_{j+1}] - S_ex[head_j]`` (the final live group differences
    against the grand total), so neither a next-head suffix scan nor a
    per-row gather is needed.  Head rank comes from the same prefix sum
    (an extra 0/1 column), giving the scatter slots for free.

    Returns (keys (capacity, W), sums (capacity, C) int32, n_live).
    """
    n, w = sorted_words.shape
    c = cols.shape[1]
    live_row = ~_is_sentinel(sorted_words)
    cols = jnp.where(live_row[:, None], cols, 0)
    is_new = _head_mask(sorted_words)
    live_head = is_new & live_row
    aug = jnp.concatenate(
        [cols, live_head.astype(jnp.int32)[:, None]], axis=1
    )
    bound = None if exact_max is None else max(int(exact_max), 1)
    S = exclusive_cumsum_cols(aug, bound)
    S_cols, head_rank = S[:, :c], S[:, c]
    total = S_cols[-1] + cols[-1]  # (C,)
    n_live = (head_rank[-1] + live_head[-1]).astype(jnp.int32)
    # head compaction WITHOUT a scatter (XLA scatters serialize on TPU):
    # a single-operand sort of (dead-bit | row-index) tags yields the
    # head positions in order; two ascending gathers fetch keys and S.
    idx31 = jnp.arange(n, dtype=jnp.uint32)
    tag = jnp.where(live_head, jnp.uint32(0), jnp.uint32(0x80000000)) | idx31
    tag_sorted = jax.lax.sort((tag,), num_keys=1)[0]
    take = min(capacity, n)
    head_pos = (tag_sorted[:take] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    if capacity > n:
        head_pos = jnp.concatenate(
            [head_pos, jnp.zeros((capacity - n,), jnp.int32)]
        )
    ukeys = sorted_words[head_pos]
    Sh = S_cols[head_pos]
    nxt = jnp.concatenate([Sh[1:], total[None]], axis=0)
    idx = jnp.arange(capacity, dtype=jnp.int32)
    nxt = jnp.where((idx[:, None] + 1) < n_live, nxt, total[None])
    sums = nxt - Sh
    live = idx < n_live
    sums = jnp.where(live[:, None], sums, 0)
    ukeys = jnp.where(live[:, None], ukeys, jnp.uint32(0xFFFFFFFF))
    return ukeys, sums, n_live


def reduce_sorted_groups_shift(sorted_words, cols, capacity: int,
                               exact_max: int | None):
    """``reduce_sorted_groups`` with the head compaction done by
    log-shift left-packing (ops/bitonic.py ``compact_by_shifts``) instead
    of the 1-operand tag sort + gathers.

    The tag sort costs a full O(n log^2 n) compare-exchange network and
    the two index gathers run at TPU-gather speed (~70M elem/s measured);
    the shift compaction is log2(n) full-bandwidth select passes carrying
    the key words and the running sums together, which measures ~2x
    faster at the 64M-row flush scale.  Semantics are identical.
    """
    n, w = sorted_words.shape
    c = cols.shape[1]
    live_row = ~_is_sentinel(sorted_words)
    cols = jnp.where(live_row[:, None], cols, 0)
    is_new = _head_mask(sorted_words)
    live_head = is_new & live_row
    bound = None if exact_max is None else max(int(exact_max), 1)
    S = exclusive_cumsum_cols(cols, bound)
    total = S[-1] + cols[-1]  # (C,)
    ops = tuple(sorted_words[:, i] for i in range(w)) + tuple(
        S[:, j].astype(jnp.uint32) for j in range(c)
    )
    packed, n_live = bitonic.compact_by_shifts(live_head, ops)
    take = min(capacity, n)
    ukeys = jnp.stack([p[:take] for p in packed[:w]], axis=-1)
    Sh = jnp.stack([p[:take] for p in packed[w:]], axis=-1).astype(jnp.int32)
    if capacity > n:
        ukeys = jnp.concatenate(
            [ukeys, jnp.zeros((capacity - n, w), jnp.uint32)]
        )
        Sh = jnp.concatenate([Sh, jnp.zeros((capacity - n, c), jnp.int32)])
    nxt = jnp.concatenate([Sh[1:], total[None]], axis=0)
    idx = jnp.arange(capacity, dtype=jnp.int32)
    nxt = jnp.where((idx[:, None] + 1) < n_live, nxt, total[None])
    sums = nxt - Sh
    live = idx < n_live
    sums = jnp.where(live[:, None], sums, 0)
    ukeys = jnp.where(live[:, None], ukeys, jnp.uint32(0xFFFFFFFF))
    return ukeys, sums, n_live.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Packed raw rows + the sorted-run LSM flush
# ---------------------------------------------------------------------------


class RawRows(NamedTuple):
    """Unsorted per-occurrence k-mer rows, 12 bytes each (the streaming
    count pass's batch output).  ``flank`` packs the strand-adjusted
    flanking base codes (left | right << 3, code 4 = none); one row = one
    occurrence, so the per-row coverage contribution is implicit.  Rows
    with sentinel keys are invalid padding."""

    keys: jax.Array  # (N, W) uint32; sentinel = invalid
    flank: jax.Array  # (N,) uint32
    n: jax.Array  # scalar int32: count of valid rows


def raw_rows(words, valid, left, right) -> RawRows:
    """Pack one extraction batch into RawRows (no sort, no reduce)."""
    words = jnp.where(valid[:, None], words, jnp.uint32(0xFFFFFFFF))
    flank = left.astype(jnp.uint32) | (right.astype(jnp.uint32) << 3)
    return RawRows(
        keys=words, flank=flank, n=jnp.sum(valid.astype(jnp.int32))
    )


def empty_raw(n: int, k: int) -> RawRows:
    w = kops.num_words(k)
    return RawRows(
        keys=jnp.full((n, w), 0xFFFFFFFF, dtype=jnp.uint32),
        flank=jnp.zeros((n,), jnp.uint32),
        n=jnp.zeros((), jnp.int32),
    )


def _flank_cols_from_code(flank):
    """(N,) packed flank codes -> (N, 9) one-hot coverage contributions."""
    left = flank & jnp.uint32(7)
    right = flank >> 3
    n = flank.shape[0]
    return jnp.stack(
        [(left == c).astype(jnp.int32) for c in range(4)]
        + [(right == c).astype(jnp.int32) for c in range(4)]
        + [jnp.ones((n,), jnp.int32)],
        axis=-1,
    )


@functools.partial(jax.jit, static_argnames=("capacity",))
def reduce_raws(raws, capacity: int) -> KmerTable:
    """Sort + reduce a tuple of RawRows into a compact KmerTable.

    The flush-side half of the streaming count pass: ONE 3-operand sort
    over the concatenated raw rows (the running table does NOT ride this
    sort — it merges separately via ``merge_sorted_tables``), then the
    segment reduce with shift-based compaction.  ``n`` of the result is
    the TRUE unique count even if it exceeds ``capacity`` (rows beyond
    capacity are truncated; callers check and retry bigger — the growth
    protocol of models/pregraph.py).
    """
    keys = jnp.concatenate([r.keys for r in raws], axis=0)
    flank = jnp.concatenate([r.flank for r in raws], axis=0)
    w = keys.shape[1]
    out = jax.lax.sort(
        tuple(keys[:, i] for i in range(w)) + (flank,), num_keys=w
    )
    sorted_words = jnp.stack(out[:w], axis=-1)
    cols = _flank_cols_from_code(out[w])
    ukeys, sums, n_live = reduce_sorted_groups_shift(
        sorted_words, cols, capacity, exact_max=1
    )
    covs = jnp.minimum(sums, COV_CAPS[None, :]).astype(jnp.uint16)
    return KmerTable(keys=ukeys, covs=covs, n=n_live)


def _sat_add_packed(a0, a1, b0, b1):
    """Per-lane saturating add of two packed cov words (4x6b+8b / 4x6b).

    Saturating (clamped) addition of non-negatives is associative, so
    folding packed rows pairwise gives the same value as any increment
    order (the reference's capped unit increments, newhash.h:25)."""
    m6 = jnp.uint32(63)
    m8 = jnp.uint32(255)
    o0 = jnp.zeros_like(a0)
    for sh in (0, 6, 12, 18):
        o0 |= jnp.minimum(((a0 >> sh) & m6) + ((b0 >> sh) & m6), m6) << sh
    o0 |= jnp.minimum(((a0 >> 24) & m8) + ((b0 >> 24) & m8), m8) << 24
    o1 = jnp.zeros_like(a1)
    for sh in (0, 6, 12, 18):
        o1 |= jnp.minimum(((a1 >> sh) & m6) + ((b1 >> sh) & m6), m6) << sh
    return o0, o1


@functools.partial(jax.jit, static_argnames=("capacity",))
def merge_sorted_tables(a: KmerTable, b: KmerTable,
                        capacity: int) -> KmerTable:
    """Merge two SORTED tables with a bitonic merge (log n stages) — not
    a full re-sort — then fold shared keys with saturating addition.

    This is the table side of the LSM flush: the running table is always
    sorted, so pushing it through the full O(n log^2 n) sort network
    every flush (the old merge_many path) wasted ~log(n)/2 x the work.

    Each input table has UNIQUE keys, so a key appears at most twice in
    the merged run — the reduce is a pairwise neighbour fold, not a
    general segment reduction.  That keeps the compaction's carried state
    at w+2 operands (the general path carries w+9 unpacked columns plus
    their prefix sums, which at 2^27 rows exceeds HBM on a 16 GB chip —
    the r1 5 Mb e2e OOM).
    """
    w = a.keys.shape[1]
    pa0, pa1 = _pack_covs(a.covs)
    pb0, pb1 = _pack_covs(b.covs)
    ops = bitonic.merge_sorted_ops(
        tuple(a.keys[:, i] for i in range(w)) + (pa0, pa1),
        tuple(b.keys[:, i] for i in range(w)) + (pb0, pb1),
        num_keys=w,
    )
    kcols = ops[:w]
    p0, p1 = ops[w], ops[w + 1]
    n = p0.shape[0]
    live = ~jnp.stack([kcols[i] == jnp.uint32(0xFFFFFFFF)
                       for i in range(w)], axis=0).all(axis=0)
    eq_next = jnp.ones((n,), bool)
    for i in range(w):
        eq_next &= kcols[i] == jnp.roll(kcols[i], -1)
    idx = jnp.arange(n)
    same_next = eq_next & live & (idx < n - 1)
    same_prev = jnp.concatenate([jnp.zeros((1,), bool), same_next[:-1]])
    f0, f1 = _sat_add_packed(p0, p1, jnp.roll(p0, -1), jnp.roll(p1, -1))
    s0 = jnp.where(same_next, f0, p0)
    s1 = jnp.where(same_next, f1, p1)
    head = live & ~same_prev
    packed, n_live = bitonic.compact_by_shifts(
        head, kcols + (s0, s1)
    )
    take = min(capacity, n)
    ukeys = jnp.stack([p[:take] for p in packed[:w]], axis=-1)
    q0 = packed[w][:take]
    q1 = packed[w + 1][:take]
    if capacity > n:
        pad = capacity - n
        ukeys = jnp.concatenate(
            [ukeys, jnp.zeros((pad, w), jnp.uint32)]
        )
        q0 = jnp.concatenate([q0, jnp.zeros((pad,), jnp.uint32)])
        q1 = jnp.concatenate([q1, jnp.zeros((pad,), jnp.uint32)])
    live_out = jnp.arange(capacity) < n_live
    ukeys = jnp.where(live_out[:, None], ukeys, jnp.uint32(0xFFFFFFFF))
    covs = jnp.where(
        live_out[:, None], _unpack_covs(q0, q1), 0
    ).astype(jnp.uint16)
    return KmerTable(keys=ukeys, covs=covs, n=n_live.astype(jnp.int32))


def grow_table(table: KmerTable, capacity: int) -> KmerTable:
    """Grow a sorted table's capacity: sentinel rows append in place (the
    sorted + sentinel-tail invariant is preserved by construction)."""
    c, w = table.keys.shape
    if capacity <= c:
        return table
    return KmerTable(
        keys=jnp.concatenate(
            [table.keys,
             jnp.full((capacity - c, w), 0xFFFFFFFF, jnp.uint32)]
        ),
        covs=jnp.concatenate(
            [table.covs, jnp.zeros((capacity - c, N_COV), jnp.uint16)]
        ),
        n=table.n,
    )


def _group_last(is_new):
    """Index of the LAST row of each row's group (sorted input): one
    simple suffix-min scan over next-head positions."""
    n = is_new.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    heads_at = jnp.where(is_new, iota, n)
    suf_min = jnp.flip(
        jax.lax.associative_scan(jnp.minimum, jnp.flip(heads_at))
    )
    nxt = jnp.concatenate([suf_min[1:], jnp.full((1,), n, jnp.int32)])
    return nxt - 1


def _group_sums(cols, is_new):
    """Per-group column sums, valid at each group's HEAD row.

    ``cols``: (N, C) int32 over sorted rows.  Inclusive cumsum + one
    boundary gather: sum(group of head h) = S[last] - S[h] + x[h].  No
    scatter-adds (TPU segment_sum is slow); the single-operand suffix-min
    scan and cumsum both compile and run fast, unlike a tuple-carrying
    segmented scan (pathological XLA compile times on this target).
    """
    last = _group_last(is_new)
    S = jnp.cumsum(cols, axis=0)
    return S[last] - S + cols


def _sort_compact(sorted_words, rows, is_new, capacity: int):
    """Move group-head rows to the front (in order) WITHOUT scatters:
    one stable 1-bit-key argsort + gathers.  Returns (keys, rows)."""
    n = sorted_words.shape[0]
    livekey = jnp.where(is_new, 0, 1).astype(jnp.uint32)
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((livekey, iota), num_keys=1, is_stable=True)
    keys = sorted_words[perm]
    rows = rows[perm]
    if capacity < n:
        keys = keys[:capacity]
        rows = rows[:capacity]
    elif capacity > n:
        keys = jnp.concatenate(
            [keys, jnp.full((capacity - n, keys.shape[1]), 0xFFFFFFFF,
                            jnp.uint32)]
        )
        rows = jnp.concatenate(
            [rows, jnp.zeros((capacity - n, rows.shape[1]), rows.dtype)]
        )
    return keys, rows


def _flank_cols(left, right, valid):
    """(N, 9) per-occurrence coverage contributions: 4 left one-hots,
    4 right one-hots, occurrence count."""
    n = left.shape[0]
    cols = jnp.stack(
        [(left == c).astype(jnp.int32) for c in range(4)]
        + [(right == c).astype(jnp.int32) for c in range(4)]
        + [jnp.ones((n,), jnp.int32)],
        axis=-1,
    )
    return jnp.where(valid[:, None], cols, 0)


def count_batch(words, valid, left, right, out_capacity: int,
                compact: bool = True):
    """Collapse one extraction batch into a k-mer table.

    Args:
      words: (N, W) canonical k-mers; valid: (N,) bool;
      left/right: (N,) uint8 strand-adjusted flanking base codes (4 = none).
      out_capacity: static output table capacity (>= N is always safe).
      compact: True -> sort + reduce to a binary-searchable unique table.
        False -> RAW mode (the streaming count pass): no sort at all;
        every valid row stays live with its per-occurrence one-hot covs
        and duplicate keys uncollapsed.  Saturating merge addition makes
        deferring the whole reduction to ``merge_many`` exact
        (min(cap, sum of partials) == min(cap, total)), so per-batch
        sorting would be pure overhead.  ``n`` is then the count of valid
        ROWS (an upper bound on unique keys, which is all the LSM flush
        sizing needs).  RAW tables are valid ONLY as merge_many inputs.

    Returns a KmerTable; compact covs are clipped to the saturating caps.
    """
    n, w = words.shape
    words = jnp.where(valid[:, None], words, jnp.uint32(0xFFFFFFFF))
    if not compact:
        if out_capacity != n:
            raise ValueError("raw tables keep their row count")
        covs = _flank_cols(left, right, valid).astype(jnp.uint16)
        return KmerTable(
            keys=words, covs=covs, n=jnp.sum(valid.astype(jnp.int32))
        )
    # pack the per-kmer flank codes INTO the sort payload word (bits 24..29
    # above a 24-bit row index) so the sort itself carries them instead of
    # two post-sort gathers
    iota = jnp.arange(n, dtype=jnp.uint32)
    payload = (
        iota
        | (left.astype(jnp.uint32) << 24)
        | (right.astype(jnp.uint32) << 27)
    )
    operands = tuple(words[:, i] for i in range(w)) + (payload,)
    out = jax.lax.sort(operands, num_keys=w)
    sorted_words = jnp.stack(out[:w], axis=-1)
    pay_s = out[w]
    left_s = (pay_s >> 24) & jnp.uint32(7)
    right_s = (pay_s >> 27) & jnp.uint32(7)
    cols = _flank_cols(
        left_s, right_s, jnp.ones((n,), bool)
    )  # sentinel rows zeroed inside reduce_sorted_groups
    keys, sums, n_live = reduce_sorted_groups(
        sorted_words, cols, out_capacity, exact_max=1
    )
    covs = jnp.minimum(sums, COV_CAPS[None, :]).astype(jnp.uint16)
    return KmerTable(keys=keys, covs=covs, n=n_live)


def _pack_covs(covs):
    """(N, 9) saturating covs (4x6b left, 4x6b right, 8b total) -> two
    u32 payload words.  The caps (63/63/255) make every table's covs fit
    56 bits, so the merge sort carries 8 payload bytes per row instead of
    36."""
    c = covs.astype(jnp.uint32)
    p0 = c[:, 0] | (c[:, 1] << 6) | (c[:, 2] << 12) | (c[:, 3] << 18) \
        | (c[:, 8] << 24)
    p1 = c[:, 4] | (c[:, 5] << 6) | (c[:, 6] << 12) | (c[:, 7] << 18)
    return p0, p1


def _unpack_covs(p0, p1):
    m6 = jnp.uint32(63)
    cols = [
        p0 & m6, (p0 >> 6) & m6, (p0 >> 12) & m6, (p0 >> 18) & m6,
        p1 & m6, (p1 >> 6) & m6, (p1 >> 12) & m6, (p1 >> 18) & m6,
        (p0 >> 24) & jnp.uint32(255),
    ]
    return jnp.stack([x.astype(jnp.int32) for x in cols], axis=-1)


@functools.partial(jax.jit, static_argnames=("capacity",))
def merge_many(tables, capacity: int) -> KmerTable:
    """Merge any number of tables in ONE sort + segment-reduce.

    Saturating addition: min(cap, sum) == the value after capped unit
    increments, so the merged table is identical to single-pass reference
    counting regardless of merge tree shape.
    """
    keys = jnp.concatenate([t.keys for t in tables], axis=0)
    covs = jnp.concatenate([t.covs for t in tables], axis=0)
    w = keys.shape[1]
    p0, p1 = _pack_covs(covs)
    out = jax.lax.sort(
        tuple(keys[:, i] for i in range(w)) + (p0, p1), num_keys=w
    )
    sorted_keys = jnp.stack(out[:w], axis=-1)
    cols = _unpack_covs(out[w], out[w + 1])
    # row values are clipped covs (<=255) or raw one-hots (<=1)
    ukeys, sums, n_live = reduce_sorted_groups(
        sorted_keys, cols, capacity, exact_max=255
    )
    merged = jnp.minimum(sums, COV_CAPS[None, :]).astype(jnp.uint16)
    return KmerTable(keys=ukeys, covs=merged, n=n_live)


def merge_tables(a: KmerTable, b: KmerTable, capacity: int) -> KmerTable:
    return merge_many((a, b), capacity)


def searchsorted_kmers(table_keys, queries):
    """Vectorized lower-bound binary search over sorted multiword keys.

    Args:
      table_keys: (C, W) sorted ascending (sentinel tail ok).
      queries: (..., W).
    Returns:
      idx: (...) int32 — position of the first key >= query.
    """
    c = table_keys.shape[0]
    steps = max(1, (c - 1).bit_length())
    # derive the carry init from the queries so its "varying" status under
    # shard_map matches the loop body's output (XLA folds the &0 away)
    vzero = (queries[..., 0] & jnp.uint32(0)).astype(jnp.int32)
    lo = vzero
    hi = vzero + jnp.int32(c)

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) >> 1
        mid_keys = table_keys[jnp.minimum(mid, c - 1)]
        less = kops.lex_less(mid_keys, queries)  # table[mid] < q
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps + 1, body, (lo, hi))
    return lo


def lookup_kmers(table_keys, queries):
    """Exact-match lookup: index into the table, or -1 if absent.

    Replaces ``search_kmerset`` (newhash.c:277) with a data-parallel
    binary search over the sorted key array.
    """
    c = table_keys.shape[0]
    if c == 0:
        return jnp.full(queries.shape[:-1], -1, jnp.int32)
    idx = searchsorted_kmers(table_keys, queries)
    safe = jnp.minimum(idx, c - 1)
    found = kops.lex_eq(table_keys[safe], queries)
    return jnp.where(found, safe, -1)


# -- prefix-directory accelerated lookup -------------------------------------
# The streaming lookups (arc pass, map pass) issue log2(C) DEPENDENT random
# gathers per query — ~24 HBM round-trips at 16M-row tables, the dominant
# cost of both passes.  A host-built bucket directory over the top bits of
# key word 0 narrows each query to its bucket in ONE gather; the remaining
# bisection needs only ceil(log2(max_bucket)) steps (typically 6-10).


def _auto_dir_bits(n_keys: int, bits: Optional[int]) -> int:
    """Directory width: 20 bits up to ~4M keys (the bench-warmed
    shapes), growing to 24 for E-scale tables — avg bucket stays ~4, so
    the bisection runs ~4 dependent gathers instead of ~8 (the lookup
    passes are gather-bound at ~50M elem/s; 50 Mb arc+map measured
    148+166 s at 20 bits)."""
    if bits is not None:
        return bits
    if n_keys <= (4 << 20):
        return 20
    return min(24, max(20, (n_keys - 1).bit_length() - 2))


def build_prefix_dir(keys: np.ndarray, k: int, bits: Optional[int] = None,
                     n: Optional[int] = None):
    """Host-side directory build over a sorted key array.

    Returns (directory (2^eff+1,) int32, steps, shift) where
    ``directory[b]`` is the first row whose word-0 top ``eff`` significant
    bits equal b.  Word 0 of a k-mer holds ``top_word_bits(k)``
    significant LOW bits (ops/kmer.py layout), hence the k-dependent
    shift.  ``n`` (live-row count) clamps the directory so SENTINEL tail
    rows never land in the last bucket — without it the sentinel run
    inflates max_bucket to ~capacity-n and ``steps`` back to ~log2(C),
    neutralizing the whole optimization."""
    bits = _auto_dir_bits(keys.shape[0], bits)
    w0_bits = kops.top_word_bits(k)
    eff = max(1, min(bits, w0_bits))
    shift = w0_bits - eff
    nb = 1 << eff
    if n is None:
        # derive the live count from the sentinel prefix (sorted keys:
        # sentinels sort last)
        w0 = keys[:, 0]
        n = int(np.searchsorted(w0, np.uint32(0xFFFFFFFF), side="left"))             if keys.shape[0] else 0
    top = np.minimum(keys[:n, 0].astype(np.uint64) >> shift, nb - 1)
    directory = np.searchsorted(
        top, np.arange(nb + 1, dtype=np.uint64), side="left"
    ).astype(np.int32)
    if n:
        max_bucket = int(np.diff(directory).max())
    else:
        max_bucket = 1
    steps = max(1, max_bucket.bit_length())
    return directory, steps, shift


@functools.partial(jax.jit, static_argnames=("shift", "nb"))
def _prefix_dir_device(keys, shift: int, nb: int):
    top = jnp.minimum(keys[:, 0] >> jnp.uint32(shift), jnp.uint32(nb - 1))
    directory = jnp.searchsorted(
        top, jnp.arange(nb + 1, dtype=jnp.uint32), side="left"
    ).astype(jnp.int32)
    # clamp sentinel tail rows out of every bucket (sorted keys: the
    # sentinel run starts at the live count) — else the last bucket's
    # size ~= capacity - n and the bisection step count degenerates
    n_live = jnp.searchsorted(keys[:, 0], jnp.uint32(0xFFFFFFFF),
                              side="left").astype(jnp.int32)
    return jnp.minimum(directory, n_live)


def build_prefix_dir_device(keys, k: int, bits: Optional[int] = None):
    """Directory build from DEVICE-resident sorted keys: one small jitted
    searchsorted (the top bits of sorted keys are themselves sorted) and a
    4 MB readback to derive the static bisection step count — avoids
    downloading the multi-hundred-MB key table.  Returns
    (directory device array, steps, shift)."""
    bits = _auto_dir_bits(keys.shape[0], bits)
    w0_bits = kops.top_word_bits(k)
    eff = max(1, min(bits, w0_bits))
    shift = w0_bits - eff
    nb = 1 << eff
    directory = _prefix_dir_device(keys, shift, nb)
    # scalar readback only: downloading the 4 MB directory to derive one
    # number cost ~0.5 s/call through the tunnel
    max_bucket = (int(_dir_max_bucket(directory))
                  if keys.shape[0] else 1)
    steps = max(1, max_bucket.bit_length())
    return directory, steps, shift


@jax.jit
def _dir_max_bucket(directory):
    return jnp.max(jnp.diff(directory))


def lookup_kmers_dir(table_keys, queries, directory, steps: int,
                     shift: int):
    """Directory-accelerated exact-match lookup (same contract as
    lookup_kmers).  ``steps``/``shift`` are static, from
    build_prefix_dir."""
    c = table_keys.shape[0]
    if c == 0:
        return jnp.full(queries.shape[:-1], -1, jnp.int32)
    nb = directory.shape[0] - 1
    q0 = queries[..., 0]
    b = jnp.minimum(
        (q0 >> jnp.uint32(shift)).astype(jnp.int32), nb - 1
    )
    lo = directory[b]
    hi = directory[b + 1]

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) >> 1
        mid_keys = table_keys[jnp.minimum(mid, c - 1)]
        less = kops.lex_less(mid_keys, queries)
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, steps + 1, body, (lo, hi))
    safe = jnp.minimum(lo, c - 1)
    found = kops.lex_eq(table_keys[safe], queries)
    return jnp.where(found, safe, -1)


def compact_mask(keys, payload_list, keep):
    """Stable-compact rows where ``keep`` is True to the front.

    Deleted rows become sentinel keys / zero payloads.  Returns
    (keys, payloads, n_keep).  Used by pruning passes to re-pack the table
    (the analog of the reference's ``deleted`` flag bits + rehash).
    """
    n = keys.shape[0]
    order_key = jnp.where(keep, 0, 1).astype(jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort((order_key, iota), num_keys=1, is_stable=True)
    keys2 = keys[perm]
    n_keep = jnp.sum(keep.astype(jnp.int32))
    live = iota < n_keep
    keys2 = jnp.where(live[:, None], keys2, jnp.uint32(0xFFFFFFFF))
    outs = []
    for p in payload_list:
        p2 = p[perm]
        mask = live[(...,) + (None,) * (p2.ndim - 1)]
        outs.append(jnp.where(mask, p2, 0))
    return keys2, outs, n_keep
