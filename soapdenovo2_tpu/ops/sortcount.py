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


def count_batch(words, valid, left, right, out_capacity: int,
                compact: bool = True):
    """Collapse one extraction batch into a sorted unique table.

    Args:
      words: (N, W) canonical k-mers; valid: (N,) bool;
      left/right: (N,) uint8 strand-adjusted flanking base codes (4 = none).
      out_capacity: static output table capacity (>= N is always safe).
      compact: move unique entries to the front (binary-searchable).
        With False (the streaming count pass), rows stay in sorted order
        with non-head rows sentineled — half the work, and merge_many
        accepts either form.

    Returns a KmerTable whose covs are the in-batch sums clipped to the
    saturating caps.
    """
    n, w = words.shape
    words = jnp.where(valid[:, None], words, jnp.uint32(0xFFFFFFFF))
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
    seg, is_new = _segment_ids(sorted_words)

    cols = jnp.stack(
        [(left_s == c).astype(jnp.int32) for c in range(4)]
        + [(right_s == c).astype(jnp.int32) for c in range(4)]
        + [jnp.ones((n,), jnp.int32)],
        axis=-1,
    )  # (N, 9): 8 one-hots + occurrence count
    sums = _group_sums(cols, is_new)  # valid at head rows

    n_groups = seg[-1] + 1
    has_sent = _is_sentinel(sorted_words[-1])
    n_live = (jnp.where(has_sent, n_groups - 1, n_groups)).astype(jnp.int32)

    sent_head = is_new & _is_sentinel(sorted_words)
    live_head = is_new & ~sent_head
    if compact:
        keys, covs = _sort_compact(
            sorted_words, sums, live_head, out_capacity
        )
        live = jnp.arange(out_capacity, dtype=jnp.int32) < n_live
        covs = jnp.where(live[:, None], covs, 0)
        keys = jnp.where(live[:, None], keys, jnp.uint32(0xFFFFFFFF))
    else:
        # mask-only batch table: head rows hold (key, sums); all other
        # rows are sentinels.  NOT binary-searchable (sentinels are
        # interspersed) — valid only as merge_many input.
        keys = jnp.where(
            live_head[:, None], sorted_words, jnp.uint32(0xFFFFFFFF)
        )
        covs = jnp.where(live_head[:, None], sums, 0)
        if out_capacity != n:
            raise ValueError("non-compact tables keep their row count")
    covs = jnp.minimum(covs, COV_CAPS[None, :]).astype(jnp.uint16)
    return KmerTable(keys=keys, covs=covs, n=n_live)


@functools.partial(jax.jit, static_argnames=("capacity",))
def merge_many(tables, capacity: int) -> KmerTable:
    """Merge any number of tables in ONE sort + segment-reduce.

    Saturating addition: min(cap, sum) == the value after capped unit
    increments, so the merged table is identical to single-pass reference
    counting regardless of merge tree shape.
    """
    keys = jnp.concatenate([t.keys for t in tables], axis=0)
    covs = jnp.concatenate(
        [t.covs.astype(jnp.int32) for t in tables], axis=0
    )
    sorted_keys, perm = argsort_kmers(keys)
    covs = covs[perm]
    seg, is_new = _segment_ids(sorted_keys)
    sums = _group_sums(covs, is_new)
    n_groups = seg[-1] + 1
    has_sent = _is_sentinel(sorted_keys[-1])
    n_live = (jnp.where(has_sent, n_groups - 1, n_groups)).astype(jnp.int32)
    live_head = is_new & ~_is_sentinel(sorted_keys)
    # unique-index scatter compaction: merges run once per FLUSH_N batches
    # so the scatter cost amortizes, and it compiles far faster than a
    # second full sort at these shapes
    head_slot = jnp.where(live_head, seg, capacity)
    ukeys = jnp.full((capacity, keys.shape[1]), 0xFFFFFFFF, jnp.uint32)
    ukeys = ukeys.at[head_slot].set(sorted_keys, mode="drop")
    merged = jnp.zeros((capacity, N_COV), jnp.int32)
    merged = merged.at[head_slot].set(sums, mode="drop")
    live = jnp.arange(capacity, dtype=jnp.int32) < n_live
    merged = jnp.where(live[:, None], merged, 0)
    ukeys = jnp.where(live[:, None], ukeys, jnp.uint32(0xFFFFFFFF))
    merged = jnp.minimum(merged, COV_CAPS[None, :]).astype(jnp.uint16)
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
    qshape = queries.shape[:-1]
    lo = jnp.zeros(qshape, jnp.int32)
    hi = jnp.full(qshape, c, jnp.int32)

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
    idx = searchsorted_kmers(table_keys, queries)
    safe = jnp.minimum(idx, c - 1)
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
