"""Bitonic merge of sorted multi-operand runs — the LSM flush primitive.

``jax.lax.sort`` on this target costs one full-bandwidth HBM pass per
compare-exchange stage (measured: cost scales exactly with the
``log2(n)*(log2(n)+1)/2`` stage count; no cross-stage fusion), so
re-sorting the already-sorted running k-mer table through the full
network every flush wastes ~log2(n)/2 x the work a MERGE needs.  Merging
two sorted runs is a single bitonic sequence away: ``concat(reverse(A),
B)`` is a "valley" (descending then ascending) = a rotation of a bitonic
sequence, and appending +inf sentinels keeps it bitonic, so ``log2(n)``
half-cleaner stages sort it — vs ``log2(n)*(log2(n)+1)/2`` for a full
sort.  Each stage is roll + select (full HBM bandwidth, no gathers —
TPU gathers measured ~70M elem/s vs ~750 GB/s streaming).

Both loops here run as ``lax.fori_loop`` with shape-invariant carries:
unrolling them makes XLA's buffer assignment keep every stage's
intermediates live simultaneously (measured: 17 GB for a 16M-row merge,
a compile-time HBM OOM), while the loop form reuses two buffers.

Reference context: this replaces the hash-table insert of
standardPregraph/newhash.c ``put_kmerset:473`` on the merge side of the
sorted-table design (see ops/sortcount.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

SENTINEL = jnp.uint32(0xFFFFFFFF)


def _lex_less_ops(a: Sequence[jax.Array], b: Sequence[jax.Array],
                  num_keys: int):
    """a < b lexicographically over the first ``num_keys`` operands."""
    lt = jnp.zeros(a[0].shape, bool)
    done = jnp.zeros(a[0].shape, bool)
    for i in range(num_keys):
        lt = lt | (~done & (a[i] < b[i]))
        done = done | (a[i] != b[i])
    return lt


def merge_sorted_ops(
    ops_a: Sequence[jax.Array],
    ops_b: Sequence[jax.Array],
    num_keys: int,
) -> Tuple[jax.Array, ...]:
    """Merge two ascending-sorted operand tuples into one sorted tuple.

    Key operands (the first ``num_keys``) must be uint32 with the all-ones
    sentinel reserved as "+inf" padding (the convention of the sorted
    k-mer tables).  Output length = next power of two >= lenA + lenB; the
    tail beyond lenA + lenB is sentinel-keyed padding (callers using
    sentinel-tailed fixed-capacity tables can use the full array).

    Layout trick: ``concat(reverse(A), B, pad)`` is bitonic, so log2(P)
    half-cleaner stages sort it.  Stage at distance d: position i pairs
    with i XOR d; the pair's min lands on the (i & d) == 0 side.  Rolls
    fetch both neighbours, so each stage is a constant number of
    full-bandwidth passes and the fori_loop reuses buffers.
    """
    if len(ops_a) != len(ops_b):
        raise ValueError("operand count mismatch")
    na, nb = ops_a[0].shape[0], ops_b[0].shape[0]
    total = na + nb
    p = 1 << max(1, (total - 1).bit_length())
    pad = p - total
    cat = []
    for i, (a, b) in enumerate(zip(ops_a, ops_b)):
        if a.dtype != jnp.uint32 or b.dtype != jnp.uint32:
            raise ValueError("merge_sorted_ops operands must be uint32")
        fill = SENTINEL if i < num_keys else jnp.uint32(0)
        parts = [jnp.flip(a, axis=0), b]
        if pad:
            parts.append(jnp.full((pad,), fill, jnp.uint32))
        cat.append(jnp.concatenate(parts))
    n_ops = len(cat)
    iota = jnp.arange(p, dtype=jnp.uint32)
    log_p = p.bit_length() - 1

    def stage(j, ops):
        d = (jnp.uint32(p) >> (j + 1)).astype(jnp.uint32)
        ds = d.astype(jnp.int32)
        fwd = [jnp.roll(op, -ds) for op in ops]  # value at i + d
        bwd = [jnp.roll(op, ds) for op in ops]  # value at i - d
        is_lo = (iota & d) == 0
        partner = [jnp.where(is_lo, f, b) for f, b in zip(fwd, bwd)]
        # lo side keeps min(x, partner); hi side keeps max(x, partner).
        # Both sides must agree on ties (strict compares), else equal-key
        # pairs duplicate one row and drop the other.
        p_less = _lex_less_ops(partner, ops, num_keys)
        x_less = _lex_less_ops(ops, partner, num_keys)
        take_partner = jnp.where(is_lo, p_less, x_less)
        return tuple(
            jnp.where(take_partner, q, x) for x, q in zip(ops, partner)
        )

    ops = jax.lax.fori_loop(0, log_p, stage, tuple(cat))
    return ops


def compact_by_shifts(
    keep: jax.Array, ops: Sequence[jax.Array]
) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
    """Left-pack rows where ``keep`` is True, preserving order — without
    a sort or a gather.

    Routing: dest(i) = rank of i among kept rows; delta = i - dest is
    non-decreasing over kept rows, so routing kept rows left by the
    binary decomposition of delta — LSB first — never collides: when a
    mover (bit j set) would land on a live non-mover (bit j clear), both
    having bits < j already cleared forces delta_mover == delta_resident,
    contradicting one having bit j set.  log2(n) full-bandwidth roll +
    select passes in a buffer-reusing fori_loop.

    Returns (packed ops, n_keep).  Rows past n_keep are garbage — callers
    mask or slice.  All operands must be uint32.
    """
    n = keep.shape[0]
    keep_i = keep.astype(jnp.int32)
    dest = jnp.cumsum(keep_i) - keep_i
    iota = jnp.arange(n, dtype=jnp.int32)
    dead = jnp.uint32(0xFFFFFFFF)
    delta = jnp.where(keep, (iota - dest).astype(jnp.uint32), dead)
    n_ops = len(ops)
    bits = max(1, (n - 1).bit_length())

    def round_(j, state):
        delta = state[0]
        ops = state[1:]
        s = (jnp.int32(1) << j).astype(jnp.int32)
        su = s.astype(jnp.uint32)
        in_range = iota < (n - s)
        src_delta = jnp.where(in_range, jnp.roll(delta, -s), dead)
        incoming = (src_delta != dead) & ((src_delta & su) != 0)
        new_ops = tuple(
            jnp.where(incoming, jnp.roll(op, -s), op) for op in ops
        )
        moved_out = (delta != dead) & ((delta & su) != 0)
        new_delta = jnp.where(
            incoming, src_delta - su,
            jnp.where(moved_out, dead, delta),
        )
        return (new_delta,) + new_ops

    state = jax.lax.fori_loop(0, bits, round_, (delta,) + tuple(ops))
    n_keep = jnp.sum(keep_i)
    return state[1:], n_keep
