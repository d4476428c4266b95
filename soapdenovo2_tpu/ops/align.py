"""Batched banded edit distance — Pallas TPU kernel.

The reference scores bubble branches with a banded Needleman-Wunsch
(bubble.c ``compareSequences:509``) and gap-consensus overlaps
(localAsm.c:1727), one pair at a time on the CPU.  Here whole batches of
candidate pairs are scored at once: pairs live in the 128-wide lane
dimension, the alignment band in the sublane dimension, and the row
recurrence's in-row dependency (insertions) is resolved with a log-step
min-plus prefix scan instead of a serial inner loop.

Layout per grid block (PAIR_BLOCK = 128 pairs):
  a_ref    (L, 128) uint8   position-major so each DP row is one vector op
  b_ref    (L + BAND - 1, 128) uint8  front-padded by B_RADIUS rows
  len_ref  (2, 128) int32   a_len, b_len
  out_ref  (1, 128) int32   banded edit distance (>= INF if |la-lb| > B)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

B_RADIUS = 16  # band radius
BAND = 2 * B_RADIUS + 1  # band offsets d = j - i + B_RADIUS
INF = 1 << 20
PAIR_BLOCK = 128


def _shift_sub(x, sh: int, fill):
    """out[d] = x[d + sh] over the band (sublane) axis; fill at the edge."""
    if sh == 0:
        return x
    pad = jnp.full((abs(sh), x.shape[1]), fill, x.dtype)
    if sh > 0:
        return jnp.concatenate([x[sh:], pad], axis=0)
    return jnp.concatenate([pad, x[:sh]], axis=0)


def _band_kernel(a_ref, b_ref, len_ref, out_ref):
    L = a_ref.shape[0]
    n = a_ref.shape[1]
    a_len = len_ref[0:1, :]  # (1, n)
    b_len = len_ref[1:2, :]

    doff = jax.lax.broadcasted_iota(jnp.int32, (BAND, n), 0)  # band offset d
    inf = jnp.int32(INF)
    # row 0: D[0][j] = j for j in [0, B_RADIUS]; offset d = j + B_RADIUS
    row0 = jnp.where(doff >= B_RADIUS, doff - B_RADIUS, inf).astype(jnp.int32)
    target_d = b_len - a_len + B_RADIUS  # (1, n): where D[la][lb] lives
    out0 = jnp.where(
        (target_d >= 0) & (target_d < BAND) & (a_len == 0), b_len, inf
    ).astype(jnp.int32)

    def body(i, carry):
        row, out = carry
        # Mosaic needs 8-aligned dynamic sublane offsets: load aligned
        # blocks from the refs, then select the exact rows in-register
        base = pl.multiple_of(((i - 1) // 8) * 8, 8)
        r = i - 1 - base  # 0..7
        a_blk = a_ref[pl.ds(base, 8), :]  # (8, n) int32
        sel = jax.lax.broadcasted_iota(jnp.int32, (8, n), 0) == r
        a_i = jnp.sum(jnp.where(sel, a_blk, 0), axis=0, keepdims=True)
        # b[j-1] for j = i + d - B_RADIUS; b_ref is front-padded by
        # B_RADIUS rows, so the padded index is (i - 1) + d
        b_blk = b_ref[pl.ds(base, BAND + 15), :]  # covers offsets 0..7+BAND
        bwin = b_blk[0:BAND]
        for rr in range(1, 8):
            bwin = jnp.where(r == rr, b_blk[rr : rr + BAND], bwin)
        mismatch = (bwin != a_i).astype(jnp.int32)
        sub = row + mismatch
        dele = _shift_sub(row, 1, inf) + 1  # from D[i-1][j]: offset d+1
        pre = jnp.minimum(sub, dele)
        # in-row insertions D[i][j-1]+1: running min with slope 1 over d,
        # resolved in log2(BAND) doubling steps
        m = pre
        sh = 1
        while sh < BAND:
            m = jnp.minimum(m, _shift_sub(m, -sh, inf) + jnp.int32(sh))
            sh *= 2
        m = jnp.minimum(m, inf)
        # capture the answer on each pair's final row
        hit = (i == a_len) & (doff == target_d)  # (BAND, n)
        val = jnp.min(jnp.where(hit, m, inf), axis=0, keepdims=True)
        out = jnp.minimum(out, jnp.where(i == a_len, val, inf))
        return m, out

    _, out = jax.lax.fori_loop(1, L + 1, body, (row0, out0))
    out_ref[0:1, :] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _banded_dist_call(a, b, lens, interpret: bool):
    L = a.shape[0]
    npad = a.shape[1]
    grid = (npad // PAIR_BLOCK,)
    return pl.pallas_call(
        _band_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, PAIR_BLOCK), lambda i: (0, i)),
            pl.BlockSpec((L + BAND + 15, PAIR_BLOCK), lambda i: (0, i)),
            pl.BlockSpec((2, PAIR_BLOCK), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((1, PAIR_BLOCK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((1, npad), jnp.int32),
        interpret=interpret,
    )(a, b, lens)


def _banded_numpy(a_codes: np.ndarray, b_codes: np.ndarray,
                  a_len: np.ndarray, b_len: np.ndarray) -> np.ndarray:
    """Vectorized host-numpy banded DP, same contract as the kernel.

    Exists for non-TPU backends at LARGE shapes: the pallas interpret
    path lowers to one enormous XLA graph whose CPU compile SEGFAULTS
    around L~2048 (multik 1 Mb golden, bubble_pinch_paths).  The in-row
    insertion recurrence uses the exact slope-1 prefix-min identity
    (min_{d'<=d} m[d'] + (d-d')) instead of the kernel's doubling scan."""
    n = a_codes.shape[0]
    out = np.full((n,), INF, np.int64)
    if n == 0:
        return out.astype(np.int32)
    d_idx = np.arange(BAND, dtype=np.int64)
    row = np.where(d_idx >= B_RADIUS, d_idx - B_RADIUS, INF)[None, :]
    row = np.repeat(row, n, axis=0)
    a_len = np.asarray(a_len, np.int64)
    b_len = np.asarray(b_len, np.int64)
    target_d = b_len - a_len + B_RADIUS
    sel0 = (a_len == 0) & (target_d >= 0) & (target_d < BAND)
    out[sel0] = b_len[sel0]
    l_max = int(a_len.max())
    apad = a_codes.astype(np.int16)
    bpad = np.full((n, b_codes.shape[1] + BAND + 16), 254, np.int16)
    bpad[:, B_RADIUS:B_RADIUS + b_codes.shape[1]] = b_codes
    rows_idx = np.arange(n)
    for i in range(1, l_max + 1):
        a_i = apad[:, i - 1][:, None] if i - 1 < apad.shape[1] else \
            np.full((n, 1), 255, np.int16)
        bwin = bpad[:, i - 1: i - 1 + BAND]  # b[j-1], j = i + d - B_RADIUS
        sub = row + (bwin != a_i)
        dele = np.concatenate(
            [row[:, 1:], np.full((n, 1), INF, np.int64)], axis=1) + 1
        m = np.minimum(sub, dele)
        r = m - d_idx[None, :]
        np.minimum.accumulate(r, axis=1, out=r)
        np.minimum(m, r + d_idx[None, :], out=m)
        np.minimum(m, INF, out=m)
        row = m
        hit = a_len == i
        if hit.any():
            td = target_d[hit]
            ok = (td >= 0) & (td < BAND)
            vals = np.full(td.shape, INF, np.int64)
            hr = rows_idx[hit]
            vals[ok] = m[hr[ok], td[ok]]
            out[hit] = np.minimum(out[hit], vals)
    return np.minimum(out, INF).astype(np.int32)


def banded_edit_distance(
    a_codes: np.ndarray, b_codes: np.ndarray,
    a_len: np.ndarray, b_len: np.ndarray,
) -> np.ndarray:
    """Edit distance within a +/-16 band for N padded code pairs.

    a_codes/b_codes: (N, L) uint8 (values 0..3; padding arbitrary);
    returns (N,) int32, >= INF when the band cannot contain the alignment.
    """
    n = a_codes.shape[0]
    L = max(a_codes.shape[1], b_codes.shape[1])
    L = -(-L // 8) * 8  # aligned row count
    npad = max(PAIR_BLOCK, -(-n // PAIR_BLOCK) * PAIR_BLOCK)
    if jax.default_backend() not in ("tpu", "axon") and (
            L > 512 or npad > 2048):
        # interpret-mode pallas at these shapes segfaults the XLA CPU
        # compiler; small shapes stay on the interpret path so the
        # kernel logic keeps CPU test coverage
        return _banded_numpy(a_codes, b_codes, a_len, b_len)
    # int32 buffers sidestep the 8-bit tile alignment rules
    a = np.full((npad, L), 255, np.int32)
    a[:n, : a_codes.shape[1]] = a_codes
    bpad = np.full((npad, L + BAND + 15), 254, np.int32)
    bpad[:n, B_RADIUS : B_RADIUS + b_codes.shape[1]] = b_codes
    lens = np.zeros((2, npad), np.int32)
    lens[0, :n] = a_len
    lens[1, :n] = b_len
    a_t = np.ascontiguousarray(a.T)  # (L, npad)
    b_t = np.ascontiguousarray(bpad.T)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = _banded_dist_call(
        jnp.asarray(a_t), jnp.asarray(b_t), jnp.asarray(lens), interpret
    )
    return np.asarray(out)[0, :n]


def banded_similarity(
    a_codes: np.ndarray, b_codes: np.ndarray,
    a_len: np.ndarray, b_len: np.ndarray,
) -> np.ndarray:
    """1 - dist/maxlen, 0 where the band was exceeded (compareSequences'
    cutoff semantics)."""
    d = banded_edit_distance(a_codes, b_codes, a_len, b_len).astype(np.float64)
    denom = np.maximum(np.maximum(a_len, b_len), 1)
    sim = 1.0 - d / denom
    return np.where(d >= float(INF), 0.0, sim)
