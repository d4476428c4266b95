"""Batched device local assembly for scaffold gap filling.

TPU-native replacement for the reference's per-gap thread task queue
(standardPregraph/prlReadFillGap.c ``prlReadsCloseGap:1697`` popping
scaffolds off a mutex-guarded buffer, each thread running
localAsm.c ``localGraph:1575`` -> ``searchFgap:792`` serially): instead
of a task queue, G gaps are assembled **in lockstep** on the device —
each gap's mini de Bruijn table is built by a vmapped sort/segment-reduce
over its pooled reads, and the flank-to-flank walk advances all gaps one
base per step under ``lax.scan``.

Semantics mirror the host reference walk in models/gapfill.py exactly
(greedy highest-coverage extension, ties broken toward the larger base,
landing on the first-occurrence right-flank k-mer with
``len(bridge) >= k + landing_pos``), so the two paths are
interchangeable and parity-tested.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import kmer as kops
from . import sortcount as sc


class GapBatch(NamedTuple):
    """Static-shape inputs for one lockstep gap-fill batch (a pytree)."""

    reads: jax.Array      # (G, R, LR) uint8 codes, BASE_N padded
    lflank: jax.Array     # (G, F) uint8 — left flank, right-aligned (N pad)
    rflank: jax.Array     # (G, F) uint8 — right flank, left-aligned (N pad)
    limit: jax.Array      # (G,) int32 — per-gap max walk length
    live: jax.Array       # (G,) bool — padding rows are False


class GapResult(NamedTuple):
    success: jax.Array    # (G,) bool
    fill_len: jax.Array   # (G,) int32 — bases of the bridge to keep
    bases: jax.Array      # (G, MAX_WALK) uint8 base codes walked
    # some live step had a SECOND extension with cov >= min_cov: the
    # greedy walk may have picked the wrong branch — callers re-run such
    # gaps through the host DFS (searchFgap explores every branch)
    branched: jax.Array   # (G,) bool


def _one_gap_table(words, nxt, wt, valid, capacity: int):
    """One gap: (M, W) directed k-mers + next-base/weight -> sorted unique
    (capacity, W) keys with (capacity, 4) per-next-base weight sums.

    The sort/segment-reduce replacement for localAsm.c's per-gap hash
    inserts (``putKmer2DBgraph:122``).
    """
    m, w = words.shape
    words = jnp.where(valid[:, None], words, jnp.uint32(0xFFFFFFFF))
    payload = (nxt.astype(jnp.uint32) << 16) | wt.astype(jnp.uint32)
    operands = tuple(words[:, i] for i in range(w)) + (payload,)
    out = jax.lax.sort(operands, num_keys=w)
    sorted_words = jnp.stack(out[:w], axis=-1)
    pay = out[w]
    nxt_s = (pay >> 16).astype(jnp.int32)
    wt_s = (pay & jnp.uint32(0xFFFF)).astype(jnp.int32)
    _, is_new = sc._segment_ids(sorted_words)
    cols = jnp.stack(
        [jnp.where(nxt_s == c, wt_s, 0) for c in range(4)], axis=-1
    )  # (M, 4)
    sums = sc._group_sums(cols, is_new)
    live_head = is_new & ~sc._is_sentinel(sorted_words)
    keys, wcols = sc._sort_compact(sorted_words, sums, live_head, capacity)
    n_live = jnp.sum(live_head.astype(jnp.int32))
    alive = jnp.arange(capacity, dtype=jnp.int32) < n_live
    keys = jnp.where(alive[:, None], keys, jnp.uint32(0xFFFFFFFF))
    wcols = jnp.where(alive[:, None], wcols, 0)
    return keys, wcols


def _one_landing_table(words, pos, valid, capacity: int):
    """Right-flank k-mers -> sorted unique keys with FIRST-occurrence
    position (the ``landing`` dict of the host walk)."""
    m, w = words.shape
    words = jnp.where(valid[:, None], words, jnp.uint32(0xFFFFFFFF))
    operands = tuple(words[:, i] for i in range(w)) + (
        pos.astype(jnp.uint32),
    )
    out = jax.lax.sort(operands, num_keys=w + 1)  # pos ascending within key
    sorted_words = jnp.stack(out[:w], axis=-1)
    pos_s = out[w].astype(jnp.int32)
    _, is_new = sc._segment_ids(sorted_words)
    live_head = is_new & ~sc._is_sentinel(sorted_words)
    keys, cols = sc._sort_compact(
        sorted_words, pos_s[:, None], live_head, capacity
    )
    n_live = jnp.sum(live_head.astype(jnp.int32))
    alive = jnp.arange(capacity, dtype=jnp.int32) < n_live
    keys = jnp.where(alive[:, None], keys, jnp.uint32(0xFFFFFFFF))
    lpos = jnp.where(alive, cols[:, 0], -1)
    return keys, lpos


def _rc_codes(codes):
    """Reverse-complement rows of base codes (N maps to N)."""
    comp = jnp.where(codes < kops.BASE_N, (3 - codes) & 3, kops.BASE_N)
    return comp[..., ::-1].astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("k", "min_cov", "max_walk")
)
def fill_gap_batch(
    batch: GapBatch, k: int, min_cov: int, max_walk: int
) -> GapResult:
    """Assemble G gaps in lockstep.

    Phase 1 (table build): directed k-mer transitions from every pooled
    read (both strands, weight 1) and both flanks (weight ``min_cov`` —
    flanks are always trusted, localAsm.c seeds its graph with the
    contig ends) are sort/segment-reduced per gap into a binary-searchable
    extension table.

    Phase 2 (walk): from the left flank's last k-mer, every step picks the
    highest-weight next base (>= min_cov) until a right-flank k-mer is hit
    at a consistent offset (searchFgap:792's flank-to-flank path), all
    gaps advancing together under one ``lax.scan``.
    """
    G, R, LR = batch.reads.shape
    F = batch.lflank.shape[1]
    W = kops.num_words(k)

    # --- phase 1: per-gap transition tables --------------------------------
    fwd_w, fwd_v = kops.extract_kmers_directed(batch.reads, k)  # (G,R,P,W)
    rc_reads = _rc_codes(batch.reads)
    rc_w, rc_v = kops.extract_kmers_directed(rc_reads, k)
    lf_w, lf_v = kops.extract_kmers_directed(batch.lflank, k)  # (G,P_f,W)
    rf_w, rf_v = kops.extract_kmers_directed(batch.rflank, k)

    def next_bases(codes, P):
        # base following each window; BASE_N when absent
        nb = jnp.concatenate(
            [codes[..., k:], jnp.full(codes.shape[:-1] + (k - 1,),
                                      kops.BASE_N, jnp.uint8)],
            axis=-1,
        )[..., :P]
        return nb

    Pr = LR - k + 1
    Pf = F - k + 1
    nb_fwd = next_bases(batch.reads, Pr)
    nb_rc = next_bases(rc_reads, Pr)
    nb_lf = next_bases(batch.lflank, Pf)
    nb_rf = next_bases(batch.rflank, Pf)

    def flat_reads(wds, val, nb):
        return (
            wds.reshape(G, R * Pr, W),
            val.reshape(G, R * Pr),
            nb.reshape(G, R * Pr),
        )

    fw, fv, fn = flat_reads(fwd_w, fwd_v, nb_fwd)
    rw, rv, rn = flat_reads(rc_w, rc_v, nb_rc)

    words = jnp.concatenate([fw, rw, lf_w, rf_w], axis=1)  # (G, M, W)
    valid = jnp.concatenate([fv, rv, lf_v, rf_v], axis=1)
    nxt = jnp.concatenate([fn, rn, nb_lf, nb_rf], axis=1)
    wt = jnp.concatenate(
        [
            jnp.ones((G, 2 * R * Pr), jnp.int32),
            jnp.full((G, 2 * Pf), min_cov, jnp.int32),
        ],
        axis=1,
    )
    valid = valid & (nxt < kops.BASE_N)
    nxt = jnp.minimum(nxt, 3)
    M = words.shape[1]

    tab_keys, tab_w = jax.vmap(
        lambda w_, n_, t_, v_: _one_gap_table(w_, n_, t_, v_, M)
    )(words, nxt, wt, valid)

    rf_pos = jnp.broadcast_to(jnp.arange(Pf, dtype=jnp.int32)[None], (G, Pf))
    land_keys, land_pos = jax.vmap(
        lambda w_, p_, v_: _one_landing_table(w_, p_, v_, Pf)
    )(rf_w, rf_pos, rf_v)

    # --- phase 2: lockstep greedy walk --------------------------------------
    seed_codes = batch.lflank[:, F - k:]  # (G, k)
    seed_w, seed_v = kops.extract_kmers_directed(seed_codes, k)
    km0 = seed_w[:, 0, :]  # (G, W)
    start_ok = seed_v[:, 0] & batch.live

    lookup_g = jax.vmap(sc.lookup_kmers)  # per-gap tables

    def step(carry, t):
        km, done, success, fill_len, dead, branched = carry
        # per-gap walk budget (the host loop bound max_len)
        over = (t >= batch.limit) & ~done
        dead = dead | over
        done = done | over
        # landing check (host: loop-top, before extending)
        li = lookup_g(land_keys, km)  # (G,)
        lp = jnp.take_along_axis(
            land_pos, jnp.maximum(li, 0)[:, None], axis=1
        )[:, 0]
        land_ok = (li >= 0) & (t >= k + lp) & ~done
        success = success | land_ok
        fill_len = jnp.where(land_ok, t - k - lp, fill_len)
        done = done | land_ok
        # greedy extension
        ti = lookup_g(tab_keys, km)  # (G,)
        wrow = jnp.take_along_axis(
            tab_w,
            jnp.maximum(ti, 0)[:, None, None].repeat(4, axis=2),
            axis=1,
        )[:, 0, :]  # (G, 4)
        wrow = jnp.where((ti >= 0)[:, None], wrow, 0)
        score = wrow * 4 + jnp.arange(4, dtype=jnp.int32)[None, :]
        b = jnp.argmax(score, axis=-1).astype(jnp.uint32)  # max cov, then base
        c = jnp.take_along_axis(wrow, b[:, None].astype(jnp.int32),
                                axis=1)[:, 0]
        # second-best extension weight: branch ambiguity detector
        wrow2 = wrow.at[jnp.arange(G), b.astype(jnp.int32)].set(0)
        c2 = jnp.max(wrow2, axis=-1)
        branched = branched | ((c2 >= min_cov) & ~done)
        die = (c < min_cov) & ~done
        dead = dead | die
        done = done | die
        km_next = kops.shift_left_append(km, b, k)
        km = jnp.where(done[:, None], km, km_next)
        base_out = jnp.where(done, jnp.uint8(kops.BASE_N),
                             b.astype(jnp.uint8))
        return (km, done, success, fill_len, dead, branched), base_out

    init = (
        km0,
        ~start_ok,
        jnp.zeros((G,), bool),
        jnp.zeros((G,), jnp.int32),
        ~start_ok,
        jnp.zeros((G,), bool),
    )
    (km, done, success, fill_len, dead, branched), bases = jax.lax.scan(
        step, init, jnp.arange(max_walk, dtype=jnp.int32)
    )
    return GapResult(
        success=success & batch.live,
        fill_len=fill_len,
        bases=jnp.transpose(bases),  # (G, MAX_WALK)
        branched=branched & batch.live,
    )
