"""The de Bruijn k-mer graph as flat device arrays + masked vector passes.

Replaces the reference's per-thread KmerSet hash tables with their
linear/deleted/single flag bits (standardPregraph/inc/newhash.h:90-103) and
the serial pruning passes of prlHashReads.c (``deLowCov:998``,
``Mark1in1outNode:1079``) and cutTipPreGraph.c (``removeSingleTips:363``,
``removeMinorTips:414``, ``clipTipFromNode:42``).

Graph state:
  keys    (C, W) uint32  sorted canonical k-mers (sentinel tail)
  covs    (C, 9) uint16  left cov x4 (cap 63), right cov x4 (cap 63),
                          total count (cap 255)
  n       scalar          live entries
  deleted (C,) bool
  linear  (C,) bool       in-degree == 1 and out-degree == 1

Degrees are counted exactly as the reference does — the number of bases
with a non-zero directional coverage (newhash.c ``count_branch2prev:625``)
— so pruning decisions match the capped-counter semantics bit for bit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import chains as chain_ops
from ..ops import kmer as kops
from ..ops import sortcount as sc


class PreGraph(NamedTuple):
    keys: jax.Array  # (C, W) uint32
    covs: jax.Array  # (C, 9) uint16
    n: jax.Array  # scalar int32
    deleted: jax.Array  # (C,) bool
    linear: jax.Array  # (C,) bool


def from_table(table: sc.KmerTable) -> PreGraph:
    c = table.keys.shape[0]
    live = jnp.arange(c, dtype=jnp.int32) < table.n
    return PreGraph(
        keys=table.keys,
        covs=table.covs,
        n=table.n,
        deleted=~live,
        linear=jnp.zeros((c,), bool),
    )


def degrees(covs) -> Tuple[jax.Array, jax.Array]:
    """(in_deg, out_deg) = #bases with cov>0 per side (count_branch2prev/next)."""
    l = covs[:, 0:4] > 0
    r = covs[:, 4:8] > 0
    return jnp.sum(l, axis=1).astype(jnp.int32), jnp.sum(r, axis=1).astype(jnp.int32)


@jax.jit
def de_low_cov(g: PreGraph, d: jax.Array) -> PreGraph:
    """-d pruning: zero directional covs <= d; delete nodes with no links
    left (prlHashReads.c ``thread_delow:953``).  Link covs are symmetric on
    both incident nodes, so no dislink pass is needed."""
    dircovs = g.covs[:, :8].astype(jnp.int32)
    dircovs = jnp.where((dircovs > 0) & (dircovs <= d), 0, dircovs)
    covs = g.covs.at[:, :8].set(dircovs.astype(jnp.uint16))
    dead = (jnp.sum(dircovs, axis=1) == 0) | g.deleted
    covs = jnp.where(dead[:, None], 0, covs)
    return g._replace(covs=covs, deleted=dead)


@jax.jit
def mark_linear(g: PreGraph) -> PreGraph:
    ind, outd = degrees(g.covs)
    lin = (~g.deleted) & (ind == 1) & (outd == 1)
    return g._replace(linear=lin)


@functools.partial(jax.jit, static_argnames=("new_cap",))
def _compact_to(g: PreGraph, new_cap: int) -> PreGraph:
    """Squeeze deleted rows out, keeping sorted key order (stable sort by
    the deleted flag); tail becomes sentinel rows."""
    c = g.keys.shape[0]
    flag = g.deleted.astype(jnp.int32)
    iota = jnp.arange(c, dtype=jnp.int32)
    _, perm = jax.lax.sort((flag, iota), num_keys=1, is_stable=True)
    perm = perm[:new_cap]
    dele = g.deleted[perm]
    keys = jnp.where(dele[:, None], jnp.uint32(0xFFFFFFFF), g.keys[perm])
    covs = jnp.where(dele[:, None], jnp.uint16(0), g.covs[perm])
    lin = jnp.where(dele, False, g.linear[perm])
    return PreGraph(
        keys=keys, covs=covs,
        n=jnp.sum((~dele).astype(jnp.int32)), deleted=dele, linear=lin,
    )


def compact_graph(g: PreGraph) -> PreGraph:
    """Shrink the table to the live entries (one scalar readback).

    After -d pruning drops the error-kmer singletons (~2/3 of the table
    on real error rates), every downstream pass — tip walks, chain
    labels, arc/map lookups, checkpoint downloads — would otherwise keep
    paying the dead rows' share of gathers and transfers.  The reference
    never compacts (its hash set just keeps deleted flags,
    newhash.h:90-103) because its passes iterate buckets; our passes are
    dense vector sweeps, so capacity IS cost."""
    c = g.keys.shape[0]
    n_live = int(jnp.sum((~g.deleted).astype(jnp.int32)))
    new_cap = max(1024, 1 << max(n_live, 1).bit_length())
    if new_cap >= c:
        return g
    return _compact_to(g, new_cap)


def kmer_freq_hist(g: PreGraph) -> jax.Array:
    """255-bin total-coverage histogram (*.kmerFreq; prlHashReads.c:1104)."""
    tot = jnp.clip(g.covs[:, 8].astype(jnp.int32), 0, 255)
    tot = jnp.where(g.deleted, 0, tot)
    return jnp.bincount(tot, length=256)[1:256]


# ---------------------------------------------------------------------------
# State-graph adjacency
# ---------------------------------------------------------------------------


def oriented_kmer(keys, idx, orient, k: int):
    """K-mer of state (idx, orient): canonical words or their revcomp.

    ``idx=None`` means "every row in order" — callers iterating all nodes
    must NOT pass arange: a gather indexed by an iota makes XLA remat a
    padded s32[C,1] iota copy (8 GB at 16M nodes)."""
    words = keys if idx is None else keys[idx]
    rc = kops.reverse_complement(words, k)
    return jnp.where(orient[..., None].astype(bool), rc, words)


def next_of(g: PreGraph, idx, orient, base, k: int, pdir=None,
            psteps: int = 0, pshift: int = 0):
    """Follow one de Bruijn step from state (idx, orient) via exit base.

    Returns (j, oj): target node index (-1 if absent/deleted) and its
    traversal orientation.  This is the vectorized form of the reference's
    nextKmer + reverseComplement + search_kmerset idiom (repeated all over
    cutTipPreGraph.c / node2edge.c).  ``idx=None`` = all nodes in order.
    ``pdir``/``psteps``/``pshift`` (sortcount.build_prefix_dir_device)
    shorten the lookup's dependent-gather chain ~3x at large tables.
    """
    cur = oriented_kmer(g.keys, idx, orient, k)
    nxt = kops.shift_left_append(cur, base, k)
    rc = kops.reverse_complement(nxt, k)
    canon, is_rc = kops.canonical(nxt, rc)
    if pdir is not None:
        j = sc.lookup_kmers_dir(g.keys, canon, pdir, psteps, pshift)
    else:
        j = sc.lookup_kmers(g.keys, canon)
    j = jnp.where((j >= 0) & ~g.deleted[jnp.maximum(j, 0)], j, -1)
    oj = is_rc.astype(jnp.int32)  # canonical != traversal kmer => flipped
    return j, oj


def _unique_base(covs4):
    """argmax base among covs (valid only when exactly one is non-zero)."""
    return jnp.argmax(covs4, axis=-1).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("k", "psteps", "pshift"))
def linear_next_states(g: PreGraph, k: int, pdir=None, psteps: int = 0,
                       pshift: int = 0):
    """(S,) successor state for each state of a linear node (-1 otherwise),
    plus the exit base per state.  S = 2*C."""
    c = g.keys.shape[0]
    covs = g.covs  # u16 throughout: the s32 copy alone is 1 GB at 16M nodes
    right_b = _unique_base(covs[:, 4:8])  # exit base, orientation 0
    left_b = _unique_base(covs[:, 0:4])
    exit0 = right_b
    exit1 = (3 - left_b) & 3  # orientation 1 exits via comp(left base)

    j0, o0 = next_of(g, None, jnp.zeros((c,), jnp.int32), exit0, k,
                     pdir, psteps, pshift)
    j1, o1 = next_of(g, None, jnp.ones((c,), jnp.int32), exit1, k,
                     pdir, psteps, pshift)

    lin = g.linear
    s0 = jnp.where(lin & (j0 >= 0), j0 * 2 + o0, -1)
    s1 = jnp.where(lin & (j1 >= 0), j1 * 2 + o1, -1)
    nxt = jnp.stack([s0, s1], axis=1).reshape(-1)
    exit_base = jnp.stack([exit0, exit1], axis=1).reshape(-1).astype(jnp.uint8)
    return nxt, exit_base


def label_linear_chains(g: PreGraph, k: int, chain_mask=None):
    """Chain labels over states of ``chain_mask`` nodes (default: linear)."""
    nxt, exit_base = linear_next_states(g, k)
    mask = g.linear if chain_mask is None else chain_mask
    on_chain = jnp.repeat(mask & ~g.deleted, 2)
    nxt = jnp.where(on_chain, nxt, -1)
    labels = chain_ops.label_chains(on_chain, nxt)
    return labels, exit_base


# ---------------------------------------------------------------------------
# Tip clipping
# ---------------------------------------------------------------------------


def _dead_end_starts(g: PreGraph):
    """Tip start nodes and their single exit, as states.

    clipTipFromNode:67-100: (in==0, out==1) walks right in canonical
    orientation; (in==1, out==0) walks left, i.e. orientation 1.
    Returns (is_start [C], start_state [C], exit_base [C]).
    """
    covs = g.covs
    ind, outd = degrees(g.covs)
    fwd = (ind == 0) & (outd == 1)
    bwd = (ind == 1) & (outd == 0)
    is_start = (~g.deleted) & (~g.linear) & (fwd | bwd)
    orient = jnp.where(fwd, 0, 1).astype(jnp.int32)
    base = jnp.where(
        fwd, _unique_base(covs[:, 4:8]), (3 - _unique_base(covs[:, 0:4])) & 3
    )
    return is_start, orient, base.astype(jnp.uint32)


@functools.partial(jax.jit,
                   static_argnames=("k", "thin", "psteps", "pshift"))
def _tip_chain_inputs(g: PreGraph, k: int, thin: bool, pdir=None,
                      psteps: int = 0, pshift: int = 0):
    """Device stage 1 of a clip sweep: successor states + chain mask."""
    single = g.covs[:, 8] == 1
    chain_mask = (g.linear & single) if thin else g.linear
    nxt, _ = linear_next_states.__wrapped__(g, k, pdir, psteps, pshift)
    on_chain = jnp.repeat(chain_mask & ~g.deleted, 2)
    return on_chain, jnp.where(on_chain, nxt, -1)


def _clip_tips_once(g: PreGraph, k: int, thin: bool, pdir_info=None):
    """One simultaneous tip-clipping sweep, staged on the host: chain
    inputs -> label pass (host-branched cycle handling) -> decisions.
    One fused jit inlined the label core twice via lax.cond — compile
    blowup and a worker-killing HBM peak at 33M states."""
    if pdir_info is None:
        pdir_info = sc.build_prefix_dir_device(g.keys, k)
    pdir, psteps, pshift = pdir_info
    on_chain, nxt = _tip_chain_inputs(g, k, thin, pdir, psteps, pshift)
    labels = chain_ops.label_chains_host(on_chain, nxt)
    return _clip_apply(g, labels, k, thin, pdir, psteps, pshift)


@functools.partial(jax.jit,
                   static_argnames=("k", "thin", "psteps", "pshift"))
def _clip_apply(g: PreGraph, labels, k: int, thin: bool, pdir=None,
                psteps: int = 0, pshift: int = 0):
    """Device stage 2: clip decisions + application, given chain labels."""
    c = g.keys.shape[0]
    cut_len = 2 * k
    covs = g.covs  # stays u16; s32 copies cost 1 GB each at 16M nodes
    single = covs[:, 8] == 1

    is_start, orient, base = _dead_end_starts(g)
    if thin:
        is_start = is_start & single
    idx = jnp.arange(c, dtype=jnp.int32)
    j, oj = next_of(g, None, orient, base, k, pdir, psteps, pshift)
    j_safe = jnp.maximum(j, 0)
    first_state = j * 2 + oj

    on_chain = labels.on_chain[jnp.maximum(first_state, 0)] & (j >= 0)
    head = jnp.where(on_chain, labels.head[jnp.maximum(first_state, 0)], -1)
    head_safe = jnp.maximum(head, 0)
    chain_len = jnp.where(on_chain, labels.length[head_safe], 0)
    # out_node state: chain attach, or the first hop if it isn't on a chain
    attach = jnp.where(on_chain, labels.attach[head_safe], first_state)
    count = 1 + chain_len

    has_attach = attach >= 0
    attach_safe = jnp.maximum(attach, 0)
    out_node = attach_safe >> 1
    out_orient = attach_safe & 1

    clippable = is_start & (j >= 0) & (count <= cut_len) & has_attach

    # base label of the link as seen from out_node: first char of the
    # previous oriented k-mer in the walk (clipTipFromNode ``ch``).
    # The previous k-mer's first base == the base that out_node sees on the
    # side it was entered from.  prev state: chain tail if chain else start.
    # Instead of recovering the tail, use the de Bruijn identity: the first
    # base of the previous k-mer is base (k-1) positions before out_node's
    # first base along the walk — equivalently, out_node's oriented k-mer's
    # first (k-1) bases are the previous k-mer's last (k-1), so the previous
    # k-mer's FIRST base is not recoverable from out_node alone; recover it
    # from the tail state directly below.
    # tail state of a head's chain by PURE GATHER: the flip-mirror of a
    # chain [h..t] is the chain [t^1..h^1], so tail(h) = head[h^1] ^ 1.
    # (The former scatter of an iota as updates made XLA materialize a
    # padded s32[S,1] iota copy — 16 GB at 33M states.)
    tail_state = jnp.where(
        on_chain, labels.head[head_safe ^ 1] ^ 1, idx * 2 + orient
    )  # if no chain, the 'previous' node is the tip start itself
    tail_safe = jnp.maximum(tail_state, 0)
    prev_kmer = oriented_kmer(g.keys, tail_safe >> 1, tail_safe & 1, k)
    ch = kops.first_base(prev_kmer, k).astype(jnp.int32)  # 0..3

    # out_node's link cov on the entered side, in out_node's canonical frame:
    # orientation 0 (entered canonically) => left side, base ch
    # orientation 1 => right side, base comp(ch)   (dislink2prevUncertain)
    side_col = jnp.where(out_orient == 0, ch, 4 + (3 - ch))
    link_cov = covs[out_node, side_col]
    side_cols = jnp.where(out_orient[:, None] == 0, 0, 4) + jnp.arange(4)[None, :]
    side_max = jnp.max(
        jnp.take_along_axis(covs[out_node], side_cols, axis=1), axis=1
    )

    ind_o, outd_o = degrees(g.covs)
    out_total_deg = ind_o[out_node] + outd_o[out_node]
    whole = out_total_deg == 1  # the out_node's only link is the tip itself

    if thin:
        ok = clippable
    else:
        ok = clippable & (whole | (link_cov < side_max))

    # --- apply ---
    # delete tip start nodes (ok is already indexed by node id)
    del_node = ok
    # delete chain interior nodes of clipped tips
    clipped_head = jnp.zeros((2 * c,), bool)
    clipped_head = clipped_head.at[
        jnp.where(ok & on_chain, head_safe, 2 * c)
    ].set(True, mode="drop")
    member_clipped = labels.on_chain & clipped_head[jnp.maximum(labels.head, 0)]
    # a node dies when either of its two states is a clipped chain member
    del_node = del_node | member_clipped.reshape(c, 2).any(axis=1)
    # out_node handling: delete it too when it had no other link; else
    # dislink the tip's cov entry and refresh its linear flag.
    del_out = jnp.zeros((c,), bool).at[
        jnp.where(ok & whole, out_node, c)
    ].set(True, mode="drop")
    del_node = del_node | del_out

    covs_u = covs.at[
        jnp.where(ok & ~whole, out_node, c), jnp.where(ok & ~whole, side_col, 0)
    ].set(0, mode="drop")

    deleted = g.deleted | del_node
    covs_u = jnp.where(deleted[:, None], jnp.uint16(0), covs_u)
    g2 = g._replace(covs=covs_u, deleted=deleted)
    g2 = mark_linear(g2)
    n_clipped = jnp.sum(ok.astype(jnp.int32))
    return g2, n_clipped


# --- walk-based clip sweep -------------------------------------------------
# The label-based sweep above labels EVERY linear chain of the graph per
# round — O(S log S) random gathers over 33M states, ~18 s/round on a
# v5e whose random gathers run ~50M elem/s.  But a round only touches
# the few thousand dead-end walks, each bounded by cut_len = 2k states:
# this kernel compacts the dead-end starts into (cap,) lanes and runs
# the reference's clipTipFromNode walk itself (cutTipPreGraph.c:42),
# one lockstep step per scan iteration — O(D * 2k) work instead.
# Decision semantics are identical to _clip_apply (parity-tested).


@functools.partial(jax.jit, static_argnames=("thin",))
def _count_starts(g: PreGraph, thin: bool):
    is_start, _, _ = _dead_end_starts(g)
    if thin:
        is_start = is_start & (g.covs[:, 8] == 1)
    return jnp.sum(is_start.astype(jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("k", "thin", "psteps", "pshift", "cap")
)
def _clip_tips_walk(g: PreGraph, k: int, thin: bool, pdir, psteps: int,
                    pshift: int, cap: int):
    C = g.keys.shape[0]
    cut_len = 2 * k
    covs = g.covs
    single = covs[:, 8] == 1

    is_start, orient_all, base_all = _dead_end_starts(g)
    if thin:
        is_start = is_start & single
    # compact start nodes into cap lanes (sort, no scatter)
    skey = jnp.where(is_start, 0, 1).astype(jnp.int32)
    iota = jnp.arange(C, dtype=jnp.int32)
    _, perm = jax.lax.sort((skey, iota), num_keys=1, is_stable=True)
    lane = perm[:cap]
    valid = is_start[lane]
    l_orient = orient_all[lane]
    l_base = base_all[lane]

    j0, oj0 = next_of(g, lane, l_orient, l_base, k, pdir, psteps, pshift)

    def step(carry, _):
        j, oj, pn, po, alive, chain_len = carry
        j_s = jnp.maximum(j, 0)
        cont = alive & (j >= 0) & g.linear[j_s] & ~g.deleted[j_s]
        if thin:
            cont = cont & single[j_s]
        visited = jnp.where(cont, j_s, C)
        rb = _unique_base(covs[j_s, 4:8])
        lb = _unique_base(covs[j_s, 0:4])
        base = jnp.where(oj == 0, rb, (3 - lb) & 3).astype(jnp.uint32)
        jn, ojn = next_of(g, j_s, oj, base, k, pdir, psteps, pshift)
        pn2 = jnp.where(cont, j_s, pn)
        po2 = jnp.where(cont, oj, po)
        j2 = jnp.where(cont, jn, j)
        oj2 = jnp.where(cont, ojn, oj)
        return (j2, oj2, pn2, po2, cont,
                chain_len + cont.astype(jnp.int32)), visited

    init = (j0, oj0, lane, l_orient, valid & (j0 >= 0),
            jnp.zeros((cap,), jnp.int32))
    (j, oj, pn, po, alive, chain_len), visited = jax.lax.scan(
        step, init, None, length=cut_len
    )

    attach = jnp.where(j >= 0, j * 2 + oj, -1)
    count = 1 + chain_len
    clippable = valid & (j0 >= 0) & (count <= cut_len) & (attach >= 0) \
        & ~alive
    out_node = jnp.maximum(attach, 0) >> 1
    out_orient = jnp.maximum(attach, 0) & 1

    prev_kmer = oriented_kmer(g.keys, pn, po, k)
    ch = kops.first_base(prev_kmer, k).astype(jnp.int32)
    side_col = jnp.where(out_orient == 0, ch, 4 + (3 - ch))
    link_cov = covs[out_node, side_col]
    side_cols = jnp.where(out_orient[:, None] == 0, 0, 4) \
        + jnp.arange(4)[None, :]
    side_max = jnp.max(
        jnp.take_along_axis(covs[out_node], side_cols, axis=1), axis=1
    )
    ind_o, outd_o = degrees(covs)
    whole = (ind_o[out_node] + outd_o[out_node]) == 1

    if thin:
        ok = clippable
    else:
        ok = clippable & (whole | (link_cov < side_max))

    del_node = jnp.zeros((C,), bool)
    del_node = del_node.at[jnp.where(ok, lane, C)].set(True, mode="drop")
    vis = jnp.where(ok[None, :], visited, C).reshape(-1)
    del_node = del_node.at[vis].set(True, mode="drop")
    del_node = del_node.at[
        jnp.where(ok & whole, out_node, C)
    ].set(True, mode="drop")

    covs_u = covs.at[
        jnp.where(ok & ~whole, out_node, C),
        jnp.where(ok & ~whole, side_col, 0),
    ].set(0, mode="drop")

    deleted = g.deleted | del_node
    covs_u = jnp.where(deleted[:, None], jnp.uint16(0), covs_u)
    g2 = g._replace(covs=covs_u, deleted=deleted)
    g2 = mark_linear(g2)
    return g2, jnp.sum(ok.astype(jnp.int32))


def _next_pow2_cap(d: int, lo: int = 1024) -> int:
    return max(lo, 1 << (max(d, 1) - 1).bit_length())


def _clip_tips_sweep(g: PreGraph, k: int, thin: bool, pdir_info):
    """One clip sweep via the walk kernel; lane capacity sized from a
    one-scalar start-count readback (pow2 buckets keep compile shapes
    few)."""
    pdir, psteps, pshift = pdir_info
    d = int(_count_starts(g, thin))
    if d == 0:
        return g, jnp.int32(0)
    cap = _next_pow2_cap(d)
    if cap >= g.keys.shape[0]:
        # tiny graphs: the label sweep costs nothing and avoids a
        # same-size compaction
        return _clip_tips_once(g, k, thin, pdir_info)
    return _clip_tips_walk(g, k, thin, pdir, psteps, pshift, cap)


def remove_single_tips(g: PreGraph, k: int, pdir_info=None
                       ) -> Tuple[PreGraph, jax.Array]:
    """Frequency-one tip removal (removeSingleTips, cutTipPreGraph.c:363).

    Returns (g, n_clipped) with n_clipped a DEVICE scalar — a readback
    over the tunnel costs seconds, so callers fetch counts lazily."""
    g = mark_linear(g)
    if pdir_info is None:
        pdir_info = sc.build_prefix_dir_device(g.keys, k)
    g, n = _clip_tips_sweep(g, k, thin=True, pdir_info=pdir_info)
    return g, n


def remove_minor_tips(g: PreGraph, k: int, max_rounds: int = 100,
                      pdir_info=None) -> Tuple[PreGraph, jax.Array]:
    """Minority-link tip removal to fixpoint (removeMinorTips:414).

    The fixpoint loop runs on the HOST (one scalar readback per round;
    tips converge in a handful of rounds) — wrapping the whole sweep in
    a device while_loop inlined the label core into one giant program
    whose compile time and HBM peak killed the worker at 33M states."""
    g = mark_linear(g)
    if pdir_info is None:
        pdir_info = sc.build_prefix_dir_device(g.keys, k)
    total = 0
    for _ in range(max_rounds):
        g, n = _clip_tips_sweep(g, k, thin=False, pdir_info=pdir_info)
        n = int(n)
        total += n
        if n == 0:
            break
    return g, jnp.int32(total)


@functools.partial(jax.jit, static_argnames=("k",))
def refresh_links(g: PreGraph, k: int, pdir=None, psteps: int = 0,
                  pshift: int = 0) -> PreGraph:
    """Zero directional covs whose neighbor k-mer no longer exists.

    Vectorized analog of the reference's dislink-on-delete bookkeeping —
    guarantees every cov>0 entry has a live neighbor before edge building.
    """
    c = g.keys.shape[0]
    covs = g.covs.astype(jnp.int32)
    for b in range(4):
        # right link, orientation 0, exit base b
        j, _ = next_of(g, None, jnp.zeros((c,), jnp.int32),
                       jnp.full((c,), b, jnp.uint32), k,
                       pdir, psteps, pshift)
        covs = covs.at[:, 4 + b].set(jnp.where(j >= 0, covs[:, 4 + b], 0))
        # left link: orientation 1 exit base comp(b) reaches the left
        # neighbor of base b
        j2, _ = next_of(
            g, None, jnp.ones((c,), jnp.int32),
            jnp.full((c,), (3 - b) & 3, jnp.uint32), k,
            pdir, psteps, pshift,
        )
        covs = covs.at[:, b].set(jnp.where(j2 >= 0, covs[:, b], 0))
    covs = jnp.where(g.deleted[:, None], 0, covs)
    g2 = g._replace(covs=covs.astype(jnp.uint16))
    return mark_linear(g2)


@jax.jit
def branch_count(linear, deleted):
    """Number of branch (non-linear, non-deleted) vertices."""
    return jnp.sum(~linear & ~deleted)


@functools.partial(jax.jit, static_argnames=("cap",))
def branch_keys_compact(keys, linear, deleted, cap: int):
    """Gather the branch vertices' keys into a (cap, W) array on device
    so the checkpoint downloads only E-scale rows, not the full table
    (the table download cost ~0.8 s per checkpoint at 2 Mb and scales
    with capacity; output_pregraph.c:48 likewise writes only branch
    kmers)."""
    branch = ~linear & ~deleted
    idx = jnp.nonzero(branch, size=cap, fill_value=0)[0]
    ok = jnp.arange(cap) < jnp.sum(branch)
    return jnp.where(ok[:, None], keys[idx], jnp.uint32(0))
