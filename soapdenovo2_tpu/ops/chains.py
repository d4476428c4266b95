"""Chain labeling by pointer doubling (parallel list ranking).

The reference walks linear k-mer chains with stacks and pointer chasing
(standardPregraph/node2edge.c ``stringBeads``/``make_edge``,
cutTipPreGraph.c ``clipTipFromNode``).  The TPU-native equivalent labels
ALL maximal chains at once: O(log n) rounds of gather ("pointer
jumping"), each a dense vector pass.

Works on a **state graph**: every graph node i yields two states
``s = 2*i + o`` — o=0 traverses the node in its canonical orientation
(exit through the right side), o=1 traverses the reverse complement
(exit through the left side, complemented).  k odd means no k-mer is its
own reverse complement, so orientation is unambiguous.  A maximal linear
chain appears as two mirrored state-chains, which is exactly how the
reference emits an edge and its twin.

Perf notes (TPU): random gathers dominate, so each doubling step gathers
ONE (S, 2) row array (pointer + carried value packed side by side)
instead of two (S,) arrays — half the random accesses.  The cycle-
detection pass is skipped entirely when the rank pass proves every state
reached a natural head (the overwhelmingly common case), at the cost of
one scalar device sync.
"""

from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp


class ChainLabels(NamedTuple):
    """Per-state chain labeling over S = 2*C states.

    Only meaningful where ``on_chain`` is True.
    """

    on_chain: jax.Array  # (S,) bool — state participates in a chain
    head: jax.Array  # (S,) int32 — head state id of this state's chain
    rank: jax.Array  # (S,) int32 — distance from head (head = 0)
    length: jax.Array  # (S,) int32 at head positions: #states in the chain
    attach: jax.Array  # (S,) int32 at head positions: state after the tail
    #                     (-1 if the chain dangles or is a cycle)
    is_cycle: jax.Array  # (S,) bool — chain is an isolated cycle
    is_head: jax.Array  # (S,) bool


def _doubling_steps(s: int) -> int:
    return max(1, (max(s, 2) - 1).bit_length()) + 1


def _jump(ptr, val, steps: int, reduce):
    """Pointer doubling carrying one value: two flat (S,) gathers per
    step.  A packed (S, 2) row gather halves the random accesses but
    forces an (8, 128)-tiled layout whose minor-dim padding is 64x —
    at 33M states XLA materialized a 16 GB padded iota copy and ran out
    of HBM; flat s32 vectors stay in (1024,)-tiled layout.

    Early termination (while_loop): TPU random gathers run at ~50M
    elem/s, so each 33M-state step costs ~1s — but the doubling
    converges in log2(max_chain) rounds, and tip chains are <= 2k
    states: ~7 rounds instead of 26.  The all-equal check per round is
    one cheap linear reduce."""

    def cond(st):
        i, p, v, done = st
        return (~done) & (i < steps)

    def body(st):
        i, p, v, done = st
        v2 = reduce(v, v[p])
        p2 = p[p]
        return i + 1, p2, v2, jnp.all(p2 == p)

    _, p, v, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), ptr, val, jnp.array(False)),
    )
    return p, v


@functools.partial(jax.jit, static_argnames=("with_cycles",))
def _label_core(on_chain_state, nxt, with_cycles: bool):
    """Rank pass (+ optional cycle pass).  Returns labels plus the mask of
    states that failed to reach a natural head (non-empty => cycles exist
    and the caller must re-run with with_cycles=True)."""
    S = nxt.shape[0]
    steps = _doubling_steps(S)
    sidx = jnp.arange(S, dtype=jnp.int32)

    nxt_safe = jnp.where(nxt >= 0, nxt, 0)
    nxt_on = (nxt >= 0) & on_chain_state[nxt_safe]
    # predecessor state: mirror of the flipped state's successor.  The
    # s -> s^1 flip is an adjacent-pair swap — do it with two 1-D rolls
    # and a parity select.  Neither a gather by (iota ^ 1) nor a
    # reshape to (S/2, 2) survives at scale: XLA materializes those as
    # (8,128)-tiled 2-D temps whose minor-dim padding is 64-128x
    # (8-16 GB at 33M states).
    flip_nxt = jnp.where((sidx & 1) == 0, jnp.roll(nxt, -1),
                         jnp.roll(nxt, 1))
    flip_nxt_safe = jnp.where(flip_nxt >= 0, flip_nxt, 0)
    prv = jnp.where(flip_nxt >= 0, flip_nxt_safe ^ 1, -1)
    prv_on = (prv >= 0) & on_chain_state[jnp.where(prv >= 0, prv, 0)]

    natural_head = on_chain_state & ~prv_on

    if with_cycles:
        # pass A: cycle members never reach a natural head; cut each cycle
        # at its minimum state id
        ptr = jnp.where(
            natural_head | ~on_chain_state, sidx, jnp.where(prv_on, prv, sidx)
        )
        ptr, mn = _jump(ptr, sidx, steps, jnp.minimum)
        reached = natural_head[ptr]
        is_cycle = on_chain_state & ~reached
        art_head = is_cycle & (sidx == mn)
        is_head = natural_head | art_head
    else:
        is_cycle = jnp.zeros((S,), bool)
        is_head = natural_head

    # pass B: rank by jumping to the head
    ptr = jnp.where(
        is_head | ~on_chain_state, sidx, jnp.where(prv_on, prv, sidx)
    )
    rank0 = jnp.where(on_chain_state & ~is_head, 1, 0).astype(jnp.int32)
    ptr, rank = _jump(ptr, rank0, steps, jnp.add)
    unreached = on_chain_state & ~is_head[ptr]  # empty unless cycles exist
    head = jnp.where(on_chain_state, ptr, -1)

    length = jax.ops.segment_sum(
        on_chain_state.astype(jnp.int32),
        jnp.where(on_chain_state, head, S - 1),
        num_segments=S,
    )
    length = jnp.where(is_head, length, 0)

    # attach: tail states are chain states whose nxt leaves the chain
    is_tail = on_chain_state & ~nxt_on
    attach = jnp.full((S,), -1, jnp.int32)
    attach = attach.at[jnp.where(is_tail, head, S)].set(nxt, mode="drop")
    attach = jnp.where(is_head, attach, -1)
    attach = jnp.where(is_cycle & is_head, -1, attach)

    labels = ChainLabels(
        on_chain=on_chain_state,
        head=head,
        rank=jnp.where(on_chain_state, rank, 0),
        length=length,
        attach=attach,
        is_cycle=is_cycle,
        is_head=is_head,
    )
    return labels, jnp.any(unreached)


def label_chains(on_chain_state, nxt) -> ChainLabels:
    """Label all maximal chains of the state graph.

    Args:
      on_chain_state: (S,) bool — states that belong to chainable nodes
        (e.g. ``linear & ~deleted`` expanded to both orientations).
      nxt: (S,) int32 — successor state of each chainable state, or -1.
        Must be flip-symmetric: nxt[s^1] mirrors the predecessor of s.

    Cycles (isolated circular chains) get an artificial head at their
    minimum state id, mirroring nothing in the reference (it handles loops
    ad hoc in make_edge) but giving deterministic circular-contig output.
    The cycle-cutting pass only runs when the optimistic rank pass proves
    cycles exist (lax.cond; cycles are rare in real graphs, so the usual
    cost is one doubling pass instead of two).
    """
    labels, has_cycles = _label_core(on_chain_state, nxt, with_cycles=False)
    return jax.lax.cond(
        has_cycles,
        lambda _: _label_core(on_chain_state, nxt, with_cycles=True)[0],
        lambda _: labels,
        None,
    )


# Past this size the single fused label program is replaced by the
# HOST-STEPPED staged path (below): same math, but each doubling round
# is its own small XLA program with donated buffers, so peak HBM per
# program is ~4 arrays instead of the fused while_loop's whole live set
# (the fused program faulted the tunneled worker at 128M states; its
# co-allocated cond/body buffers put it within double-buffer distance
# of the 16 GB ceiling).  One scalar early-exit readback per round.
LABEL_STAGED_THRESHOLD = int(
    __import__("os").environ.get("SOAP_TPU_LABEL_STAGED_THRESHOLD", 1 << 25)
)

# numpy escape hatch (download nxt/on_chain, label on host, ~4 min at
# 128M states over the tunnel).  Default off — the staged device path
# replaced it; settable for A/B or if a worker build regresses.
LABEL_HOST_THRESHOLD = int(
    __import__("os").environ.get("SOAP_TPU_LABEL_HOST_THRESHOLD", 1 << 62)
)


# ---- staged (host-stepped) label core: E-scale graphs ----------------

@jax.jit
def _stage_setup(on_chain_state, nxt):
    """Derived per-state inputs shared by both passes."""
    S = nxt.shape[0]
    sidx = jnp.arange(S, dtype=jnp.int32)
    nxt_safe = jnp.where(nxt >= 0, nxt, 0)
    nxt_on = (nxt >= 0) & on_chain_state[nxt_safe]
    flip_nxt = jnp.where((sidx & 1) == 0, jnp.roll(nxt, -1),
                         jnp.roll(nxt, 1))
    flip_nxt_safe = jnp.where(flip_nxt >= 0, flip_nxt, 0)
    prv = jnp.where(flip_nxt >= 0, flip_nxt_safe ^ 1, -1)
    prv_on = (prv >= 0) & on_chain_state[jnp.where(prv >= 0, prv, 0)]
    natural_head = on_chain_state & ~prv_on
    return nxt_on, prv, prv_on, natural_head


@jax.jit
def _stage_ptr0(is_head, on_chain_state, prv, prv_on):
    S = prv.shape[0]
    sidx = jnp.arange(S, dtype=jnp.int32)
    return jnp.where(is_head | ~on_chain_state, sidx,
                     jnp.where(prv_on, prv, sidx))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _round_min(ptr, val):
    v2 = jnp.minimum(val, val[ptr])
    p2 = ptr[ptr]
    return p2, v2, jnp.all(p2 == ptr)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _round_add(ptr, val):
    v2 = val + val[ptr]
    p2 = ptr[ptr]
    return p2, v2, jnp.all(p2 == ptr)


def _host_jump(ptr, val, steps: int, round_fn):
    """Pointer doubling as host-stepped rounds: ~0.1 s scalar readback
    per round buys a bounded per-program working set (the whole point at
    E scale) and the same early exit as the fused while_loop."""
    for _ in range(steps):
        ptr, val, done = round_fn(ptr, val)
        if bool(done):
            break
    return ptr, val


@jax.jit
def _stage_cycle(on_chain_state, natural_head, ptr, mn):
    S = ptr.shape[0]
    sidx = jnp.arange(S, dtype=jnp.int32)
    reached = natural_head[ptr]
    is_cycle = on_chain_state & ~reached
    art_head = is_cycle & (sidx == mn)
    is_head = natural_head | art_head
    return is_cycle, is_head


@jax.jit
def _stage_rank0(on_chain_state, is_head):
    return jnp.where(on_chain_state & ~is_head, 1, 0).astype(jnp.int32)


@jax.jit
def _stage_finish(on_chain_state, nxt, nxt_on, is_head, is_cycle,
                  ptr, rank):
    S = ptr.shape[0]
    unreached = on_chain_state & ~is_head[ptr]
    head = jnp.where(on_chain_state, ptr, -1)
    length = jax.ops.segment_sum(
        on_chain_state.astype(jnp.int32),
        jnp.where(on_chain_state, head, S - 1),
        num_segments=S,
    )
    length = jnp.where(is_head, length, 0)
    is_tail = on_chain_state & ~nxt_on
    attach = jnp.full((S,), -1, jnp.int32)
    attach = attach.at[jnp.where(is_tail, head, S)].set(nxt, mode="drop")
    attach = jnp.where(is_head, attach, -1)
    attach = jnp.where(is_cycle & is_head, -1, attach)
    labels = ChainLabels(
        on_chain=on_chain_state,
        head=head,
        rank=jnp.where(on_chain_state, rank, 0),
        length=length,
        attach=attach,
        is_cycle=is_cycle,
        is_head=is_head,
    )
    return labels, jnp.any(unreached)


def _label_core_staged(on_chain_state, nxt, with_cycles: bool):
    """_label_core with every round its own program (device-resident
    labels; one scalar readback per round).  Replaces the numpy fallback
    for graphs past LABEL_STAGED_THRESHOLD: at 128M states the numpy
    path cost ~4 min (tunnel download + host gathers); this runs the
    same passes at device gather bandwidth."""
    S = nxt.shape[0]
    steps = _doubling_steps(S)
    on_chain_state = jnp.asarray(on_chain_state)
    nxt = jnp.asarray(nxt)
    nxt_on, prv, prv_on, natural_head = _stage_setup(on_chain_state, nxt)
    if with_cycles:
        ptr = _stage_ptr0(natural_head, on_chain_state, prv, prv_on)
        sidx = jnp.arange(S, dtype=jnp.int32)
        ptr, mn = _host_jump(ptr, sidx, steps, _round_min)
        is_cycle, is_head = _stage_cycle(on_chain_state, natural_head,
                                         ptr, mn)
    else:
        is_cycle = jnp.zeros((S,), bool)
        is_head = natural_head
    ptr = _stage_ptr0(is_head, on_chain_state, prv, prv_on)
    rank0 = _stage_rank0(on_chain_state, is_head)
    ptr, rank = _host_jump(ptr, rank0, steps, _round_add)
    labels, unreached = _stage_finish(on_chain_state, nxt, nxt_on,
                                      is_head, is_cycle, ptr, rank)
    return labels, bool(unreached)


def _label_core_numpy(on, nx, with_cycles: bool):
    """Exact numpy mirror of _label_core (same pass structure), for
    graphs past LABEL_HOST_THRESHOLD."""
    import numpy as np

    S = nx.shape[0]
    steps = _doubling_steps(S)
    sidx = np.arange(S, dtype=np.int32)
    nxt_safe = np.where(nx >= 0, nx, 0)
    nxt_on = (nx >= 0) & on[nxt_safe]
    flip_nxt = np.where((sidx & 1) == 0, np.roll(nx, -1), np.roll(nx, 1))
    flip_safe = np.where(flip_nxt >= 0, flip_nxt, 0)
    prv = np.where(flip_nxt >= 0, flip_safe ^ 1, -1)
    prv_on = (prv >= 0) & on[np.where(prv >= 0, prv, 0)]
    natural_head = on & ~prv_on

    def jump(ptr, val, reduce):
        # early termination: chains are usually far shorter than S (tip
        # chains are <= 2k states), so the doubling converges in
        # log2(max_chain) rounds, not log2(S); the extra fixpoint compare
        # per round is one linear pass vs ~20 saved gather rounds
        for _ in range(steps):
            val = reduce(val, val[ptr])
            ptr2 = ptr[ptr]
            if np.array_equal(ptr2, ptr):
                break
            ptr = ptr2
        return ptr, val

    if with_cycles:
        ptr = np.where(natural_head | ~on, sidx,
                       np.where(prv_on, prv, sidx))
        ptr, mn = jump(ptr.astype(np.int32), sidx.copy(), np.minimum)
        reached = natural_head[ptr]
        is_cycle = on & ~reached
        art_head = is_cycle & (sidx == mn)
        is_head = natural_head | art_head
    else:
        is_cycle = np.zeros((S,), bool)
        is_head = natural_head

    ptr = np.where(is_head | ~on, sidx, np.where(prv_on, prv, sidx))
    rank0 = np.where(on & ~is_head, 1, 0).astype(np.int32)
    ptr, rank = jump(ptr.astype(np.int32), rank0, np.add)
    unreached = on & ~is_head[ptr]
    head = np.where(on, ptr, -1)

    length = np.bincount(
        np.where(on, head, S - 1), weights=on.astype(np.float64),
        minlength=S,
    ).astype(np.int64)
    length = np.where(is_head, length, 0)

    is_tail = on & ~nxt_on
    attach = np.full((S,), -1, np.int32)
    tails = np.nonzero(is_tail)[0]
    attach[head[tails]] = nx[tails]
    attach = np.where(is_head, attach, -1)
    attach = np.where(is_cycle & is_head, -1, attach)

    labels = ChainLabels(
        on_chain=on,
        head=head.astype(np.int32),
        rank=np.where(on, rank, 0).astype(np.int32),
        length=length.astype(np.int32),
        attach=attach.astype(np.int32),
        is_cycle=is_cycle,
        is_head=is_head,
    )
    return labels, bool(unreached.any())


def label_chains_numpy(on_chain_state, nxt) -> ChainLabels:
    import numpy as np

    on = np.asarray(on_chain_state)
    nx = np.asarray(nxt).astype(np.int32)
    labels, has_cycles = _label_core_numpy(on, nx, with_cycles=False)
    if has_cycles:
        labels, _ = _label_core_numpy(on, nx, with_cycles=True)
    return labels


def label_chains_host(on_chain_state, nxt) -> ChainLabels:
    """label_chains with the rare cycle pass branched on the HOST (one
    scalar readback) instead of lax.cond.  Under cond both traversal
    programs inline into the caller and their buffers co-allocate —
    at 33M states that doubled compile size and peak HBM; callers not
    under trace should prefer this.  Past LABEL_HOST_THRESHOLD states the
    whole pass runs in numpy (see note above)."""
    if on_chain_state.shape[0] >= LABEL_HOST_THRESHOLD:
        return label_chains_numpy(on_chain_state, nxt)
    if on_chain_state.shape[0] >= LABEL_STAGED_THRESHOLD:
        labels, has_cycles = _label_core_staged(
            on_chain_state, nxt, with_cycles=False)
        if has_cycles:
            labels, _ = _label_core_staged(
                on_chain_state, nxt, with_cycles=True)
        return labels
    labels, has_cycles = _label_core(on_chain_state, nxt, with_cycles=False)
    if bool(has_cycles):
        labels = _label_core(on_chain_state, nxt, with_cycles=True)[0]
    return labels
