"""Chain labeling: device pointer-doubling vs the numpy mirror.

The numpy path is the large-graph fallback (chains.LABEL_HOST_THRESHOLD:
the axon TPU worker faults inside 33M-state doubling gathers), so the
two implementations must agree field-for-field on every topology:
plain chains, branch-attached chains, and isolated cycles."""
import numpy as np
import pytest

from soapdenovo2_tpu.ops import chains


def _random_state_graph(rng, n_nodes, p_chain=0.7, p_cycle=0.1):
    """Build a flip-symmetric successor map over S = 2*n states."""
    S = 2 * n_nodes
    on = np.zeros((S,), bool)
    nxt = np.full((S,), -1, np.int32)
    nodes = list(rng.permutation(n_nodes))
    i = 0
    while i < len(nodes):
        run = min(int(rng.integers(1, 6)), len(nodes) - i)
        chain = nodes[i : i + run]
        i += run
        r = rng.random()
        if r < p_chain:
            for a, b in zip(chain, chain[1:]):
                # orientations chosen per node, consistent via flips
                nxt[2 * a] = 2 * b
                nxt[2 * b + 1] = 2 * a + 1
            for c in chain:
                on[2 * c] = on[2 * c + 1] = True
        elif r < p_chain + p_cycle and run >= 2:
            for a, b in zip(chain, chain[1:] + chain[:1]):
                nxt[2 * a] = 2 * b
                nxt[2 * b + 1] = 2 * a + 1
            for c in chain:
                on[2 * c] = on[2 * c + 1] = True
        # else: nodes stay off-chain
    return on, nxt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_numpy_matches_device(seed):
    rng = np.random.default_rng(seed)
    on, nxt = _random_state_graph(rng, 300)
    dev = chains.label_chains_host(on, nxt)
    host = chains.label_chains_numpy(on, nxt)
    for name in ChainLabelsFields():
        a = np.asarray(getattr(dev, name))
        b = np.asarray(getattr(host, name))
        assert (a == b).all(), name


def ChainLabelsFields():
    return ["on_chain", "head", "rank", "length", "attach", "is_cycle",
            "is_head"]


def test_numpy_cycle_labels():
    # a pure 3-cycle: artificial head at the min state id
    n = 3
    on = np.ones((2 * n,), bool)
    nxt = np.full((2 * n,), -1, np.int32)
    order = [0, 1, 2]
    for a, b in zip(order, order[1:] + order[:1]):
        nxt[2 * a] = 2 * b
        nxt[2 * b + 1] = 2 * a + 1
    dev = chains.label_chains_host(on, nxt)
    host = chains.label_chains_numpy(on, nxt)
    assert host.is_cycle.all()
    for name in ChainLabelsFields():
        assert (np.asarray(getattr(dev, name))
                == np.asarray(getattr(host, name))).all(), name


@pytest.mark.parametrize("seed", [0, 3])
def test_staged_matches_fused(seed, monkeypatch):
    """The host-stepped staged path (E-scale route past
    LABEL_STAGED_THRESHOLD) must agree field-for-field with the fused
    while_loop core on every topology, cycles included."""
    rng = np.random.default_rng(seed)
    on, nxt = _random_state_graph(rng, 400, p_cycle=0.2)
    fused = chains.label_chains_host(on, nxt)
    staged, _ = chains._label_core_staged(on, nxt, with_cycles=False)
    if bool(chains._label_core(on, nxt, with_cycles=False)[1]):
        staged, _ = chains._label_core_staged(on, nxt, with_cycles=True)
    for name in ChainLabelsFields():
        a = np.asarray(getattr(fused, name))
        b = np.asarray(getattr(staged, name))
        assert (a == b).all(), name


def test_staged_threshold_routing(monkeypatch):
    """label_chains_host routes through the staged path when S crosses
    LABEL_STAGED_THRESHOLD (forced low here) and still matches numpy."""
    monkeypatch.setattr(chains, "LABEL_STAGED_THRESHOLD", 16)
    rng = np.random.default_rng(7)
    on, nxt = _random_state_graph(rng, 300, p_cycle=0.15)
    dev = chains.label_chains_host(on, nxt)
    host = chains.label_chains_numpy(on, nxt)
    for name in ChainLabelsFields():
        assert (np.asarray(getattr(dev, name))
                == np.asarray(getattr(host, name))).all(), name
