"""Native CSR tour-bus core parity vs the Python oracle + scale smoke.

The C++ core (native/contiggraph.cpp) is a port of models/contig.py
tour_bus; these tests assert byte-identical graph state after both runs
on bubbly graphs, and that a large synthetic graph finishes in seconds
(the human-scale wall the Python dict walk cannot cross, VERDICT r3
weak #4)."""

import copy
import time

import numpy as np
import pytest

from soapdenovo2_tpu import native as native_mod
from soapdenovo2_tpu.models import contig as cm
from soapdenovo2_tpu.utils import simulate as sim

from test_tourbus import build_graph, K


def _graphs_equal(a: cm.ContigGraph, b: cm.ContigGraph):
    assert np.array_equal(a.deleted, b.deleted)
    assert np.array_equal(a.cvg10, b.cvg10)
    if a.marker is not None:
        assert np.array_equal(a.marker, b.marker)
    assert a.arcs == b.arcs
    assert sorted((k, d) for k, d, _, _ in a.bubbles) == \
        sorted((k, d) for k, d, _, _ in b.bubbles)


def _rand_payload(rng, n):
    return rng.integers(0, 4, size=n).astype(np.uint8)


def _bubble_chain_graph(rng, n_bubbles: int, arm: int = 12):
    """Chain of simple bubbles: L -> (A|B) -> L -> (A|B) -> ..."""
    payloads = []
    arcs = []
    prev_fwd = None
    for i in range(n_bubbles):
        lid = len(payloads)
        payloads.append(_rand_payload(rng, 30))  # linker
        if prev_fwd is not None:
            arcs.append((prev_fwd, 2 * lid, 9))
        a = _rand_payload(rng, arm)
        b = a.copy()
        b[arm // 2] = (b[arm // 2] + 1) % 4  # one interior SNP
        aid = len(payloads)
        payloads.append(a)
        bid = len(payloads)
        payloads.append(b)
        jid = len(payloads)
        payloads.append(_rand_payload(rng, 30))
        arcs += [(2 * lid, 2 * aid, 6), (2 * lid, 2 * bid, 4),
                 (2 * aid, 2 * jid, 6), (2 * bid, 2 * jid, 4)]
        prev_fwd = 2 * jid
    return build_graph(payloads, arcs)


def test_native_tourbus_parity(rng):
    if native_mod.get_contiggraph_lib() is None:
        pytest.skip("no native toolchain")
    g1 = _bubble_chain_graph(rng, 12)
    g1.marker = np.full((g1.n_edges,), 2, np.int32)
    g2 = copy.deepcopy(g1)
    m_py = cm.tour_bus(g1, native=False)
    m_nat = cm.tour_bus(g2, native=True)
    assert m_py == m_nat
    assert m_py >= 10
    _graphs_equal(g1, g2)


def test_native_tourbus_parity_nested(rng):
    if native_mod.get_contiggraph_lib() is None:
        pytest.skip("no native toolchain")
    # nested bubble: outer arms where one arm itself contains a bubble
    p = {}
    payloads = []

    def add(n):
        payloads.append(_rand_payload(rng, n))
        return 2 * (len(payloads) - 1)

    src = add(30)
    a1 = add(10)
    inner_a = add(8)
    inner_b_seq = payloads[inner_a // 2].copy()
    inner_b_seq[4] = (inner_b_seq[4] + 1) % 4
    payloads.append(inner_b_seq)
    inner_b = 2 * (len(payloads) - 1)
    a2 = add(10)
    b_seq = None
    join = add(30)
    arcs = [(src, a1, 5), (a1, inner_a, 3), (a1, inner_b, 2),
            (inner_a, a2, 3), (inner_b, a2, 2), (a2, join, 5)]
    g1 = build_graph(payloads, arcs)
    g2 = copy.deepcopy(g1)
    m_py = cm.tour_bus(g1, native=False)
    m_nat = cm.tour_bus(g2, native=True)
    assert m_py == m_nat
    _graphs_equal(g1, g2)


@pytest.mark.slow
def test_native_tourbus_scale(rng):
    """1M-directed-edge synthetic bubble chain in seconds (the VERDICT
    bar: contig stage on a 1M-edge graph)."""
    if native_mod.get_contiggraph_lib() is None:
        pytest.skip("no native toolchain")
    n_bub = 125_000  # 4 payloads x 2 directions per bubble = 1M directed edges
    g = _bubble_chain_graph(np.random.default_rng(0), n_bub)
    assert g.n_edges >= 1_000_000
    t0 = time.time()
    merged = cm.tour_bus(g, native=True)
    dt = time.time() - t0
    assert merged >= n_bub * 0.9
    assert dt < 60, dt
    t0 = time.time()
    cm.linear_concatenate(g)
    dt2 = time.time() - t0
    print(f"native tour_bus: {g.n_edges} edges, {merged} merges, "
          f"{dt:.1f}s + concat {dt2:.1f}s")
