"""Parity: the C++ ordering core must reproduce the Python Scaffolder
state (chains, mask, SNP pairs) rank for rank on randomized link tables."""

import numpy as np
import pytest

from soapdenovo2_tpu import native
from soapdenovo2_tpu.models import scaffold as sf


def _random_links(rng, n_dir, m, max_gap=400):
    c1 = rng.integers(0, n_dir, size=m).astype(np.int32)
    c2 = rng.integers(0, n_dir, size=m).astype(np.int32)
    keep = (c1 >> 1) != (c2 >> 1)
    c1, c2 = c1[keep], c2[keep]
    w = rng.integers(1, 12, size=c1.size).astype(np.int32)
    g = rng.integers(-80, max_gap, size=c1.size).astype(np.int32)
    return sf.LinkTable(c1=c1, c2=c2, weight=w, gap=g)


def _chain_state(s: sf.Scaffolder):
    chains = sorted(
        (tuple(sc.ctgs), tuple(sc.gaps)) for sc in s.chains if sc.ctgs
    )
    return chains, s.mask.copy(), list(s.snp_pairs)


@pytest.mark.skipif(native.get_scaffolder_lib() is None,
                    reason="native scaffolder unavailable")
def test_native_matches_python_ordering():
    rng = np.random.default_rng(42)
    n_und = 60
    n_dir = 2 * n_und
    ctg_len = rng.integers(200, 3000, size=n_dir).astype(np.int64)
    ctg_len[1::2] = ctg_len[0::2]
    cvg = rng.uniform(5, 40, size=n_dir)
    cvg[1::2] = cvg[0::2]

    py = sf.Scaffolder(ctg_len, cvg=cvg.copy(), use_native=False)
    nat = sf.Scaffolder(ctg_len, cvg=cvg.copy(), use_native=True)
    np.testing.assert_array_equal(py.mask, nat.mask)

    ranks = [(300, 3), (800, 3), (2500, 5)]
    for ri, (ins, cutoff) in enumerate(ranks):
        links = _random_links(rng, n_dir, 500, max_gap=ins)
        last = ri == len(ranks) - 1
        py.add_rank(links, cutoff, ins, last_rank=last)
        nat.add_rank(links, cutoff, ins, last_rank=last)
        pc, pm, ps = _chain_state(py)
        nc, nm, ns = _chain_state(nat)
        assert pc == nc, f"rank {ri}: chain mismatch"
        np.testing.assert_array_equal(pm, nm)
        assert ps == ns


@pytest.mark.skipif(native.get_scaffolder_lib() is None,
                    reason="native scaffolder unavailable")
def test_native_snp_bubble_parity():
    """SNP-bubble collapse (-B) must fire identically in both cores."""
    rng = np.random.default_rng(7)
    k = 13
    # two contigs that differ by one middle base but share end k-mers
    base = "".join("ACGT"[i] for i in rng.integers(0, 4, size=400))
    alt = base[:200] + ("A" if base[200] != "A" else "C") + base[201:]
    flank_a = "".join("ACGT"[i] for i in rng.integers(0, 4, size=800))
    flank_b = "".join("ACGT"[i] for i in rng.integers(0, 4, size=800))
    seqs = [flank_a, base, alt, flank_b]
    ctg_len = np.repeat([len(s) for s in seqs], 2).astype(np.int64)
    cvg = np.repeat([20.0, 18.0, 6.0, 20.0], 2)

    def links():
        # flank_a -> base/alt -> flank_b; bubble pair landing at the same
        # position (negative mutual gap is implied by equal placement)
        return sf.LinkTable(
            c1=np.array([0, 0, 2, 4], np.int32),
            c2=np.array([2, 4, 6, 6], np.int32),
            weight=np.array([9, 9, 9, 9], np.int32),
            gap=np.array([10, 10, 10, 10], np.int32),
        )

    kw = dict(cvg4snp=1.0, contig_seqs=seqs, k=k, mask_high_cvg=False)
    py = sf.Scaffolder(ctg_len, cvg=cvg.copy(), use_native=False, **kw)
    nat = sf.Scaffolder(ctg_len, cvg=cvg.copy(), use_native=True, **kw)
    py.add_rank(links(), 2, 300, last_rank=True)
    nat.add_rank(links(), 2, 300, last_rank=True)
    pc, pm, ps = _chain_state(py)
    nc, nm, ns = _chain_state(nat)
    assert pc == nc
    np.testing.assert_array_equal(pm, nm)
    assert ps == ns
    assert len(py.snp_pairs) == 1  # the bubble actually collapsed
