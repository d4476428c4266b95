"""Walk-based tip clipping must match the label-based sweep exactly.

_clip_tips_walk compacts dead-end starts into lanes and runs the
reference's clipTipFromNode walk (O(D * 2k)); _clip_tips_once labels
every linear chain (O(S log S)).  Same decisions, different schedule —
deleted/covs/linear state must be identical after each sweep."""
import numpy as np
import pytest

from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.models import kmer_graph as kg
from soapdenovo2_tpu.models import pregraph as pg
from soapdenovo2_tpu.ops import sortcount as sc
from soapdenovo2_tpu.utils import simulate as sim

K = 21


def _graph(seed, glen=6000, err=0.01):
    genome = sim.random_genome(glen, seed=seed)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=80, insert_size=300,
                                   coverage=25.0, seed=seed + 1,
                                   error_rate=err)
    reads = [x for p in zip(r1, r2) for x in p]
    table, _ = pg.count_reads_to_table(
        rio.batch_reads(iter(reads), 512, 80), K, 80,
        init_capacity=1 << 15)
    g = kg.mark_linear(kg.from_table(table))
    return g


def _state(g):
    return (np.asarray(g.deleted), np.asarray(g.covs),
            np.asarray(g.linear))


@pytest.mark.parametrize("seed,thin", [(11, True), (11, False),
                                       (23, False), (37, True)])
def test_walk_matches_label_sweep(seed, thin):
    g = _graph(seed)
    pdir_info = sc.build_prefix_dir_device(g.keys, K)
    pdir, psteps, pshift = pdir_info

    ga, na = kg._clip_tips_once(g, K, thin=thin, pdir_info=pdir_info)
    C = g.keys.shape[0]
    cap = min(kg._next_pow2_cap(int(kg._count_starts(g, thin))), C)
    gb, nb = kg._clip_tips_walk(g, K, thin, pdir, psteps, pshift, cap)

    assert int(na) == int(nb)
    da, ca, la = _state(ga)
    db, cb, lb = _state(gb)
    assert (da == db).all()
    assert (ca == cb).all()
    assert (la == lb).all()


def test_fixpoint_matches(tmp_path):
    """Full remove_single + remove_minor fixpoint through the sweep
    driver equals the label-only pipeline."""
    g = _graph(53, glen=4000, err=0.02)
    pdir_info = sc.build_prefix_dir_device(g.keys, K)

    # label-only fixpoint
    ga = kg.mark_linear(g)
    ga, n1 = kg._clip_tips_once(ga, K, thin=True, pdir_info=pdir_info)
    t1 = int(n1)
    for _ in range(100):
        ga, n = kg._clip_tips_once(ga, K, thin=False, pdir_info=pdir_info)
        if int(n) == 0:
            break
        t1 += int(n)

    gb, m1 = kg.remove_single_tips(g, K)
    gb, m2 = kg.remove_minor_tips(gb, K)
    assert t1 == int(m1) + int(m2)
    da, ca, la = _state(ga)
    db, cb, lb = _state(gb)
    assert (da == db).all()
    assert (ca == cb).all()
