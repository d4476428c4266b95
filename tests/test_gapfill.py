"""Gap-filling unit tests (local assembly across scaffold gaps)."""

import numpy as np

from soapdenovo2_tpu.models import gapfill, mapping as mp, scaffold as sf
from soapdenovo2_tpu.ops import kmer as kops
from soapdenovo2_tpu.utils import simulate as sim


def _codes(s: str) -> bytes:
    return kops.codes_from_ascii(np.frombuffer(s.encode(), np.uint8)).tobytes()


def test_fill_simple_gap():
    A = sim.random_genome(600, seed=101).decode()
    M = sim.random_genome(150, seed=102).decode()
    B = sim.random_genome(600, seed=103).decode()
    genome = A + M + B
    rl, step = 100, 10
    pool = mp.GapReads.empty()
    # reads tiled across the junction region, each "anchored" by a fake
    # mate mapped at the end of contig A (directed id 0)
    for s in range(len(A) - rl - 50, len(A) + len(M) + 50, step):
        seq = genome[s : s + rl]
        pool.seqs.append(_codes(seq))
        pool.anchor_ctg.append(0)
        pool.anchor_pos.append(len(A) - 150)
        pool.insert_size.append(300)
    contigs = [A, B]
    scaffolds = [sf.Scaffold(ctgs=[0, 2], gaps=[len(M)])]
    seqs, gap_seqs, stats = gapfill.fill_gaps(
        scaffolds, contigs, pool, progress=False
    )
    assert stats.filled == 1
    assert seqs[0] == genome
    assert gap_seqs == [M]


def test_fill_overlap_negative_gap():
    A = sim.random_genome(500, seed=111).decode()
    B = sim.random_genome(500, seed=112).decode()
    olap = 40
    right = A[-olap:] + B
    contigs = [A, right]
    scaffolds = [sf.Scaffold(ctgs=[0, 2], gaps=[1])]
    seqs, gap_seqs, stats = gapfill.fill_gaps(
        scaffolds, contigs, mp.GapReads.empty(), progress=False
    )
    # empty pool: the overlap check must still merge the join
    assert stats.overlap_merged == 1
    assert seqs[0] == A + B


def test_unfillable_gap_stays_n():
    A = sim.random_genome(400, seed=121).decode()
    B = sim.random_genome(400, seed=122).decode()
    scaffolds = [sf.Scaffold(ctgs=[0, 2], gaps=[77])]
    seqs, gap_seqs, stats = gapfill.fill_gaps(
        scaffolds, [A, B], mp.GapReads.empty(), progress=False
    )
    assert seqs[0] == A + "N" * 77 + B
    assert stats.filled == 0
