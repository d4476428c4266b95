"""Map + scaff stage tests: read placement and PE scaffolding."""

import numpy as np
import pytest

from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.models import mapping as mp
from soapdenovo2_tpu.models import scaffold as sf
from soapdenovo2_tpu.utils import simulate as sim

from conftest import revcomp_str

K = 21


def test_contig_index_and_mapping():
    g1 = sim.random_genome(800, seed=71)
    g2 = sim.random_genome(600, seed=72)
    contigs = [g1.decode(), g2.decode()]
    index = mp.build_contig_index(contigs, K)
    # reads straight off the contigs must map at the right position
    reads = [g1[100:200], sim.revcomp(g1[300:400]), g2[50:150]]
    batches = rio.batch_reads(iter(reads), 4, 100)
    rid, ctg, pos, gaps, n = mp.map_reads(batches, index, progress=False)
    assert n == 3
    m = dict(zip(rid.tolist(), zip(ctg.tolist(), pos.tolist())))
    assert m[0] == (0, 100)  # fwd on contig 0
    # read 1 is rc of g1[300:400] -> maps to directed contig 1 (rc of g1)
    assert m[1] == (1, 800 - 400)
    assert m[2] == (2, 50)


def test_scaffold_joins_contigs_across_gap():
    """Two coverage islands joined by PE inserts spanning the gap."""
    A = sim.random_genome(1500, seed=81)
    M = sim.random_genome(200, seed=82)  # uncovered gap
    B = sim.random_genome(1500, seed=83)
    genome = A + M + B
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=500,
                                   coverage=40.0, seed=84)
    # drop reads overlapping the middle region (simulate unsequencable gap)
    lo, hi = len(A), len(A) + len(M)

    def covers_gap(seq):
        s = seq.decode()
        gs = genome.decode()
        i = gs.find(s)
        if i < 0:
            i = gs.find(revcomp_str(s))
        return i >= 0 and i < hi and i + len(s) > lo

    keep1, keep2 = [], []
    for a, b in zip(r1, r2):
        if covers_gap(a) or covers_gap(b):
            continue
        keep1.append(a)
        keep2.append(b)
    import tempfile, os
    d = tempfile.mkdtemp()
    sim.write_fastq(os.path.join(d, "a_1.fastq"), keep1)
    sim.write_fastq(os.path.join(d, "a_2.fastq"), keep2)
    with open(os.path.join(d, "t.config"), "w") as fh:
        fh.write(
            "max_rd_len=100\n[LIB]\navg_ins=500\nreverse_seq=0\n"
            f"asm_flags=3\nrank=1\npair_num_cutoff=3\n"
            f"q1={d}/a_1.fastq\nq2={d}/a_2.fastq\n"
        )
    from soapdenovo2_tpu.config import parse_config
    from soapdenovo2_tpu.models import pregraph as pg
    from soapdenovo2_tpu.models import contig as cm

    cfg = parse_config(os.path.join(d, "t.config"))
    pre = pg.run_pregraph(cfg, K, progress=False)
    cres = cm.run_contig(pre, progress=False)
    contigs = [s for _, s, _ in cm.contig_sequences(cres.graph, min_len=K + 2)]
    # expect 2 main contigs (A-ish and B-ish)
    big = sorted(contigs, key=len, reverse=True)[:2]
    assert len(big) == 2 and min(len(c) for c in big) > 1000

    mres = mp.run_map(cfg, contigs, K, progress=False)
    assert mres.read_id.size > 0.5 * 2 * len(keep1)

    sres = sf.run_scaff(mres, contigs, progress=False)
    # the two big contigs must land in one scaffold with a plausible gap
    best = max(sres.seqs, key=len)
    assert len(best) >= len(big[0]) + len(big[1])
    assert "N" in best  # joined across a gap
    import re
    runs = [len(m.group(0)) for m in re.finditer("N+", best)]
    assert any(abs(r - len(M)) < 0.6 * len(M) + 60 for r in runs)


def test_pairs_on_same_contig_reestimate_insert():
    g = sim.random_genome(3000, seed=91)
    r1, r2 = sim.simulate_pe_reads(g, read_len=100, insert_size=400,
                                   coverage=30.0, seed=92)
    contigs = [g.decode()]
    index = mp.build_contig_index(contigs, K)
    reads = [x for pair in zip(r1, r2) for x in pair]
    rid, ctg, pos, gaps, n = mp.map_reads(
        rio.batch_reads(iter(reads), 256, 100), index, progress=False
    )
    ctg_len = np.array([3000, 3000], np.int64)
    links, new_ins = sf.build_links_for_grad(
        rid, ctg, pos, ctg_len, 380, 0, n  # deliberately wrong prior 380
    )
    assert new_ins is not None
    assert abs(new_ins - 400) <= 3


def test_vote_not_inflated_by_trailing_invalid():
    """parse1read vote: trailing invalid slots must not inflate the last
    contig run's count (r3 review: hits [5,5,7,-,-,-] let contig 7 win
    with count 4)."""
    import jax.numpy as jnp
    from soapdenovo2_tpu.models import mapping as mp
    from soapdenovo2_tpu.utils import simulate as sim

    # two contigs; a read whose FIRST 40 bases lie on contig A and last
    # ~10 on contig B (A should win the vote with far more k-mer hits)
    A = sim.random_genome(300, seed=61).decode()
    B = sim.random_genome(300, seed=62).decode()
    k = 21
    idx = mp.build_contig_index([A, B], k)
    read = A[100:160] + B[50:80]  # 60 bases of A, 30 of B
    import numpy as np
    from soapdenovo2_tpu.io import reads as rio

    codes = np.full((1, 100), 4, np.uint8)
    n = rio.encode_read(read.encode(), codes[0])
    lengths = np.array([n], np.int32)
    ctg, pos, mapped, multi = mp._map_batch(
        jnp.asarray(codes), jnp.asarray(lengths), k,
        jnp.asarray(idx.keys), jnp.asarray(idx.cid), jnp.asarray(idx.pos),
        jnp.asarray(idx.flip.astype(np.int8)), jnp.asarray(idx.ctg_len),
        pdir=jnp.asarray(idx.pdir), pdir_steps=idx.pdir_steps,
        pdir_shift=idx.pdir_shift,
    )
    assert bool(mapped[0])
    assert int(ctg[0]) // 2 == 0, "contig A (most hits) must win"
    # position: first A hit at read offset 0 -> contig pos 100
    assert int(pos[0]) == 100


def test_index_keeps_last_unique_kmer():
    """_index_sort_dedup must not drop the lexicographically largest
    unique k-mer when sentinel padding rows follow it (r3 review)."""
    from soapdenovo2_tpu.models import mapping as mp
    from soapdenovo2_tpu.utils import simulate as sim

    k = 21
    A = sim.random_genome(500, seed=63).decode()
    idx = mp.build_contig_index([A], k)
    # every k-mer of a random 500-mer is unique: index must hold ALL of
    # them including the lexicographically largest
    assert idx.keys.shape[0] == 500 - k + 1


def test_calcuIS_three_sd_trimmed_mean():
    """Insert re-estimation is calcuIS (attachPEinfo.c): mean, sample SD,
    then the mean of observations within 3*SD — outliers beyond 3 SD must
    not shift the estimate the way a plain mean would."""
    rng = np.random.default_rng(93)
    n = 300
    obs = rng.integers(395, 406, size=n)  # tight around 400
    obs[:6] = 5000  # far outliers (chimeric pairs)
    # same-contig pair layout: rid (2i, 2i+1), both on contig 0,
    # p1 + obs = len - p2  =>  obs = (len - p2) - p1
    clen = 20000
    p1 = rng.integers(0, 10000, size=n)
    p2 = clen - (p1 + obs)
    rid = np.arange(2 * n, dtype=np.int64)
    ctg = np.zeros(2 * n, np.int64)
    ctg[1::2] = 1  # mate maps to the twin direction of contig 0
    pos = np.empty(2 * n, np.int64)
    pos[0::2] = p1
    pos[1::2] = p2
    ctg_len = np.array([clen, clen], np.int64)
    _, new_ins = sf.build_links_for_grad(
        rid, ctg, pos, ctg_len, 400, 0, 2 * n
    )
    plain_mean = obs.sum() // n  # ~492 — what an untrimmed mean gives
    assert plain_mean > 450
    assert new_ins is not None and abs(new_ins - 400) <= 3, new_ins


def test_links_device_matches_host():
    """Device PE2Links (scaffold.build_links_for_grad_device) must be
    record-for-record identical to the host numpy segment-reduce —
    links, weights, gaps, and the calcuIS re-estimate
    (attachPEinfo.c:317-384 semantics on both paths)."""
    rng = np.random.default_rng(77)
    n_ctg = 40
    ctg_len = rng.integers(800, 5000, size=2 * n_ctg).astype(np.int64)
    ctg_len[1::2] = ctg_len[0::2]
    n_reads = 20000
    rid = np.arange(n_reads, dtype=np.int64)
    ctg = rng.integers(0, 2 * n_ctg, size=n_reads).astype(np.int32)
    # make a fraction of pairs land on the twin contig (same-contig obs)
    same_sel = rng.random(n_reads // 2) < 0.3
    ctg1 = ctg[0::2]
    ctg[1::2] = np.where(same_sel, ctg1 ^ 1, ctg[1::2])
    pos = np.array([rng.integers(0, max(ctg_len[c] - 100, 1))
                    for c in ctg], np.int32)
    # drop some reads entirely (unmapped) to exercise pair detection
    keep = rng.random(n_reads) > 0.15
    rid, ctg, pos = rid[keep], ctg[keep], pos[keep]
    ins = 400
    host, ins_h = sf.build_links_for_grad(
        rid, ctg, pos, ctg_len, ins, 0, n_reads)
    dev, ins_d = sf.build_links_for_grad_device(
        rid, ctg, pos, ctg_len, ins, 0, n_reads)
    assert ins_h == ins_d
    assert host.c1.shape == dev.c1.shape
    np.testing.assert_array_equal(host.c1, dev.c1)
    np.testing.assert_array_equal(host.c2, dev.c2)
    np.testing.assert_array_equal(host.weight, dev.weight)
    np.testing.assert_array_equal(host.gap, dev.gap)
