"""Long-read (asm_flags=4) path: prlLongRead2Ctg analog + gap closure.

Reference: standardPregraph/prlRead2Ctg.c:1080 (prlLongRead2Ctg) — long
reads are mapped to contigs with ALIGNLEN=max(map_len,35); a mapped read
whose k-mers hit >=2 contigs (footprint, parse1read:335-338) is recorded
as a gap read anchored at its own placement (token insert 18,
prlRead2Ctg.c:1206) and feeds gap filling (prlReadFillGap.c
loadReads4gap:224 reads *.longReadInGap).
"""

import os

import numpy as np
import pytest

from soapdenovo2_tpu.config import parse_config
from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.models import contig as cm
from soapdenovo2_tpu.models import mapping as mp
from soapdenovo2_tpu.models import pregraph as pg
from soapdenovo2_tpu.models import scaffold as sf
from soapdenovo2_tpu.utils import simulate as sim

from conftest import revcomp_str

K = 21


def _write_cfg(d, pe_files=None, long_file=None, max_rd_len=100,
               insert=500):
    lines = [f"max_rd_len={max_rd_len}"]
    if pe_files:
        lines += [
            "[LIB]", f"avg_ins={insert}", "reverse_seq=0", "asm_flags=3",
            "rank=1", "pair_num_cutoff=3",
            f"q1={pe_files[0]}", f"q2={pe_files[1]}",
        ]
    if long_file:
        lines += ["[LIB]", "asm_flags=4", f"q={long_file}"]
    path = os.path.join(d, "t.config")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return parse_config(path)


def test_long_reads_enter_gap_pool(tmp_path):
    """A long read spanning two contigs joins the gap pool anchored at
    its own placement with insert 18."""
    g = sim.random_genome(3000, seed=101)
    contigs = [g[0:1000].decode(), g[1050:2000].decode(),
               g[2050:3000].decode()]
    # long reads crossing the first inter-contig gap + one inside a contig
    long_reads = [g[850:1250], g[1900:2300], g[200:600]]
    lf = tmp_path / "long.fq"
    sim.write_fastq(str(lf), long_reads)
    cfg = _write_cfg(str(tmp_path), long_file=str(lf), max_rd_len=100)
    assert cfg.libs_for_gap(), "asm_flags=4 lib must be recognized"

    mres = mp.run_map(cfg, contigs, K, progress=False)
    pool = mres.long_reads
    assert len(pool) >= 2  # the two junction-spanning reads
    assert all(i == 18 for i in pool.insert_size)
    # anchors point at real directed contigs
    for c in pool.anchor_ctg:
        assert 0 <= c < 2 * len(contigs)
    # the inside-contig read must NOT be in the pool
    decoded = {
        bytes(
            b"ACGT"[c] for c in np.frombuffer(s, np.uint8)
        )
        for s in pool.seqs
    }
    assert g[200:600] not in decoded


def test_long_reads_close_gap_end_to_end(tmp_path):
    """PE coverage island gap closed only thanks to long reads."""
    A = sim.random_genome(1500, seed=111)
    M = sim.random_genome(120, seed=112)  # PE-dark region
    B = sim.random_genome(1500, seed=113)
    genome = A + M + B
    gs = genome.decode()
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=500,
                                   coverage=40.0, seed=114)
    lo, hi = len(A), len(A) + len(M)

    def covers_gap(seq):
        s = seq.decode()
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
    sim.write_fastq(str(tmp_path / "a_1.fastq"), keep1)
    sim.write_fastq(str(tmp_path / "a_2.fastq"), keep2)
    # long reads tiling the dark region
    long_reads = [genome[s : s + 400] for s in range(1200, 1700, 60)]
    sim.write_fastq(str(tmp_path / "long.fq"), long_reads)
    cfg = _write_cfg(
        str(tmp_path),
        pe_files=(str(tmp_path / "a_1.fastq"), str(tmp_path / "a_2.fastq")),
        long_file=str(tmp_path / "long.fq"),
    )
    pre = pg.run_pregraph(cfg, K, progress=False)
    cres = cm.run_contig(pre, progress=False)
    contigs = [s for _, s, _ in cm.contig_sequences(cres.graph, min_len=K + 2)]
    mres = mp.run_map(cfg, contigs, K, progress=False)
    assert len(mres.all_gap_reads()) > 0
    sres = sf.run_scaff(mres, contigs, fill=True, progress=False, k=K)
    best = max(sres.seqs, key=len)
    assert len(best) >= 2800
    # gap must be closed with real sequence, not Ns: the dark region's
    # middle must appear exactly
    probe = M[40:80].decode()
    assert probe in best or revcomp_str(probe) in best
