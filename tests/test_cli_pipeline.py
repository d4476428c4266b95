"""End-to-end CLI test: all four stages through the file protocol."""

import os

import numpy as np
import pytest

from soapdenovo2_tpu import cli
from soapdenovo2_tpu.io import files as fio
from soapdenovo2_tpu.utils import simulate as sim

from conftest import revcomp_str

K = 23


def test_full_pipeline_files(tmp_path):
    d = str(tmp_path)
    cfgp, genome = sim.make_test_config(
        d, genome_len=6000, read_len=100, insert_size=350, coverage=35.0,
        error_rate=0.003, seed=5,
    )
    prefix = os.path.join(d, "asm")
    rc = cli.main(["all", "-s", cfgp, "-K", str(K), "-o", prefix, "-d", "1"])
    assert rc == 0

    # stage files exist
    for suffix in (".kmerFreq", ".vertex", ".preGraphBasic", ".edge.gz",
                   ".preArc", ".contig", ".ContigIndex", ".readOnContig.gz",
                   ".peGrads", ".scaf", ".scafSeq", ".scafStatistics"):
        assert os.path.exists(prefix + suffix), suffix

    info = fio.read_pre_graph_basic(prefix)
    assert info["k"] == K

    contigs = [s for _, s in fio.read_contigs(prefix + ".contig")]
    assert contigs
    gstr = genome.decode()
    best = max(contigs, key=len)
    assert len(best) >= 0.8 * len(gstr)
    assert best in gstr or revcomp_str(best) in gstr

    # scafSeq: the dominant scaffold covers most of the genome
    scafs = [s for _, s in fio.read_fasta(prefix + ".scafSeq")]
    assert scafs
    assert max(len(s) for s in scafs) >= 0.8 * len(gstr)


def test_scaff_gapfill_only_resume(tmp_path):
    """scaff -S -F re-runs ONLY gap filling from *.scaf_gap and must
    reproduce *.scafSeq byte-identically (scaffold.c:161-164 -S)."""
    d = str(tmp_path)
    # a genome with a PE-dark middle produces a real gapped scaffold
    A = sim.random_genome(1500, seed=201)
    M = sim.random_genome(150, seed=202)
    B = sim.random_genome(1500, seed=203)
    genome = A + M + B
    gs = genome.decode()
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=500,
                                   coverage=40.0, seed=204)

    def covers_gap(seq):
        s = seq.decode()
        i = gs.find(s)
        if i < 0:
            i = gs.find(revcomp_str(s))
        return i >= 0 and i < len(A) + len(M) and i + len(s) > len(A)

    keep1, keep2 = [], []
    for a, b in zip(r1, r2):
        if not (covers_gap(a) or covers_gap(b)):
            keep1.append(a)
            keep2.append(b)
    sim.write_fastq(os.path.join(d, "g_1.fastq"), keep1)
    sim.write_fastq(os.path.join(d, "g_2.fastq"), keep2)
    cfgp = os.path.join(d, "t.config")
    with open(cfgp, "w") as fh:
        fh.write(
            "max_rd_len=100\n[LIB]\navg_ins=500\nreverse_seq=0\n"
            f"asm_flags=3\nrank=1\nq1={d}/g_1.fastq\nq2={d}/g_2.fastq\n"
        )
    prefix = os.path.join(d, "asm")
    cli.main(["pregraph", "-s", cfgp, "-K", str(K), "-o", prefix])
    cli.main(["contig", "-g", prefix])
    cli.main(["map", "-s", cfgp, "-g", prefix])
    cli.main(["scaff", "-g", prefix, "-F"])
    with open(prefix + ".scafSeq", "rb") as fh:
        first = fh.read()
    os.remove(prefix + ".scafSeq")
    # resume: gap-fill-only from the saved scaffold layout
    cli.main(["scaff", "-g", prefix, "-F", "-S"])
    with open(prefix + ".scafSeq", "rb") as fh:
        second = fh.read()
    assert first == second
    assert first  # non-trivial output


def test_stage_restart(tmp_path):
    """contig stage rerun from files only must give identical contigs."""
    d = str(tmp_path)
    cfgp, genome = sim.make_test_config(
        d, genome_len=3000, read_len=100, insert_size=300, coverage=30.0,
        seed=9,
    )
    prefix = os.path.join(d, "asm")
    cli.main(["pregraph", "-s", cfgp, "-K", str(K), "-o", prefix])
    cli.main(["contig", "-g", prefix])
    first = fio.read_contigs(prefix + ".contig")
    cli.main(["contig", "-g", prefix])
    second = fio.read_contigs(prefix + ".contig")
    assert first == second
