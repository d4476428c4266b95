"""Multi-library scaffolding: short PE + long mate-pair libs with ranks."""

import os

import numpy as np

from soapdenovo2_tpu import cli
from soapdenovo2_tpu.io import files as fio
from soapdenovo2_tpu.utils import simulate as sim

from conftest import revcomp_str

K = 23


def test_mate_pairs_bridge_large_gap(tmp_path):
    """A gap too wide for the PE insert is bridged by the rank-2
    mate-pair library (reverse_seq=1, 2kb insert)."""
    d = str(tmp_path)
    A = sim.random_genome(4000, seed=701)
    M = sim.random_genome(700, seed=702)  # uncovered region, > PE insert
    B = sim.random_genome(4000, seed=703)
    genome = A + M + B
    gs = genome.decode()
    lo, hi = len(A), len(A) + len(M)

    def covers_gap(seq):
        s = seq.decode()
        i = gs.find(s)
        if i < 0:
            i = gs.find(revcomp_str(s))
        return i >= 0 and i < hi and i + len(s) > lo

    # PE lib: 300bp inserts
    p1, p2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=300,
                                   coverage=35.0, seed=704)
    pe1, pe2 = [], []
    for a, b in zip(p1, p2):
        if covers_gap(a) or covers_gap(b):
            continue
        pe1.append(a)
        pe2.append(b)
    # MP lib: 2000bp inserts, reverse-forward orientation (reverse_seq=1)
    m1, m2 = sim.simulate_pe_reads(genome, read_len=80, insert_size=2000,
                                   coverage=15.0, seed=705)
    mp1, mp2 = [], []
    for a, b in zip(m1, m2):
        if covers_gap(a) or covers_gap(b):
            continue
        # store reads reverse-complemented, as real MP libs deliver them
        mp1.append(sim.revcomp(a))
        mp2.append(sim.revcomp(b))

    sim.write_fastq(os.path.join(d, "pe_1.fastq"), pe1)
    sim.write_fastq(os.path.join(d, "pe_2.fastq"), pe2)
    sim.write_fastq(os.path.join(d, "mp_1.fastq"), mp1)
    sim.write_fastq(os.path.join(d, "mp_2.fastq"), mp2)
    cfgp = os.path.join(d, "ml.config")
    with open(cfgp, "w") as fh:
        fh.write(
            "max_rd_len=100\n"
            "[LIB]\navg_ins=300\nreverse_seq=0\nasm_flags=3\nrank=1\n"
            f"pair_num_cutoff=3\nq1={d}/pe_1.fastq\nq2={d}/pe_2.fastq\n"
            "[LIB]\navg_ins=2000\nreverse_seq=1\nasm_flags=2\nrank=2\n"
            f"pair_num_cutoff=3\nq1={d}/mp_1.fastq\nq2={d}/mp_2.fastq\n"
        )
    prefix = os.path.join(d, "ml")
    cli.main(["all", "-s", cfgp, "-K", str(K), "-o", prefix, "-d", "1"])

    contigs = [s for _, s in fio.read_contigs(prefix + ".contig")]
    big = sorted((len(c) for c in contigs), reverse=True)[:2]
    assert big[1] > 3000, "expected two large coverage islands"

    scafs = [s for _, s in fio.read_fasta(prefix + ".scafSeq")]
    best = max(scafs, key=len)
    # mate pairs must bridge the 700bp gap: one scaffold spanning both
    assert len(best) >= 7500, [len(s) for s in scafs]
    assert "N" in best
