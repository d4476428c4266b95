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
