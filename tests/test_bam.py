"""BAM ingestion: roundtrip + QC-flag filtering + pipeline integration."""

import os

import numpy as np

from soapdenovo2_tpu.config import LibInfo
from soapdenovo2_tpu.io import bam, reads as rio
from soapdenovo2_tpu.utils import simulate as sim


def test_bam_roundtrip_and_flags(tmp_path):
    p = os.path.join(str(tmp_path), "t.bam")
    reads = [b"ACGTACGTAC", b"TTTTGGGGCC", b"NACGTNACGT", b"CCCCAAAATT"]
    flags = [0, bam.FLAG_QC_FAIL, 0, bam.FLAG_REVERSE]
    bam.write_minimal_bam(p, reads, flags)
    got = list(bam.iter_bam_reads(p))
    # QC-fail dropped; reverse-flagged read flipped back
    assert got[0] == reads[0]
    assert got[1] == reads[2]
    assert got[2] == sim.revcomp(reads[3])
    assert len(got) == 3


def test_bam_through_lib_reader(tmp_path):
    genome = sim.random_genome(1200, seed=601)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=80, insert_size=250,
                                   coverage=8.0, seed=602)
    interleaved = [x for pair in zip(r1, r2) for x in pair]
    p = os.path.join(str(tmp_path), "lib.bam")
    bam.write_minimal_bam(p, interleaved)
    lib = LibInfo(avg_ins=250, b=[p])
    got = list(rio.iter_lib_reads(lib))
    assert got == interleaved
