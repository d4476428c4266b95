"""Multi-k iteration: large final k resolves repeats the small k cannot."""

import numpy as np

from soapdenovo2_tpu.config import LibInfo, AssemblyConfig
from soapdenovo2_tpu.models import contig as cm
from soapdenovo2_tpu.models import iterate
from soapdenovo2_tpu.utils import simulate as sim

from conftest import revcomp_str

import os


def _cfg_from_reads(d, r1, r2, read_len=100):
    sim.write_fastq(os.path.join(d, "i_1.fastq"), r1)
    sim.write_fastq(os.path.join(d, "i_2.fastq"), r2)
    lib = LibInfo(avg_ins=300, asm_flags=3, rank=1,
                  q1=[os.path.join(d, "i_1.fastq")],
                  q2=[os.path.join(d, "i_2.fastq")])
    return AssemblyConfig(max_rd_len=read_len, libs=[lib])


def test_iterate_resolves_repeat(tmp_path):
    """X R Y R Z with a 40bp repeat: k=21 breaks at R (and the structure
    is interference-locked for -R), but k=51 > |R| reads straight through;
    the iterate driver must recover (nearly) the full genome."""
    X = sim.random_genome(800, seed=501)
    R = sim.random_genome(40, seed=502)
    Y = sim.random_genome(800, seed=503)
    Z = sim.random_genome(800, seed=504)
    genome = X + R + Y + R + Z
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=300,
                                   coverage=40.0, seed=505)
    cfg = _cfg_from_reads(str(tmp_path), r1, r2)

    res21 = iterate.run_iterate(cfg, 21, 23, step=8, progress=False)
    # baseline at small k only (kmax barely above kmin): repeat breaks it
    best21 = max(len(s) for _, s, _ in cm.contig_sequences(res21.graph))

    res = iterate.run_iterate(cfg, 21, 51, step=30, progress=False)
    contigs = cm.contig_sequences(res.graph)
    best = max((s for _, s, _ in contigs), key=len)
    gstr = genome.decode()
    assert best21 < len(gstr) - 400
    assert len(best) >= len(gstr) - 300
    assert best in gstr or revcomp_str(best) in gstr
