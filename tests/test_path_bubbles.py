"""Multi-edge path-bubble popping (tour-bus class)."""

import numpy as np

from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.models import contig as cm
from soapdenovo2_tpu.models import kmer_graph as kg
from soapdenovo2_tpu.models import edges as edge_mod
from soapdenovo2_tpu.models import pregraph as pg
from soapdenovo2_tpu.ops import sortcount as sc
from soapdenovo2_tpu.utils import simulate as sim

from conftest import revcomp_str

K = 21


def _assemble(reads):
    def stream():
        return rio.batch_reads(iter(reads), 512, 100)

    table, _ = pg.count_reads_to_table(stream(), K, 100, init_capacity=1 << 14)
    g = kg.from_table(table)
    g = kg.mark_linear(g)
    g, _ = kg.remove_single_tips(g, K)
    g, _ = kg.remove_minor_tips(g, K)
    eg = edge_mod.build_edges(g, K)
    arcs, marker, paths = pg.build_arcs(
        stream(), eg, sc.KmerTable(keys=g.keys, covs=g.covs, n=g.n), K
    )
    return pg.PregraphResult(
        k=K, table=table, graph=g, edges=eg, arcs=arcs,
        marker_on_edge=marker, paths=paths, kmer_freq=np.zeros(255),
        n_reads=len(reads), max_read_len=100,
    )


def test_cascaded_bubbles_converge():
    """Diploid haps with SNPs > k apart produce CASCADED simple bubbles
    (src->{a1,a2}->shared mid->{b1,b2}->term).  The iterated pinch +
    linearize loop must collapse the whole region into one contig."""
    A = sim.random_genome(1200, seed=901)
    B = sim.random_genome(1200, seed=902)
    X1 = sim.random_genome(180, seed=904)
    x1 = bytearray(X1)
    for p in (30, 150):  # SNPs 120bp apart (> 2k): two chained bubbles
        x1[p] = ord("A") if x1[p] != ord("A") else ord("C")
    X2 = bytes(x1)
    hap1 = A + X1 + B
    hap2 = A + X2 + B
    reads = []
    for chrom, seed in ((hap1, 910), (hap2, 911)):
        a, b = sim.simulate_pe_reads(chrom, read_len=100, insert_size=300,
                                     coverage=25.0, seed=seed)
        reads += [x for pair in zip(a, b) for x in pair]

    pre = _assemble(reads)
    res = cm.run_contig_graph(cm.from_pregraph(pre), progress=False)
    contigs = [s for _, s, _ in cm.contig_sequences(res.graph)]
    best = max(contigs, key=len)
    t1, t2 = hap1.decode(), hap2.decode()
    assert res.stats["bubbles"] >= 2
    assert len(best) >= len(t1) - 300
    assert best in t1 or revcomp_str(best) in t1 \
        or best in t2 or revcomp_str(best) in t2


def test_repeat_in_bubble_arm_not_corrupted():
    """When a bubble arm contains a TRUE repeat shared with another
    chromosome, the path-bubble pass must NOT delete the repeat edge —
    chromosome C must stay fully assemblable."""
    A = sim.random_genome(1200, seed=901)
    B = sim.random_genome(1200, seed=902)
    R = sim.random_genome(45, seed=903)
    X1 = sim.random_genome(60, seed=904) + R + sim.random_genome(60, seed=905)
    x1 = bytearray(X1)
    for p in (10, 30, 130, 150):
        x1[p] = ord("A") if x1[p] != ord("A") else ord("C")
    X2 = bytes(x1)
    C = sim.random_genome(500, seed=906) + R + sim.random_genome(500, seed=907)
    hap1 = A + X1 + B
    hap2 = A + X2 + B
    reads = []
    for chrom, seed in ((hap1, 910), (hap2, 911), (C, 912)):
        a, b = sim.simulate_pe_reads(chrom, read_len=100, insert_size=300,
                                     coverage=25.0, seed=seed)
        reads += [x for pair in zip(a, b) for x in pair]

    pre = _assemble(reads)
    res = cm.run_contig_graph(cm.from_pregraph(pre), progress=False)
    contigs = [s for _, s, _ in cm.contig_sequences(res.graph)]
    cstr = C.decode()
    # every piece of C (split at the repeat at worst) must be recoverable
    total_c = sum(
        len(s) for s in contigs
        if s in cstr or revcomp_str(s) in cstr
    )
    assert total_c >= len(cstr) - 250
