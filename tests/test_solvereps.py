"""Repeat resolution (-R) tests: read paths split solvable repeats."""

import numpy as np

from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.models import contig as cm
from soapdenovo2_tpu.models import pregraph as pg
from soapdenovo2_tpu.utils import simulate as sim

from conftest import revcomp_str

K = 21


def test_repeat_split_restores_contig():
    """Two chromosomes X R Y and Z R W sharing an exact 50 bp repeat R:
    without -R the assembly breaks at R into 5 pieces; read paths pair
    the flanks and the chromosomes linearize back.  (The single-
    chromosome X R Y R Z case is correctly UNsolvable: Y flanks R on
    both sides, tripping interferingCheck — same as the reference.)"""
    X = sim.random_genome(900, seed=201)
    R = sim.random_genome(50, seed=202)
    Y = sim.random_genome(900, seed=203)
    Z = sim.random_genome(900, seed=204)
    W = sim.random_genome(900, seed=206)
    c1 = X + R + Y
    c2 = Z + R + W
    reads = []
    for chrom, seed in ((c1, 205), (c2, 207)):
        a, b = sim.simulate_pe_reads(chrom, read_len=100, insert_size=300,
                                     coverage=35.0, seed=seed)
        reads += [x for pair in zip(a, b) for x in pair]
    genome = c1  # recovery target below checks both

    def stream():
        return rio.batch_reads(iter(reads), 512, 100)

    from soapdenovo2_tpu.models import kmer_graph as kg
    from soapdenovo2_tpu.models import edges as edge_mod
    from soapdenovo2_tpu.ops import sortcount as sc

    table, _ = pg.count_reads_to_table(stream(), K, 100, init_capacity=1 << 14)
    g = kg.from_table(table)
    g = kg.mark_linear(g)
    g, _ = kg.remove_single_tips(g, K)
    g, _ = kg.remove_minor_tips(g, K)
    eg = edge_mod.build_edges(g, K)
    arcs, marker, paths = pg.build_arcs(
        stream(), eg, sc.KmerTable(keys=g.keys, covs=g.covs, n=g.n), K,
        record_paths=True,
    )
    pre = pg.PregraphResult(
        k=K, table=table, graph=g, edges=eg, arcs=arcs,
        marker_on_edge=marker, paths=paths, kmer_freq=np.zeros(255),
        n_reads=len(reads), max_read_len=100,
    )

    # without repeat resolution: repeat breaks the assembly
    res0 = cm.run_contig_graph(cm.from_pregraph(pre), paths=None,
                               progress=False)
    best0 = max(len(s) for _, s, _ in cm.contig_sequences(res0.graph))

    # with -R
    res1 = cm.run_contig_graph(cm.from_pregraph(pre), paths=paths,
                               progress=False)
    contigs1 = sorted((s for _, s, _ in cm.contig_sequences(res1.graph)),
                      key=len, reverse=True)

    t1, t2 = c1.decode(), c2.decode()
    assert best0 < len(t1) - 300, "repeat unexpectedly did not break"
    assert len(contigs1[0]) >= len(t1) - 250
    assert len(contigs1[1]) >= len(t2) - 250
    for c in contigs1[:2]:
        assert (c in t1 or revcomp_str(c) in t1
                or c in t2 or revcomp_str(c) in t2)
