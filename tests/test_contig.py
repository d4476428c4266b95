"""Contig-stage tests: bubble popping, cleaning, linearization."""

import numpy as np
import pytest

from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.models import contig as cm
from soapdenovo2_tpu.models import pregraph as pg
from soapdenovo2_tpu.utils import simulate as sim
from soapdenovo2_tpu.config import parse_config

from conftest import revcomp_str

K = 21


def _pregraph_from_reads(reads, max_len=100, d=0):
    def stream():
        return iter(reads)

    table, _ = pg.count_reads_to_table(
        rio.batch_reads(stream(), 512, max_len), K, max_len,
        init_capacity=1 << 14,
    )
    from soapdenovo2_tpu.models import kmer_graph as kg
    from soapdenovo2_tpu.models import edges as edge_mod
    import jax.numpy as jnp
    from soapdenovo2_tpu.ops import sortcount as sc

    g = kg.from_table(table)
    if d:
        g = kg.de_low_cov(g, jnp.int32(d))
    g = kg.mark_linear(g)
    g, _ = kg.remove_single_tips(g, K)
    g, _ = kg.remove_minor_tips(g, K)
    eg = edge_mod.build_edges(g, K)
    arcs, marker, paths = pg.build_arcs(
        rio.batch_reads(stream(), 512, max_len), eg,
        sc.KmerTable(keys=g.keys, covs=g.covs, n=g.n), K,
    )
    return pg.PregraphResult(
        k=K, table=table, graph=g, edges=eg, arcs=arcs,
        marker_on_edge=marker, paths=paths, kmer_freq=np.zeros(255),
        n_reads=len(reads), max_read_len=max_len,
    )


def test_bubble_pop_recovers_contig():
    """A mid-read error creates a bubble; the contig stage must pop it and
    linearize back to (nearly) the full genome."""
    genome = sim.random_genome(1500, seed=41)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=300,
                                   coverage=30.0, seed=42)
    reads = [x for pair in zip(r1, r2) for x in pair]
    bad = bytearray(genome[600:700])
    bad[50] = ord("A") if bad[50] != ord("A") else ord("C")
    reads.append(bytes(bad))
    reads.append(bytes(bad))  # cov 2 so tip passes can't claim it

    pre = _pregraph_from_reads(reads)
    res = cm.run_contig(pre, progress=False)
    contigs = cm.contig_sequences(res.graph)
    best = max((s for _, s, _ in contigs), key=len)
    gstr = genome.decode()
    assert res.stats["bubbles"] >= 1
    assert len(best) >= len(gstr) - 250
    assert best in gstr or revcomp_str(best) in gstr


def test_error_reads_full_pipeline():
    """1% error rate, 40x coverage: cleaned assembly should still produce a
    dominant contig covering most of the genome."""
    genome = sim.random_genome(3000, seed=51)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=300,
                                   coverage=40.0, error_rate=0.005, seed=52)
    reads = [x for pair in zip(r1, r2) for x in pair]
    pre = _pregraph_from_reads(reads, d=1)
    res = cm.run_contig(pre, progress=False)
    contigs = cm.contig_sequences(res.graph, min_len=100)
    assert contigs, "no contigs produced"
    stats = res.stats
    best = max((s for _, s, _ in contigs), key=len)
    # dominant contig covers >=60% of the genome
    assert len(best) >= 0.6 * len(genome)


def test_two_chromosomes():
    g1 = sim.random_genome(1200, seed=61)
    g2 = sim.random_genome(900, seed=62)
    reads = []
    for g in (g1, g2):
        a, b = sim.simulate_pe_reads(g, read_len=100, insert_size=250,
                                     coverage=30.0, seed=len(reads) + 7)
        reads += [x for pair in zip(a, b) for x in pair]
    pre = _pregraph_from_reads(reads)
    res = cm.run_contig(pre, progress=False)
    contigs = sorted((s for _, s, _ in cm.contig_sequences(res.graph)),
                     key=len, reverse=True)
    assert len(contigs) >= 2
    for target in (g1.decode(), g2.decode()):
        hit = any(c in target or revcomp_str(c) in target
                  for c in contigs[:2])
        assert hit
