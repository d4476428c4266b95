"""End-to-end-ish tests for the pregraph stage on simulated reads."""

import collections

from conftest import random_dna

import numpy as np
import jax.numpy as jnp
import pytest

from soapdenovo2_tpu.ops import kmer as kops
from soapdenovo2_tpu.ops import sortcount as sc
from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.models import kmer_graph as kg
from soapdenovo2_tpu.models import edges as edge_mod
from soapdenovo2_tpu.models import pregraph as pg
from soapdenovo2_tpu.utils import simulate as sim

from conftest import revcomp_str

K = 21


def batches(reads, batch_size=256, max_len=100):
    return rio.batch_reads(iter(reads), batch_size, max_len)


def canon_str(s: str) -> str:
    rc = revcomp_str(s)
    return min(s, rc)


def brute_counts(reads, k):
    counts = collections.Counter()
    for r in reads:
        s = r.decode()
        for i in range(len(s) - k + 1):
            sub = s[i : i + k]
            if "N" in sub:
                continue
            counts[canon_str(sub)] += 1
    return counts


def test_count_matches_bruteforce():
    genome = sim.random_genome(1500, seed=7)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=80, insert_size=200,
                                   coverage=8.0, seed=8)
    reads = [x for pair in zip(r1, r2) for x in pair]
    table, n_reads = pg.count_reads_to_table(
        batches(reads, max_len=80), K, 80, init_capacity=1 << 12
    )
    assert n_reads == len(reads)
    want = brute_counts(reads, K)
    n = int(table.n)
    keys = np.asarray(table.keys)[:n]
    covs = np.asarray(table.covs)[:n]
    got = {
        kops.kmer_to_string(keys[i], K): int(covs[i, 8]) for i in range(n)
    }
    want_capped = {s: min(c, 255) for s, c in want.items()}
    assert got == want_capped
    # keys must be sorted & unique
    for i in range(1, n):
        assert kops.kmer_to_int(keys[i - 1]) < kops.kmer_to_int(keys[i])


def test_single_contig_recovery():
    genome = sim.random_genome(2000, seed=3)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=300,
                                   coverage=25.0, seed=4)
    reads = [x for pair in zip(r1, r2) for x in pair]
    table, _ = pg.count_reads_to_table(batches(reads), K, 100,
                                       init_capacity=1 << 12)
    g = kg.from_table(table)
    g = kg.mark_linear(g)
    g, _ = kg.remove_single_tips(g, K)
    g, _ = kg.remove_minor_tips(g, K)
    eg = edge_mod.build_edges(g, K)
    strings = [eg.edge_string(e) for e in range(eg.n_edges)]
    gstr = genome.decode()
    # Nearly the full genome must be recovered as one edge (read coverage
    # can miss the extreme ends, and coverage-1 end tips get clipped).
    best = max(strings, key=len) if strings else ""
    assert len(best) >= len(gstr) - 250
    assert best in gstr or revcomp_str(best) in gstr
    # twin consistency: every edge's twin's string is its revcomp
    for e in range(eg.n_edges):
        t = int(eg.twin[e])
        assert t >= 0
        assert eg.edge_string(t) == revcomp_str(strings[e])


def test_branching_graph_and_arcs():
    rng = np.random.default_rng(11)
    X = sim.random_genome(500, seed=20)
    M = sim.random_genome(400, seed=21)
    Y = sim.random_genome(500, seed=22)
    Z = sim.random_genome(500, seed=23)
    W = sim.random_genome(500, seed=24)
    c1 = X + M + Y
    c2 = Z + M + W
    reads = []
    for chrom in (c1, c2):
        a, b = sim.simulate_pe_reads(chrom, read_len=100, insert_size=250,
                                     coverage=20.0, seed=len(reads) + 1)
        reads += [x for pair in zip(a, b) for x in pair]
    table, _ = pg.count_reads_to_table(batches(reads), K, 100,
                                       init_capacity=1 << 14)
    g = kg.from_table(table)
    g = kg.mark_linear(g)
    g, _ = kg.remove_single_tips(g, K)
    g, _ = kg.remove_minor_tips(g, K)
    eg = edge_mod.build_edges(g, K)
    assert eg.n_edges >= 10  # 5 undirected unitigs (X,Z,M,Y,W) x 2
    strings = [eg.edge_string(e) for e in range(eg.n_edges)]
    canon = {canon_str(s) for s in strings}
    # M (plus k-1 flanking overlap on each side) must appear as one unitig
    m_edges = [s for s in strings if M.decode() in s or
               M.decode() in revcomp_str(s)]
    assert m_edges, "shared segment not assembled as a single unitig"

    arcs, marker, paths = pg.build_arcs(
        batches(reads), eg, sc.KmerTable(keys=g.keys, covs=g.covs, n=g.n), K,
        record_paths=True,
    )
    n_arcs = int(arcs.n)
    assert n_arcs >= 8  # 4 junctions x 2 directions
    keys = np.asarray(arcs.keys)[:n_arcs]
    mult = np.asarray(arcs.mult)[:n_arcs]
    assert (mult > 0).all()
    assert (keys[:, 0] < eg.n_edges).all() and (keys[:, 1] < eg.n_edges).all()
    # arc symmetry: arc(a->b) implies arc(twin(b)->twin(a))
    arcset = {(int(a), int(b)) for a, b in keys}
    for a, b in arcset:
        assert (int(eg.twin[b]), int(eg.twin[a])) in arcset


def test_tip_removal():
    genome = sim.random_genome(1200, seed=31)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=300,
                                   coverage=30.0, seed=32)
    reads = [x for pair in zip(r1, r2) for x in pair]
    # an error near the read END creates a dead-end branch (a tip);
    # a mid-read error would make a bubble instead
    bad = bytearray(genome[500:600])
    bad[95] = ord("A") if bad[95] != ord("A") else ord("C")
    reads.append(bytes(bad))
    table, _ = pg.count_reads_to_table(batches(reads), K, 100,
                                       init_capacity=1 << 13)
    g = kg.from_table(table)
    g = kg.mark_linear(g)
    g, n1 = kg.remove_single_tips(g, K)
    g, n2 = kg.remove_minor_tips(g, K)
    assert n1 + n2 > 0, "error tip was not clipped"
    eg = edge_mod.build_edges(g, K)
    best = max((eg.edge_string(e) for e in range(eg.n_edges)), key=len)
    gstr = genome.decode()
    assert len(best) >= len(gstr) - 250
    assert best in gstr or revcomp_str(best) in gstr


def test_rows_triggered_flush_small_capacity():
    """A small table capacity must trigger early (pow2 fan-in) flushes
    instead of accumulating the full fan-in of raw rows — the 34M-row
    sort against a 4M-row table OOM'd HBM at 2 Mb scale (r3)."""
    genome = sim.random_genome(30_000, seed=9)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=80, insert_size=300,
                                   coverage=20.0, seed=10)
    reads = [x for p in zip(r1, r2) for x in p]
    # capacity far below one batch's raw rows: every batch flushes alone
    small, _ = pg.count_reads_to_table(
        rio.batch_reads(iter(reads), 512, 80), K, 80,
        init_capacity=1 << 12,
    )
    big, _ = pg.count_reads_to_table(
        rio.batch_reads(iter(reads), 512, 80), K, 80,
        init_capacity=1 << 18,
    )
    ns, nb = int(small.n), int(big.n)
    assert ns == nb
    ks = np.asarray(small.keys)[:ns]
    kb = np.asarray(big.keys)[:nb]
    assert (ks == kb).all()
    cs = np.asarray(small.covs)[:ns]
    cb = np.asarray(big.covs)[:nb]
    assert (cs == cb).all()


def test_packed_transfer_interior_ns():
    """2-bit packed uploads must preserve interior N bases (exception
    list) and fall back to unpacked when a batch is N-heavy."""
    # exception-list path
    codes = np.zeros((4, 40), np.uint8)
    codes[1, 7] = kops.BASE_N
    codes[2, 0] = kops.BASE_N
    codes[3, 39] = kops.BASE_N
    lengths = np.full((4,), 40, np.int32)
    pi = kops.pack_codes_host(codes, lengths)
    assert pi is not None
    packed, nr, nc = pi
    out = np.asarray(kops.unpack_codes(
        jnp.asarray(packed), jnp.asarray(lengths), 40,
        jnp.asarray(nr), jnp.asarray(nc)))
    assert (out == codes).all()

    # padding beyond length restored as BASE_N
    lengths2 = np.array([40, 30, 40, 40], np.int32)
    pi2 = kops.pack_codes_host(codes, lengths2)
    packed2, nr2, nc2 = pi2
    out2 = np.asarray(kops.unpack_codes(
        jnp.asarray(packed2), jnp.asarray(lengths2), 40,
        jnp.asarray(nr2), jnp.asarray(nc2)))
    assert (out2[1, 30:] == kops.BASE_N).all()
    assert (out2[1, :7] == codes[1, :7]).all()

    # N-heavy batch -> fallback marker
    heavy = np.full((8, 200), kops.BASE_N, np.uint8)
    assert kops.pack_codes_host(
        heavy, np.full((8,), 200, np.int32)) is None

    # end-to-end: a read stream with interior Ns counts identically to
    # the unpacked semantics (N-containing k-mers skipped)
    genome = sim.random_genome(5_000, seed=77)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=80, insert_size=300,
                                   coverage=15.0, seed=78)
    reads = []
    for i, r in enumerate(x for p in zip(r1, r2) for x in p):
        b = bytearray(r)
        if i % 5 == 0:
            b[37] = ord("N")
        reads.append(bytes(b))
    table, _ = pg.count_reads_to_table(
        rio.batch_reads(iter(reads), 256, 80), K, 80,
        init_capacity=1 << 15)
    # brute-force truth
    import collections

    truth = collections.Counter()
    comp = bytes.maketrans(b"ACGTN", b"TGCAN")
    for r in reads:
        s = r.decode()
        for i in range(len(s) - K + 1):
            km = s[i : i + K]
            if "N" in km:
                continue
            rc = km.encode().translate(comp)[::-1].decode()
            truth[min(km, rc)] += 1
    assert int(table.n) == len(truth)


def test_partitioned_count_matches_dense(rng):
    """The prefix-partitioned LSM (HBM-bounded merges for tables past
    PARTITION_ROWS) reassembles into exactly the dense path's pruned,
    compacted table."""
    import jax.numpy as jnp

    from soapdenovo2_tpu.models import kmer_graph as kg

    genome = random_dna(rng, 3000).encode()
    reads = []
    for i in range(0, 2500, 7):
        reads.append(genome[i : i + 80])
    reads.append(b"ACGT" * 20)  # a low-coverage stray for -d pruning
    codes = np.full((len(reads), 80), kops.BASE_N, np.uint8)
    lengths = np.zeros((len(reads),), np.int32)
    for i, r in enumerate(reads):
        lengths[i] = rio.encode_read(r, codes[i])
    batch = rio.ReadBatch(codes=codes, lengths=lengths, n=len(reads),
                          start_id=0)
    K = 21
    dense, _ = pg.count_reads_to_table(iter([batch]), K, 80)
    g = kg.from_table(dense)
    g = kg.de_low_cov(g, jnp.int32(1))
    g = kg.compact_graph(g)
    nl = int(jnp.sum((~g.deleted).astype(jnp.int32)))

    part, _ = pg.count_reads_to_table(
        iter([batch]), K, 80, partitions=4, prune_d=1)
    np_ = int(part.n)
    assert np_ == nl
    assert np.array_equal(np.asarray(g.keys)[:nl],
                          np.asarray(part.keys)[:np_])
    assert np.array_equal(np.asarray(g.covs)[:nl],
                          np.asarray(part.covs)[:np_])
    # sentinel tail intact (lookups rely on it)
    assert (np.asarray(part.keys)[np_:] == 0xFFFFFFFF).all()


def test_build_edges_host_label_path(rng, monkeypatch):
    """The >2^27-state fallback (labels + phase2/3 label consumption on
    the host) must produce the same edges as the device path."""
    from soapdenovo2_tpu.ops import chains as chain_ops

    genome = random_dna(rng, 4000).encode()
    reads = [genome[i : i + 80] for i in range(0, 3900, 6)]
    codes = np.full((len(reads), 80), kops.BASE_N, np.uint8)
    lengths = np.zeros((len(reads),), np.int32)
    for i, r in enumerate(reads):
        lengths[i] = rio.encode_read(r, codes[i])
    batch = rio.ReadBatch(codes=codes, lengths=lengths, n=len(reads),
                          start_id=0)
    K = 21

    def build():
        table, _ = pg.count_reads_to_table(iter([batch]), K, 80)
        g = kg.mark_linear(kg.from_table(table))
        return edge_mod.build_edges(g, K)

    eg_dev = build()
    monkeypatch.setattr(chain_ops, "LABEL_HOST_THRESHOLD", 1)
    eg_host = build()
    assert eg_dev.n_edges == eg_host.n_edges
    for e in range(eg_dev.n_edges):
        assert eg_dev.edge_string(e) == eg_host.edge_string(e)
        assert int(eg_dev.twin[e]) == int(eg_host.twin[e])
    assert np.array_equal(np.asarray(eg_dev.state_edge),
                          np.asarray(eg_host.state_edge))
    assert np.array_equal(np.asarray(eg_dev.state_rank),
                          np.asarray(eg_host.state_rank))
