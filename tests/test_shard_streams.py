"""Sharding-equivalence tests for the arc and map passes: the N-device
all_to_all-routed / data-parallel streams must reproduce the single-device
results exactly (the determinism the reference lacks — its arc order is
thread-count dependent, iterate.c:2686)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.models import edges as edge_mod
from soapdenovo2_tpu.models import kmer_graph as kg
from soapdenovo2_tpu.models import mapping as mp
from soapdenovo2_tpu.models import pregraph as pg
from soapdenovo2_tpu.ops import sortcount as sc
from soapdenovo2_tpu.parallel import shard_count as pc
from soapdenovo2_tpu.parallel import shard_streams as ss
from soapdenovo2_tpu.utils import simulate as sim

K = 21


def _pipeline_to_edges(reads, read_len):
    """Single-device count -> graph -> edges (shared fixture half)."""
    def batches():
        return rio.batch_reads(iter(reads), 64, read_len)

    table, _ = pg.count_reads_to_table(batches(), K, read_len,
                                       init_capacity=1 << 14)
    g = kg.mark_linear(kg.from_table(table))
    g, _ = kg.remove_single_tips(g, K)
    eg = edge_mod.build_edges(g, K)
    return batches, table, g, eg


def test_sharded_arcs_match_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    mesh = pc.make_mesh(8)
    # a genome with repeats so the edge graph has real branching/arcs
    rng = np.random.default_rng(31)
    core = sim.random_genome(1500, seed=32)
    rep = core[200:400]
    genome = core[:700] + rep + core[700:1100] + rep + core[1100:]
    r1, r2 = sim.simulate_pe_reads(genome, read_len=64, insert_size=180,
                                   coverage=15.0, seed=33)
    reads = [x for pair in zip(r1, r2) for x in pair]
    batches, table, g, eg = _pipeline_to_edges(reads, 64)
    tbl = sc.KmerTable(keys=g.keys, covs=g.covs, n=g.n)

    ref_arcs, ref_marker, ref_paths = pg.build_arcs(
        batches(), eg, tbl, K, record_paths=True
    )
    nr = int(ref_arcs.n)
    ref_keys = np.asarray(ref_arcs.keys)[:nr]
    ref_mult = np.asarray(ref_arcs.mult)[:nr]
    assert nr > 0, "fixture must produce arcs"

    got_arcs, got_marker, got_paths = pg.build_arcs_sharded(
        batches(), eg, tbl, K, mesh, record_paths=True
    )
    ng = int(got_arcs.n)
    got_keys = np.asarray(got_arcs.keys)[:ng]
    got_mult = np.asarray(got_arcs.mult)[:ng]

    # identical sorted (from, to) -> mult tables
    assert ng == nr
    assert (got_keys == ref_keys).all()
    assert (got_mult == ref_mult).all()
    # markers and recorded paths identical (same read order)
    assert (got_marker == ref_marker).all()
    assert len(got_paths) == len(ref_paths)
    for a, b in zip(got_paths, ref_paths):
        assert (a == b).all()


def test_sharded_arc_stream_shard_ownership():
    """Each shard's sub-table is sorted and owned by hash(from)."""
    assert len(jax.devices()) >= 8
    mesh = pc.make_mesh(8)
    genome = sim.random_genome(3000, seed=41)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=64, insert_size=180,
                                   coverage=12.0, seed=42)
    reads = [x for pair in zip(r1, r2) for x in pair]
    batches, table, g, eg = _pipeline_to_edges(reads, 64)
    stream = ss.ShardedArcStream(
        mesh, K, g.keys, eg.state_edge, eg.state_rank,
        eg.patch_keys, eg.patch_edge, eg.patch_twin,
    )
    for batch in batches():
        batch = batch.trimmed()
        codes, lengths = batch.codes, batch.lengths
        pad = (-codes.shape[0]) % 8
        if pad:
            codes = np.concatenate(
                [codes, np.full((pad, codes.shape[1]), 4, np.uint8)])
            lengths = np.concatenate(
                [lengths, np.zeros((pad,), lengths.dtype)])
        stream.add_batch(codes, lengths)
    keys, mult, n = stream.finish()
    assert stream.dropped == 0
    keys = np.asarray(keys)
    n = np.asarray(n)
    cap = keys.shape[0] // 8
    for s in range(8):
        sk = keys[s * cap : s * cap + n[s]]
        if sk.shape[0] == 0:
            continue
        # sorted within shard
        packed = sk[:, 0].astype(np.uint64) << np.uint64(32) | sk[:, 1].astype(np.uint64)
        assert (packed[1:] > packed[:-1]).all()
        # owned by this shard
        h = np.asarray(ss._mix32(jnp.asarray(sk[:, 0]))) % 8
        assert (h == s).all()


def test_sharded_map_matches_single_device():
    assert len(jax.devices()) >= 8
    mesh = pc.make_mesh(8)
    genome = sim.random_genome(2500, seed=51)
    # contigs = genome slabs; reads drawn from the genome
    contigs = [genome[i : i + 500].decode() for i in range(0, 2500, 500)]
    r1, r2 = sim.simulate_pe_reads(genome, read_len=60, insert_size=200,
                                   coverage=10.0, seed=52)
    reads = [x for pair in zip(r1, r2) for x in pair]
    index = mp.build_contig_index(contigs, K)
    batch = next(rio.batch_reads(iter(reads), 256, 60)).trimmed()

    ref = mp._map_batch(
        jnp.asarray(batch.codes), jnp.asarray(batch.lengths), K,
        jnp.asarray(index.keys), jnp.asarray(index.cid),
        jnp.asarray(index.pos), jnp.asarray(index.flip.astype(np.int8)),
        jnp.asarray(index.ctg_len),
    )
    mapper = ss.ShardedMapper(mesh, index)
    got = mapper.map_batch(batch.codes, batch.lengths)
    n = batch.n
    names = ["ctg", "pos", "mapped", "multi_ctg"]
    for name, a, b in zip(names, ref, got):
        a = np.asarray(a)[:n]
        b = np.asarray(b)[:n]
        assert (a == b).all(), name
    assert int(np.asarray(ref[2])[:n].sum()) > 0, "fixture must map reads"


def test_run_pregraph_sharded_matches_single(tmp_path):
    """Driver-level invariance: run_pregraph with an 8-device mesh equals
    the single-chip run (same table, same edges, same arcs)."""
    assert len(jax.devices()) >= 8
    from soapdenovo2_tpu.config import AssemblyConfig, LibInfo

    genome = sim.random_genome(2000, seed=61)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=64, insert_size=200,
                                   coverage=12.0, seed=62)
    fq = tmp_path / "reads.fq"
    with open(fq, "w") as fh:
        for i, (a, b) in enumerate(zip(r1, r2)):
            fh.write(f"@r{i}/1\n{a}\n+\n{'I' * len(a)}\n")
            fh.write(f"@r{i}/2\n{b}\n+\n{'I' * len(b)}\n")
    lib = LibInfo(avg_ins=200, reverse_seq=0, asm_flags=3,
                  rank=1, q=[str(fq)])
    cfg = AssemblyConfig(max_rd_len=64, libs=[lib])

    single = pg.run_pregraph(cfg, K, batch_size=256, progress=False,
                             mesh=None)
    mesh = pc.make_mesh(8)
    sharded = pg.run_pregraph(cfg, K, batch_size=256, progress=False,
                              mesh=mesh)

    # the sharded path keeps the table distributed (table=None); edge
    # enumeration order matches the single-device build, so edges and
    # arcs compare index-wise
    assert sharded.table is None and sharded.branch_keys is not None
    assert single.edges.n_edges == sharded.edges.n_edges
    for e in range(single.edges.n_edges):
        assert single.edges.edge_string(e) == sharded.edges.edge_string(e)
        assert int(single.edges.twin[e]) == int(sharded.edges.twin[e])
        assert int(single.edges.cvg10[e]) == int(sharded.edges.cvg10[e])
    na, nb = int(single.arcs.n), int(sharded.arcs.n)
    assert na == nb
    assert (np.asarray(single.arcs.keys)[:na]
            == np.asarray(sharded.arcs.keys)[:nb]).all()
    assert (np.asarray(single.arcs.mult)[:na]
            == np.asarray(sharded.arcs.mult)[:nb]).all()
    # vertex-file content: branch keys equal the single-device set
    lin = np.asarray(single.graph.linear)
    dele = np.asarray(single.graph.deleted)
    bk1 = np.asarray(single.graph.keys)[~lin & ~dele]
    assert (bk1 == sharded.branch_keys).all()
    assert np.array_equal(single.kmer_freq, sharded.kmer_freq)
