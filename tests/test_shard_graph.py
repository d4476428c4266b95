"""Sharded k-mer graph passes: equality with the single-device build.

The k-mer table stays hash-owner-sharded through pruning, tip clipping,
chain labeling and edge construction (parallel/shard_graph.py); these
tests assert per-key equality with models/kmer_graph + models/edges on
an 8-device virtual CPU mesh (SURVEY.md section 4: sharding-equivalence
is the multi-host correctness bar)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.models import edges as edge_mod
from soapdenovo2_tpu.models import kmer_graph as kg
from soapdenovo2_tpu.models import pregraph as pgm
from soapdenovo2_tpu.ops import kmer as kops
from soapdenovo2_tpu.ops import sortcount as sc
from soapdenovo2_tpu.parallel import shard_count as pc
from soapdenovo2_tpu.parallel import shard_graph as sg
from soapdenovo2_tpu.utils import simulate as sim

K = 21


def _mesh(n=8):
    if len(jax.devices()) < n:
        pytest.skip("needs 8 virtual devices")
    return pc.make_mesh(n)


def _reads(genome_len=4000, coverage=25.0, seed=5, with_tip=True):
    genome = sim.random_genome(genome_len, seed=seed)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=80, insert_size=300,
                                   coverage=coverage, seed=seed + 1)
    reads = [x for p in zip(r1, r2) for x in p]
    if with_tip:
        # a weak dead-end branch: the tip-clipping class
        tip = genome[1000:1040] + sim.random_genome(20, seed=seed + 9)
        reads += [tip] * 2
    return genome, reads


def _single_device_graph(reads, d=1):
    codes = np.full((len(reads), 100), kops.BASE_N, np.uint8)
    lengths = np.zeros((len(reads),), np.int32)
    for i, r in enumerate(reads):
        lengths[i] = rio.encode_read(r, codes[i])
    table, _ = pgm.count_reads_to_table(
        iter([rio.ReadBatch(codes=codes, lengths=lengths, n=len(reads),
                            start_id=0)]), K, 100)
    g = kg.from_table(table)
    if d > 0:
        g = kg.de_low_cov(g, jnp.int32(d))
        g = kg.compact_graph(g)
    g = kg.mark_linear(g)
    return g


def _sharded_graph(mesh, reads, d=1):
    codes = np.full((len(reads), 100), kops.BASE_N, np.uint8)
    lengths = np.zeros((len(reads),), np.int32)
    for i, r in enumerate(reads):
        lengths[i] = rio.encode_read(r, codes[i])
    batch = rio.ReadBatch(codes=codes, lengths=lengths, n=len(reads),
                          start_id=0)
    keys, covs, n, n_reads, dropped = pc.count_stream_sharded(
        iter([batch]), K, mesh, 100, len(reads))
    assert dropped == 0
    return sg.from_sharded_count(mesh, K, keys, covs, n, d_cutoff=d)


def _key_strings(keys_np):
    return [kops.kmer_to_string(w, K) for w in keys_np]


def test_sharded_prune_matches_single():
    mesh = _mesh()
    genome, reads = _reads()
    g1 = _single_device_graph(reads)
    gs, freq = _sharded_graph(mesh, reads)

    # per-key equality of (cov row, linear flag) over live keys
    k1 = np.asarray(g1.keys)
    live1 = ~np.asarray(g1.deleted)
    m1 = {k1[i].tobytes(): (np.asarray(g1.covs)[i].tolist(),
                            bool(np.asarray(g1.linear)[i]))
          for i in np.nonzero(live1)[0]}
    ks = np.asarray(gs.keys)
    dels = np.asarray(gs.deleted)
    ms = {ks[i].tobytes(): (np.asarray(gs.covs)[i].tolist(),
                            bool(np.asarray(gs.linear)[i]))
          for i in np.nonzero(~dels)[0]}
    assert m1 == ms
    # the kmerFreq histogram matches too
    f1 = np.asarray(kg.kmer_freq_hist(g1))
    assert np.array_equal(f1, freq)


def test_sharded_labels_match_single():
    mesh = _mesh()
    genome, reads = _reads()
    g1 = _single_device_graph(reads)
    gs, _ = _sharded_graph(mesh, reads)

    labels1, _ = kg.label_linear_chains(g1, K)
    succ = sg.make_linear_successors(gs, qcap=sg._next_pow2(
        4 * gs.cap // gs.n_shards + 64))
    on_chain, nxt, dropped = succ(gs.keys, gs.covs, gs.deleted, gs.linear,
                                  gs.pdir)
    assert int(np.asarray(dropped)[0]) == 0
    labels_s = sg.label_chains_sharded(mesh, on_chain, nxt)

    # map: sharded state gid -> key bytes + orient; compare chain
    # structure per state keyed by (kmer, orient)
    k1 = np.asarray(g1.keys)
    ks = np.asarray(gs.keys)

    def state_name(keys_np, s):
        return (keys_np[s >> 1].tobytes(), s & 1)

    on1 = np.asarray(labels1.on_chain)
    head1 = np.asarray(labels1.head)
    rank1 = np.asarray(labels1.rank)
    len1 = np.asarray(labels1.length)
    att1 = np.asarray(labels1.attach)

    ons = np.asarray(labels_s.on_chain)
    heads = np.asarray(labels_s.head)
    ranks = np.asarray(labels_s.rank)
    lens = np.asarray(labels_s.length)
    atts = np.asarray(labels_s.attach)

    d1 = {}
    for s in np.nonzero(on1)[0]:
        h = head1[s]
        d1[state_name(k1, s)] = (
            rank1[s], state_name(k1, h), len1[h],
            state_name(k1, att1[h]) if att1[h] >= 0 else None,
        )
    d2 = {}
    for s in np.nonzero(ons)[0]:
        h = heads[s]
        d2[state_name(ks, s)] = (
            ranks[s], state_name(ks, h), lens[h],
            state_name(ks, atts[h]) if atts[h] >= 0 else None,
        )
    assert d1 == d2


def test_sharded_tips_match_single():
    mesh = _mesh()
    genome, reads = _reads(with_tip=True)
    g1 = _single_device_graph(reads)
    gs, _ = _sharded_graph(mesh, reads)

    pdir_info = sc.build_prefix_dir_device(g1.keys, K)
    g1, n_single1 = kg.remove_single_tips(g1, K, pdir_info=pdir_info)
    g1, n_minor1 = kg.remove_minor_tips(g1, K, pdir_info=pdir_info)

    gs, n_single_s = sg.clip_tips_sharded(gs, thin=True)
    gs, n_minor_s = sg.clip_tips_sharded(gs, thin=False)

    assert int(np.asarray(n_single1)) == n_single_s
    assert int(np.asarray(n_minor1)) == n_minor_s
    assert int(np.asarray(n_minor1)) + int(np.asarray(n_single1)) > 0

    k1 = np.asarray(g1.keys)
    live1 = ~np.asarray(g1.deleted)
    m1 = {k1[i].tobytes(): (np.asarray(g1.covs)[i].tolist(),
                            bool(np.asarray(g1.linear)[i]))
          for i in np.nonzero(live1)[0]}
    ks = np.asarray(gs.keys)
    dels = np.asarray(gs.deleted)
    ms = {ks[i].tobytes(): (np.asarray(gs.covs)[i].tolist(),
                            bool(np.asarray(gs.linear)[i]))
          for i in np.nonzero(~dels)[0]}
    assert m1 == ms


def test_sharded_edges_match_single():
    mesh = _mesh()
    # interior exact repeat -> branch nodes -> several edges
    rep = sim.random_genome(300, seed=77)
    genome = (sim.random_genome(1500, seed=78) + rep
              + sim.random_genome(1500, seed=79) + rep
              + sim.random_genome(1500, seed=80))
    r1, r2 = sim.simulate_pe_reads(genome, read_len=80, insert_size=300,
                                   coverage=25.0, seed=81)
    reads = [x for p in zip(r1, r2) for x in p]
    g1 = _single_device_graph(reads)
    gs, _ = _sharded_graph(mesh, reads)

    pdir_info = sc.build_prefix_dir_device(g1.keys, K)
    g1, _ = kg.remove_single_tips(g1, K, pdir_info=pdir_info)
    g1, _ = kg.remove_minor_tips(g1, K, pdir_info=pdir_info)
    gs, _ = sg.clip_tips_sharded(gs, thin=True)
    gs, _ = sg.clip_tips_sharded(gs, thin=False)

    eg1 = edge_mod.build_edges(g1, K)
    egs, labels = sg.build_edges_sharded(gs)

    assert eg1.n_edges == egs.n_edges
    assert eg1.n_edges > 2
    # enumeration order matches (acyclic start enumeration is key-major
    # in both builds): compare per-edge content index-wise
    for e in range(eg1.n_edges):
        assert eg1.edge_string(e) == egs.edge_string(e), e
        assert int(eg1.cvg10[e]) == int(egs.cvg10[e]), e
        assert int(eg1.twin[e]) == int(egs.twin[e]), e
        assert bool(eg1.is_cycle[e]) == bool(egs.is_cycle[e]), e
    # patch tables equal
    assert np.array_equal(eg1.patch_keys, egs.patch_keys)
    assert np.array_equal(eg1.patch_edge, egs.patch_edge)
    assert np.array_equal(eg1.patch_twin, egs.patch_twin)
    # per-state annotations agree through the key mapping
    k1 = np.asarray(g1.keys)
    ks = np.asarray(gs.keys)
    se1 = np.asarray(eg1.state_edge)
    sr1 = np.asarray(eg1.state_rank)
    ses = np.asarray(egs.state_edge)
    srs = np.asarray(egs.state_rank)
    d1 = {(k1[s >> 1].tobytes(), s & 1): (int(se1[s]), int(sr1[s]))
          for s in np.nonzero(se1 >= 0)[0]}
    d2 = {(ks[s >> 1].tobytes(), s & 1): (int(ses[s]), int(srs[s]))
          for s in np.nonzero(ses >= 0)[0]}
    assert d1 == d2


def test_forced_overflow_label_raises():
    """Routing-capacity overflow must surface as an error, never a
    silent drop (VERDICT r4 item 9): label_chains_sharded with a
    deliberately tiny qcap raises instead of mislabeling."""
    mesh = _mesh()
    # one long chain: every state routes to a neighbor, so a qcap of 1
    # cannot carry the per-shard traffic
    n = 512
    on = np.ones((2 * n,), bool)
    nxt = np.full((2 * n,), -1, np.int32)
    for a in range(n - 1):
        nxt[2 * a] = 2 * (a + 1)
        nxt[2 * (a + 1) + 1] = 2 * a + 1
    with pytest.raises(RuntimeError, match="dropped|qcap"):
        sg.label_chains_sharded(mesh, jnp.asarray(on), jnp.asarray(nxt),
                                qcap=1)


def test_forced_overflow_count_raises():
    """count path: a bucket_cap far below per-shard traffic must raise
    through run_pregraph's sharded-count check, not drop k-mers."""
    mesh = _mesh()
    genome, reads = _reads(genome_len=2000, with_tip=False)
    codes = np.full((len(reads), 100), kops.BASE_N, np.uint8)
    lengths = np.zeros((len(reads),), np.int32)
    for i, r in enumerate(reads):
        lengths[i] = rio.encode_read(r, codes[i])
    batch = rio.ReadBatch(codes=codes, lengths=lengths, n=len(reads),
                          start_id=0)
    keys, covs, n, n_reads, dropped = pc.count_stream_sharded(
        iter([batch]), K, mesh, 100, len(reads), bucket_cap=8)
    assert int(dropped) > 0  # the count is reported, the caller raises


@pytest.mark.slow
def test_sharded_pipeline_5mb():
    """VERDICT r4 item 3: the sharded graph path at the scale it exists
    for.  Full sharded pipeline (count -> prune -> tips -> labels ->
    edges) at 5 Mb on the 8-device CPU mesh, asserting edge-set equality
    with the single-device build and logging per-shard peak rows/bytes
    (the reference's 150 GB k-mer hash object, README.md:32, is what
    parallel/shard_graph.py exists to shard)."""
    mesh = _mesh()
    genome = sim.random_genome(5_000_000, seed=11)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=350,
                                   coverage=20.0, error_rate=0.003,
                                   seed=12)
    reads = [x for p in zip(r1, r2) for x in p]

    def batches():
        return rio.batch_reads(iter(reads), 16384, 100)

    # single-device reference build
    table, _ = pgm.count_reads_to_table(batches(), K, 100)
    g1 = kg.from_table(table)
    g1 = kg.de_low_cov(g1, jnp.int32(1))
    g1 = kg.compact_graph(g1)
    g1 = kg.mark_linear(g1)
    pdir_info = sc.build_prefix_dir_device(g1.keys, K)
    g1, _ = kg.remove_single_tips(g1, K, pdir_info=pdir_info)
    g1, _ = kg.remove_minor_tips(g1, K, pdir_info=pdir_info)
    eg1 = edge_mod.build_edges(g1, K)

    # sharded build
    keys, covs, n, n_reads, dropped = pc.count_stream_sharded(
        batches(), K, mesh, 100, len(reads))
    assert dropped == 0
    gs = sg.from_sharded_count(mesh, K, keys, covs, n, d_cutoff=1)
    per_shard_live = np.asarray(gs.n).reshape(-1)
    row_bytes = (np.asarray(gs.keys).dtype.itemsize
                 * np.asarray(gs.keys).shape[-1]
                 + np.asarray(gs.covs).dtype.itemsize
                 * np.asarray(gs.covs).shape[-1])
    print(f"[5mb sharded] shards={gs.n_shards} cap/shard={gs.cap} "
          f"live/shard={per_shard_live.tolist()} "
          f"bytes/shard={gs.cap * row_bytes}")
    gs, _ = sg.clip_tips_sharded(gs, thin=True)
    gs, _ = sg.clip_tips_sharded(gs, thin=False)
    egs, labels = sg.build_edges_sharded(gs)

    assert eg1.n_edges == egs.n_edges
    assert eg1.n_edges > 100
    # edge-set equality: (sequence, cvg) multisets + twin involution
    def edge_sig(eg):
        sigs = []
        for e in range(eg.n_edges):
            sigs.append((eg.edge_string(e), int(eg.cvg10[e])))
        return sorted(sigs)

    assert edge_sig(eg1) == edge_sig(egs)
