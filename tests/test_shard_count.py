"""Sharding-equivalence tests: N-device counting == 1-device counting."""

import numpy as np
import jax
import pytest

from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.models import pregraph as pg
from soapdenovo2_tpu.ops import kmer as kops
from soapdenovo2_tpu.parallel import shard_count as pc
from soapdenovo2_tpu.utils import simulate as sim

K = 21


def test_sharded_count_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    mesh = pc.make_mesh(8)
    genome = sim.random_genome(2000, seed=17)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=80, insert_size=200,
                                   coverage=12.0, seed=18)
    reads = [x for pair in zip(r1, r2) for x in pair]
    batch = next(rio.batch_reads(iter(reads), 1 << 10, 80))

    keys, covs, n, dropped, hist = pc.count_reads_sharded(
        batch.codes, batch.lengths, K, mesh
    )
    assert dropped.sum() == 0

    # reference: single-table count
    table, _ = pg.count_reads_to_table(
        iter([batch]), K, 80, init_capacity=1 << 15
    )
    nt = int(table.n)
    ref_keys = np.asarray(table.keys)[:nt]
    ref_covs = np.asarray(table.covs)[:nt]
    ref = {
        tuple(ref_keys[i]): tuple(ref_covs[i]) for i in range(nt)
    }

    # union of shard tables
    got = {}
    rows_per_shard = keys.shape[0] // 8
    for s in range(8):
        ns = int(n[s])
        lo = s * rows_per_shard
        for i in range(lo, lo + ns):
            got[tuple(keys[i])] = tuple(covs[i])
    assert got == ref

    # per-shard tables must be sorted and hash-consistent
    for s in range(8):
        ns = int(n[s])
        lo = s * rows_per_shard
        sk = keys[lo : lo + ns]
        for i in range(1, ns):
            assert kops.kmer_to_int(sk[i - 1]) < kops.kmer_to_int(sk[i])
        if ns:
            import jax.numpy as jnp
            h = np.asarray(kops.hash_words(jnp.asarray(sk))) % 8
            assert (h == s).all()

    # histogram equals single-device histogram
    tot = ref_covs[:, 8]
    ref_hist = np.bincount(np.clip(tot, 0, 255), minlength=256)
    assert (hist[1:] == ref_hist[1:]).all()


def test_sharded_stream_matches_single_device():
    """Streaming multi-batch LSM counting over the mesh == 1-device."""
    assert len(jax.devices()) >= 8
    mesh = pc.make_mesh(8)
    genome = sim.random_genome(5000, seed=21)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=70, insert_size=220,
                                   coverage=20.0, seed=22)
    reads = [x for pair in zip(r1, r2) for x in pair]

    def batches():
        return rio.batch_reads(iter(reads), 64, 70)

    keys, covs, n, n_reads, dropped = pc.count_stream_sharded(
        batches(), K, mesh, max_len=70, batch_b=64,
        init_cap_per_shard=1 << 10,
    )
    assert dropped == 0
    assert n_reads == len(reads)
    keys = np.asarray(keys)
    covs = np.asarray(covs)
    n = np.asarray(n)
    rows_per_shard = keys.shape[0] // 8

    table, _ = pg.count_reads_to_table(batches(), K, 70,
                                       init_capacity=1 << 14)
    nt = int(table.n)
    ref_keys = np.asarray(table.keys)[:nt]
    ref_covs = np.asarray(table.covs)[:nt]
    ref = {tuple(ref_keys[i]): tuple(ref_covs[i]) for i in range(nt)}

    got = {}
    for s in range(8):
        ns = int(n[s])
        lo = s * rows_per_shard
        sk = keys[lo:lo + ns]
        # sorted within shard, owned by shard s
        for i in range(1, ns):
            assert kops.kmer_to_int(sk[i - 1]) < kops.kmer_to_int(sk[i])
        if ns:
            import jax.numpy as jnp
            h = np.asarray(kops.hash_words(jnp.asarray(sk))) % 8
            assert (h == s).all()
        for i in range(lo, lo + ns):
            got[tuple(keys[i])] = tuple(covs[i])
    assert got == ref
