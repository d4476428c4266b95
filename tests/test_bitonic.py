"""Bitonic merge, shift compaction, and the sorted-run LSM flush.

Validates the new flush primitives (ops/bitonic.py) and proves the
restructured count-pass flush (reduce_raws + merge_sorted_tables) is
bit-identical to the reference-semantics merge path (merge_many), i.e.
to saturating single-pass counting (newhash.c put_kmerset:473).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from soapdenovo2_tpu.ops import bitonic as bt
from soapdenovo2_tpu.ops import sortcount as sc


def test_merge_sorted_ops_random(rng):
    for _ in range(6):
        na, nb = rng.integers(1, 400, size=2)
        A = np.sort(rng.integers(0, 60, size=na).astype(np.uint64))
        B = np.sort(rng.integers(0, 60, size=nb).astype(np.uint64))
        ak0, ak1 = (A >> 4).astype(np.uint32), (A & 15).astype(np.uint32)
        bk0, bk1 = (B >> 4).astype(np.uint32), (B & 15).astype(np.uint32)
        ap = rng.integers(0, 2**32, size=na, dtype=np.uint32)
        bp = rng.integers(0, 2**32, size=nb, dtype=np.uint32)
        out = bt.merge_sorted_ops(
            (jnp.asarray(ak0), jnp.asarray(ak1), jnp.asarray(ap)),
            (jnp.asarray(bk0), jnp.asarray(bk1), jnp.asarray(bp)),
            num_keys=2,
        )
        k0, k1, p = (np.asarray(x) for x in out)
        m = na + nb
        merged = np.sort(np.concatenate([A, B]))
        got = (k0[:m].astype(np.uint64) << 4) | k1[:m]
        assert np.array_equal(got, merged)
        assert np.all(k0[m:] == 0xFFFFFFFF)
        # payload multiset per key preserved
        ref: dict = {}
        for key, pay in zip(np.concatenate([A, B]), np.concatenate([ap, bp])):
            ref.setdefault(int(key), []).append(int(pay))
        gotp: dict = {}
        for key, pay in zip(got, p[:m]):
            gotp.setdefault(int(key), []).append(int(pay))
        assert {k: sorted(v) for k, v in ref.items()} == {
            k: sorted(v) for k, v in gotp.items()
        }


def test_compact_by_shifts_random(rng):
    for _ in range(10):
        n = int(rng.integers(1, 3000))
        keep = rng.random(n) < rng.random()
        a = rng.integers(0, 2**32, size=n, dtype=np.uint32)
        b = rng.integers(0, 2**32, size=n, dtype=np.uint32)
        (ca, cb), nk = bt.compact_by_shifts(
            jnp.asarray(keep), (jnp.asarray(a), jnp.asarray(b))
        )
        ca, cb, nk = np.asarray(ca), np.asarray(cb), int(nk)
        assert nk == keep.sum()
        assert np.array_equal(ca[:nk], a[keep])
        assert np.array_equal(cb[:nk], b[keep])


def _random_raws(rng, n, k=21, key_space=200):
    """RawRows over a tiny key space (forces duplicates + saturation)."""
    from soapdenovo2_tpu.ops import kmer as kops

    w = kops.num_words(k)
    vals = rng.integers(0, key_space, size=n).astype(np.uint64)
    words = np.zeros((n, w), np.uint32)
    words[:, 0] = (vals >> 32).astype(np.uint32)
    words[:, 1] = (vals & 0xFFFFFFFF).astype(np.uint32)
    valid = rng.random(n) < 0.9
    left = rng.integers(0, 5, size=n).astype(np.uint8)
    right = rng.integers(0, 5, size=n).astype(np.uint8)
    return (
        sc.raw_rows(
            jnp.asarray(words), jnp.asarray(valid), jnp.asarray(left),
            jnp.asarray(right),
        ),
        sc.count_batch(
            jnp.asarray(words), jnp.asarray(valid), jnp.asarray(left),
            jnp.asarray(right), n,
        ),
    )


def test_flush_matches_merge_many(rng):
    """reduce_raws + merge_sorted_tables == merge_many (bit-equal covs,
    including 63/255 saturation from the tiny key space)."""
    k = 21
    cap = 512
    raws, compacts = zip(*[_random_raws(rng, 300, k) for _ in range(5)])
    table0 = sc.count_batch(  # a pre-existing sorted table
        *(lambda r: (r.keys, jnp.ones((300,), bool) & ~jnp.all(
            r.keys == jnp.uint32(0xFFFFFFFF), axis=-1),
            r.flank.astype(jnp.uint8) & 7,
            (r.flank >> 3).astype(jnp.uint8)))(_random_raws(rng, 300, k)[0]),
        300,
    )
    # reference path: one big sort of everything
    want = sc.merge_many(tuple([table0] + list(compacts)), cap)
    # new path: reduce raws alone, bitonic-merge into the table
    l1 = sc.reduce_raws(tuple(raws), cap)
    got = sc.merge_sorted_tables(table0, l1, cap)
    assert int(got.n) == int(want.n)
    n = int(want.n)
    assert np.array_equal(np.asarray(got.keys[:n]), np.asarray(want.keys[:n]))
    assert np.array_equal(np.asarray(got.covs[:n]), np.asarray(want.covs[:n]))


def test_reduce_raws_truncation_reports_true_count(rng):
    k = 21
    raws, _ = _random_raws(rng, 400, k, key_space=350)
    small = sc.reduce_raws((raws,), 16)  # way under the unique count
    full = sc.reduce_raws((raws,), 512)
    assert int(small.n) == int(full.n) > 16


def test_grow_table_preserves_sorted_content(rng):
    k = 21
    raws, _ = _random_raws(rng, 300, k)
    t = sc.reduce_raws((raws,), 256)
    g = sc.grow_table(t, 1024)
    n = int(t.n)
    assert g.keys.shape[0] == 1024
    assert np.array_equal(np.asarray(g.keys[:n]), np.asarray(t.keys[:n]))
    assert np.all(np.asarray(g.keys[n:]) == 0xFFFFFFFF)
    # still a valid merge input
    m = sc.merge_sorted_tables(g, t, 1024)
    assert int(m.n) == n
    doubled = np.minimum(
        np.asarray(t.covs[:n], np.int32) * 2, np.asarray(sc.COV_CAPS)
    )
    assert np.array_equal(np.asarray(m.covs[:n], np.int32), doubled)
