"""Property tests for multiword k-mer math vs. a brute-force string model."""

import numpy as np
import jax.numpy as jnp
import pytest

from soapdenovo2_tpu.ops import kmer as kops
from conftest import random_dna, revcomp_str

KS = [13, 15, 21, 31, 33, 63, 127]


@pytest.mark.parametrize("k", KS)
def test_string_roundtrip(k, rng):
    s = random_dna(rng, k)
    words = kops.string_to_kmer(s)
    assert words.shape == (kops.num_words(k),)
    assert kops.kmer_to_string(words, k) == s


@pytest.mark.parametrize("k", KS)
def test_reverse_complement(k, rng):
    for _ in range(5):
        s = random_dna(rng, k)
        words = jnp.asarray(kops.string_to_kmer(s))[None, :]
        rc = kops.reverse_complement(words, k)
        assert kops.kmer_to_string(np.asarray(rc[0]), k) == revcomp_str(s)


@pytest.mark.parametrize("k", [13, 31, 63])
def test_shift_left_append(k, rng):
    s = random_dna(rng, k + 1)
    w0 = jnp.asarray(kops.string_to_kmer(s[:k]))[None, :]
    base = kops.codes_from_ascii(np.frombuffer(s[-1].encode(), np.uint8))[0]
    w1 = kops.shift_left_append(w0, jnp.asarray([base]), k)
    assert kops.kmer_to_string(np.asarray(w1[0]), k) == s[1:]


@pytest.mark.parametrize("k", [13, 31, 63])
def test_shift_right_prepend(k, rng):
    s = random_dna(rng, k + 1)
    w0 = jnp.asarray(kops.string_to_kmer(s[1:]))[None, :]
    base = kops.codes_from_ascii(np.frombuffer(s[:1].encode(), np.uint8))[0]
    w1 = kops.shift_right_prepend(w0, jnp.asarray([base]), k)
    assert kops.kmer_to_string(np.asarray(w1[0]), k) == s[:k]


@pytest.mark.parametrize("k", [13, 31, 63, 127])
def test_extract_kmers_matches_bruteforce(k, rng):
    L = k + 40
    reads = [random_dna(rng, L), random_dna(rng, L - 7), random_dna(rng, k)]
    # inject an N into read 0
    reads[0] = reads[0][:5] + "N" + reads[0][6:]
    B = len(reads)
    codes = np.full((B, L), kops.BASE_N, np.uint8)
    lengths = np.zeros((B,), np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = kops.codes_from_ascii(
            np.frombuffer(r.encode(), np.uint8)
        )
        lengths[i] = len(r)

    out = kops.extract_kmers(jnp.asarray(codes), jnp.asarray(lengths), k)
    words = np.asarray(out["words"])
    valid = np.asarray(out["valid"])
    left = np.asarray(out["left"])
    right = np.asarray(out["right"])

    for b, r in enumerate(reads):
        for p in range(L - k + 1):
            sub = r[p : p + k] if p + k <= len(r) else ""
            expect_valid = len(sub) == k and "N" not in sub
            assert valid[b, p] == expect_valid, (b, p)
            if not expect_valid:
                continue
            fwd, rc = sub, revcomp_str(sub)
            canon = min(fwd, rc)
            is_rc = rc < fwd
            assert kops.kmer_to_string(words[b, p], k) == canon, (b, p)
            # flanking bases, strand-adjusted
            lf = r[p - 1] if p > 0 else "N"
            rf = r[p + k] if p + k < len(r) else "N"
            if is_rc:
                lf, rf = revcomp_str(rf), revcomp_str(lf)
            code = {"A": 0, "C": 1, "G": 2, "T": 3, "N": 4}
            assert left[b, p] == code[lf], (b, p)
            assert right[b, p] == code[rf], (b, p)


def test_sentinel_sorts_last():
    k = 31
    s = kops.sentinel(k)
    real = kops.string_to_kmer("T" * k)
    assert kops.kmer_to_int(s) > kops.kmer_to_int(real)


@pytest.mark.parametrize("k", [13, 31, 63])
def test_lex_less_matches_int(k, rng):
    a = np.stack([kops.string_to_kmer(random_dna(rng, k)) for _ in range(32)])
    b = np.stack([kops.string_to_kmer(random_dna(rng, k)) for _ in range(32)])
    got = np.asarray(kops.lex_less(jnp.asarray(a), jnp.asarray(b)))
    want = np.array(
        [kops.kmer_to_int(x) < kops.kmer_to_int(y) for x, y in zip(a, b)]
    )
    assert (got == want).all()


@pytest.mark.parametrize("k", [13, 31, 63, 127])
def test_extract_fast_matches_scan(k, rng):
    L = k + 37
    B = 6
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    codes[0, 9] = 4  # an N
    codes[2, -5:] = 4
    lengths = np.array([L, L - 3, L, k, L - 1, L], np.int32)
    import jax.numpy as jnp
    a = kops.extract_kmers(jnp.asarray(codes), jnp.asarray(lengths), k)
    b = kops.extract_kmers_scan(jnp.asarray(codes), jnp.asarray(lengths), k)
    for key in ("valid", "is_rc", "left", "right"):
        assert (np.asarray(a[key]) == np.asarray(b[key])).all(), key
    va = np.asarray(a["valid"])
    wa, wb = np.asarray(a["words"]), np.asarray(b["words"])
    assert (wa[va] == wb[va]).all()


def test_exclusive_cumsum_cols_exact():
    import jax.numpy as jnp
    from soapdenovo2_tpu.ops import sortcount as sc

    rng = np.random.default_rng(5)
    for n in (1, 7, 511, 512, 513, 5000):
        x = rng.integers(0, 200, size=(n, 3)).astype(np.int32)
        want = np.cumsum(x, axis=0) - x
        got = np.asarray(sc.exclusive_cumsum_cols(jnp.asarray(x), 255))
        np.testing.assert_array_equal(got, want)
    # full-range split path (no exact_max bound); totals must stay in
    # int32 — the same inherent bound as the reference's int counters
    x = rng.integers(0, 2**18, size=(3000, 2)).astype(np.int32)
    want = (np.cumsum(x, axis=0) - x).astype(np.int32)
    got = np.asarray(sc.exclusive_cumsum_cols(jnp.asarray(x), None))
    np.testing.assert_array_equal(got, want)


def test_reduce_sorted_groups_matches_brute_force():
    import jax.numpy as jnp
    from soapdenovo2_tpu.ops import sortcount as sc

    rng = np.random.default_rng(9)
    n, cap = 4000, 4000
    # small key space -> many duplicate groups; ~10% sentinel rows
    keys = rng.integers(0, 50, size=(n, 2)).astype(np.uint32)
    sent = rng.random(n) < 0.1
    keys[sent] = 0xFFFFFFFF
    cols = rng.integers(0, 5, size=(n, 3)).astype(np.int32)
    order = np.lexsort((keys[:, 1], keys[:, 0]))
    keys_s, cols_s = keys[order], cols[order]
    ukeys, sums, n_live = map(
        np.asarray,
        sc.reduce_sorted_groups(jnp.asarray(keys_s), jnp.asarray(cols_s),
                                cap, exact_max=4),
    )
    # brute force
    uniq = {}
    for i in range(n):
        if sent[order[i]]:
            continue
        kk = tuple(keys_s[i])
        uniq.setdefault(kk, np.zeros(3, np.int64))
        uniq[kk] += cols_s[i]
    want_keys = sorted(uniq)
    assert int(n_live) == len(want_keys)
    for j, kk in enumerate(want_keys):
        assert tuple(ukeys[j]) == kk
        np.testing.assert_array_equal(sums[j], uniq[kk])
    assert np.all(ukeys[len(want_keys):] == 0xFFFFFFFF)
    assert np.all(sums[len(want_keys):] == 0)
