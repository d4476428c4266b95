"""Banded edit-distance kernel vs brute-force Levenshtein."""

import numpy as np
import pytest

from soapdenovo2_tpu.ops import align


def brute_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j - 1] + (a[i - 1] != b[j - 1]),
                prev[j] + 1,
                cur[j - 1] + 1,
            )
        prev = cur
    return prev[lb]


def _codes(s: str) -> np.ndarray:
    return np.array([{"A": 0, "C": 1, "G": 2, "T": 3}[c] for c in s], np.uint8)


def test_banded_matches_bruteforce(rng):
    L = 96
    pairs = []
    for _ in range(40):
        a = "".join("ACGT"[i] for i in rng.integers(0, 4, size=rng.integers(30, L)))
        # b = a with a few edits (stays within the band)
        b = list(a)
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, len(b)))
            op = rng.integers(0, 3)
            if op == 0:
                b[p] = "ACGT"[int(rng.integers(0, 4))]
            elif op == 1 and len(b) > 10:
                del b[p]
            else:
                b.insert(p, "ACGT"[int(rng.integers(0, 4))])
        pairs.append((a, "".join(b)))
    n = len(pairs)
    a_arr = np.zeros((n, L + 8), np.uint8)
    b_arr = np.zeros((n, L + 8), np.uint8)
    a_len = np.zeros((n,), np.int32)
    b_len = np.zeros((n,), np.int32)
    for i, (a, b) in enumerate(pairs):
        a_arr[i, : len(a)] = _codes(a)
        b_arr[i, : len(b)] = _codes(b)
        a_len[i], b_len[i] = len(a), len(b)
    got = align.banded_edit_distance(a_arr, b_arr, a_len, b_len)
    for i, (a, b) in enumerate(pairs):
        want = brute_lev(a, b)
        if want <= align.B_RADIUS:  # inside the band: exact
            assert got[i] == want, (i, got[i], want)
        else:
            assert got[i] >= want


def test_band_overflow_returns_inf():
    a = "A" * 50
    b = "C" * 90  # length difference 40 > band
    got = align.banded_edit_distance(
        _codes(a)[None, :], _codes(b)[None, :],
        np.array([50], np.int32), np.array([90], np.int32),
    )
    assert got[0] >= align.INF


def test_identical_zero():
    s = "ACGTACGTACGTACGT" * 4
    c = _codes(s)[None, :]
    got = align.banded_edit_distance(
        c, c, np.array([len(s)], np.int32), np.array([len(s)], np.int32)
    )
    assert got[0] == 0


def test_banded_numpy_matches_kernel_and_bruteforce(rng):
    """_banded_numpy (the large-shape CPU fallback) == interpret kernel
    == brute force within the band, including length-skew and empty-a
    edge cases."""
    from soapdenovo2_tpu.ops.align import _banded_numpy, B_RADIUS, INF

    L = 80
    pairs = []
    for _ in range(30):
        a = "".join("ACGT"[i] for i in rng.integers(0, 4, size=rng.integers(0, L)))
        b = list(a)
        for _ in range(int(rng.integers(0, 24))):  # some exceed the band
            p = int(rng.integers(0, max(len(b), 1))) if b else 0
            op = rng.integers(0, 3)
            if op == 0 and b:
                b[p] = "ACGT"[int(rng.integers(0, 4))]
            elif op == 1 and len(b) > 1:
                del b[p]
            else:
                b.insert(p, "ACGT"[int(rng.integers(0, 4))])
        pairs.append((a, "".join(b)))
    pairs.append(("", "ACGT"))
    pairs.append(("ACGT", ""))
    n = len(pairs)
    Lp = max(max(len(a), len(b)) for a, b in pairs) + 4
    a_arr = np.zeros((n, Lp), np.uint8)
    b_arr = np.zeros((n, Lp), np.uint8)
    a_len = np.zeros((n,), np.int32)
    b_len = np.zeros((n,), np.int32)
    for i, (a, b) in enumerate(pairs):
        a_arr[i, : len(a)] = _codes(a)
        b_arr[i, : len(b)] = _codes(b)
        a_len[i], b_len[i] = len(a), len(b)
    got_np = _banded_numpy(a_arr, b_arr, a_len, b_len)
    got_k = align.banded_edit_distance(a_arr, b_arr, a_len, b_len)
    assert (got_np == got_k).all(), (got_np, got_k)
    for i, (a, b) in enumerate(pairs):
        want = brute_lev(a, b)
        if want <= B_RADIUS:
            assert got_np[i] == want, (i, got_np[i], want)
        else:
            assert got_np[i] >= want
