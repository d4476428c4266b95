"""Multiword k-mer arithmetic on W x uint32 registers.

TPU-first replacement for the reference's 128/256-bit ``Kmer`` struct and
its shift/revcomp/compare routines (standardPregraph/kmer.c — e.g.
``KmerLeftBitMoveBy2``/``nextKmer``/``prevKmer``/``reverseComplement``) and
the 2-bit base codes of standardPregraph/inc/def.h:39-42.

Representation
--------------
A k-mer is a base-4 integer with the FIRST base most significant:

    value = b0 * 4^(k-1) + b1 * 4^(k-2) + ... + b_{k-1}

stored right-aligned in ``W = ceil(2k/32)`` uint32 words, word 0 the most
significant.  Because k is odd, ``2k < 32*W`` strictly, so the top bits of
word 0 are always zero for a real k-mer and the all-ones pattern is a safe
sentinel ("empty slot" — sorts after every real k-mer).

All functions are shape-polymorphic over leading batch dims: a k-mer array
has shape ``(..., W)`` dtype uint32.

Base codes: A=0 C=1 G=2 T=3, N/invalid=4 (``BASE_N``).  Complement is
``3 - code``, as in the reference's ``int_comp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BASE_N = 4  # invalid / N code (reference uses 4 for N after filtering)

_BASE_FROM_CHAR = np.full(256, BASE_N, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    _BASE_FROM_CHAR[ord(_c)] = _i
    _BASE_FROM_CHAR[ord(_c.lower())] = _i
_CHAR_FROM_BASE = np.array([ord(c) for c in "ACGTN"], dtype=np.uint8)


def num_words(k: int) -> int:
    """Number of uint32 words needed for a k-mer (ceil(2k/32))."""
    return -(-2 * k // 32)


def validate_k(k: int, allow_even: bool = False) -> None:
    """User-facing K must be odd (no palindromic canonical k-mers); the
    internal (k+1)-mer patch-table extraction is legitimately even —
    canonical() remains well-defined (palindrome => is_rc False)."""
    if not (13 <= k <= 128) or (k % 2 == 0 and not allow_even):
        if allow_even:
            raise ValueError(f"k must be in [13, 128], got {k}")
        raise ValueError(f"k must be odd and in [13, 127], got {k}")


def top_word_bits(k: int) -> int:
    """Number of significant bits in word 0."""
    w = num_words(k)
    return 2 * k - 32 * (w - 1)


def top_word_mask(k: int) -> int:
    return (1 << top_word_bits(k)) - 1


def sentinel(k: int):
    """The all-ones 'empty' k-mer; sorts strictly after any valid k-mer."""
    return jnp.full((num_words(k),), 0xFFFFFFFF, dtype=jnp.uint32)


def codes_from_ascii(buf: np.ndarray) -> np.ndarray:
    """Host-side: map ASCII bytes -> 2-bit base codes (4 for anything else)."""
    return _BASE_FROM_CHAR[buf]


def ascii_from_codes(codes: np.ndarray) -> np.ndarray:
    return _CHAR_FROM_BASE[np.minimum(codes, 4)]


# ---------------------------------------------------------------------------
# Multiword shifts (vectorized over leading dims)
# ---------------------------------------------------------------------------


def shift_left_append(words, base, k: int):
    """(kmer << 2 | base) & mask — the reference's ``nextKmer`` prefix step.

    ``words``: (..., W) uint32;  ``base``: (...) integer 0..3.
    """
    w = words.shape[-1]
    base = base.astype(jnp.uint32)
    if w == 1:
        out = (words[..., 0] << 2) | base
        out = out & jnp.uint32(top_word_mask(k))
        return out[..., None]
    hi = words << 2
    carry = words[..., 1:] >> 30
    hi = hi.at[..., :-1].set(hi[..., :-1] | carry)
    hi = hi.at[..., -1].set(hi[..., -1] | base)
    hi = hi.at[..., 0].set(hi[..., 0] & jnp.uint32(top_word_mask(k)))
    return hi


def shift_right_prepend(words, base, k: int):
    """(kmer >> 2) | base << (2k-2) — the reference's ``prevKmer`` step."""
    w = words.shape[-1]
    base = base.astype(jnp.uint32)
    off = top_word_bits(k) - 2  # bit offset of the leading base within word 0
    if w == 1:
        out = (words[..., 0] >> 2) | (base << off)
        return out[..., None]
    lo = words >> 2
    carry = words[..., :-1] << 30
    lo = lo.at[..., 1:].set(lo[..., 1:] | carry)
    lo = lo.at[..., 0].set(lo[..., 0] | (base << off))
    return lo


def last_base(words):
    """The final (least significant) base of the k-mer."""
    return (words[..., -1] & 3).astype(jnp.uint8)


def first_base(words, k: int):
    """The leading (most significant) base."""
    off = top_word_bits(k) - 2
    return ((words[..., 0] >> off) & 3).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Reverse complement / canonicalization
# ---------------------------------------------------------------------------

# Per-byte reversal of 4 base codes with complement:  precomputed table on
# 8-bit chunks lets us revcomp a word in 4 lookups, but a simple bit trick is
# jit-friendlier: reverse 2-bit groups within a u32 via masks, then swap words.

_M2 = jnp.uint32(0x33333333)
_M4 = jnp.uint32(0x0F0F0F0F)
_M8 = jnp.uint32(0x00FF00FF)


def _reverse_pairs_u32(x):
    """Reverse the sixteen 2-bit groups within each uint32."""
    x = ((x >> 2) & _M2) | ((x & _M2) << 2)
    x = ((x >> 4) & _M4) | ((x & _M4) << 4)
    x = ((x >> 8) & _M8) | ((x & _M8) << 8)
    x = (x >> 16) | (x << 16)
    return x


def reverse_complement(words, k: int):
    """Full reverse complement of a canonical-order k-mer register.

    Mirrors standardPregraph/kmer.c ``reverseComplement`` semantics: the
    result is the k-mer of the opposite strand read in the opposite
    direction.
    """
    w = words.shape[-1]
    comp = ~words  # complement of each 2-bit code is its bitwise NOT
    rev = _reverse_pairs_u32(comp)
    rev = rev[..., ::-1]  # swap word order (bit-reverse across the register)
    # Now the register holds the value left-aligned in 32*W bits; shift right
    # so it is right-aligned in 2k bits.
    shift = 32 * w - 2 * k
    if shift:
        out = rev >> shift
        if w > 1:
            carry = rev[..., :-1] << (32 - shift)
            out = out.at[..., 1:].set(out[..., 1:] | carry)
        rev = out
    if w > 1:
        rev = rev.at[..., 0].set(rev[..., 0] & jnp.uint32(top_word_mask(k)))
    else:
        rev = rev & jnp.uint32(top_word_mask(k))
    return rev


def lex_less(a, b):
    """Lexicographic (== numeric) a < b over the word axis."""
    w = a.shape[-1]
    lt = a[..., 0] < b[..., 0]
    eq = a[..., 0] == b[..., 0]
    for i in range(1, w):
        lt = lt | (eq & (a[..., i] < b[..., i]))
        eq = eq & (a[..., i] == b[..., i])
    return lt


def lex_eq(a, b):
    return jnp.all(a == b, axis=-1)


def canonical(fwd, rc):
    """min(fwd, rc) and a flag telling whether rc was chosen.

    The reference inserts the smaller of a k-mer and its reverse complement
    (standardPregraph/prlHashReads.c ``chopKmer4read``).
    """
    use_rc = lex_less(rc, fwd)
    out = jnp.where(use_rc[..., None], rc, fwd)
    return out, use_rc


# ---------------------------------------------------------------------------
# Hashing (for shard routing; replaces hashFunction.c's CRC32c ownership key)
# ---------------------------------------------------------------------------


def hash_words(words):
    """Mix W uint32 words to a uint32 hash (murmur3-style finalizer chain).

    Plays the role of ``hash_kmer % thrd_num`` ownership sharding
    (standardPregraph/prlHashReads.c:83) — only the distribution matters,
    not the exact function, since shard layout is internal.
    """
    h = jnp.uint32(0x9E3779B9)
    for i in range(words.shape[-1]):
        x = words[..., i]
        x = x * jnp.uint32(0xCC9E2D51)
        x = (x << 15) | (x >> 17)
        x = x * jnp.uint32(0x1B873593)
        h = h ^ x
        h = (h << 13) | (h >> 19)
        h = h * jnp.uint32(5) + jnp.uint32(0xE6546B64)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


# ---------------------------------------------------------------------------
# K-mer extraction from packed read batches
# ---------------------------------------------------------------------------


def _mw_shl(x, bits: int):
    """Multiword logical shift left by a static bit count.

    ``x`` is a LIST of W (B, L) uint32 arrays, word 0 most significant —
    structure-of-arrays so the TPU lane dimension is the read axis, not
    the (tiny) word axis.
    """
    if bits == 0:
        return x
    w = len(x)
    ws, bs = divmod(bits, 32)
    if ws:
        if ws >= w:
            return [jnp.zeros_like(v) for v in x]
        zero = jnp.zeros_like(x[0])
        x = x[ws:] + [zero] * ws
    if bs:
        out = []
        for i in range(w):
            hi = x[i] << bs
            if i + 1 < w:
                hi = hi | (x[i + 1] >> (32 - bs))
            out.append(hi)
        x = out
    return x


def _mw_or(a, b):
    return [x | y for x, y in zip(a, b)]


def _advance(x, off: int):
    """Shift a (B, L) span array along positions: out[:, i] = x[:, i + off].

    Tail positions hold garbage; callers mask with validity."""
    if off == 0:
        return x
    pad_shape = (x.shape[0], off)
    return jnp.concatenate([x[:, off:], jnp.zeros(pad_shape, x.dtype)], axis=1)


def _advance_mw(x, off: int):
    return [_advance(v, off) for v in x]


@functools.partial(jax.jit, static_argnames=("k",))
def extract_kmers(codes, lengths, k: int):
    """Chop every read into canonical k-mers with flanking-base context.

    Log-doubling formulation (TPU-friendly; no sequential scan): spans of
    2^t bases are combined by multiword shifts, so a length-L batch needs
    only ~2*log2(k) vector passes over (B, L, W) arrays instead of L
    rolling steps.  Returns the same dict as the reference rolling
    version ``extract_kmers_scan`` (kept for cross-checking).

    Args/returns: see ``extract_kmers_scan``.
    """
    validate_k(k, allow_even=True)
    B, L = codes.shape
    if L < k:
        raise ValueError(f"read buffer length {L} < k={k}")
    W = num_words(k)
    P = L - k + 1

    base = codes.astype(jnp.uint32)
    ok = codes < BASE_N
    b_safe = jnp.where(ok, base, 0)

    # span[m][w][:, i] = word w of the value of bases i..i+m-1
    zero = jnp.zeros((B, L), jnp.uint32)
    fwd_span = [zero] * (W - 1) + [b_safe]
    comp = (3 - b_safe) & 3
    rc_span = [zero] * (W - 1) + [comp]
    val_span = ok

    spans = {1: (fwd_span, rc_span, val_span)}
    m = 1
    while 2 * m <= k:
        f, r, v = spans[m]
        f2 = _mw_or(_mw_shl(f, 2 * m), _advance_mw(f, m))
        # rc(A||B) = rc(B) || rc(A):  (rc_B << 2m) | rc_A
        r2 = _mw_or(_mw_shl(_advance_mw(r, m), 2 * m), r)
        v2 = v & _advance(v, m)
        m *= 2
        spans[m] = (f2, r2, v2)

    # combine the binary decomposition of k
    powers = sorted(spans, reverse=True)
    remaining = k
    acc = None  # (fwd, rc, valid, covered)
    for p in powers:
        if p > remaining:
            continue
        f, r, v = spans[p]
        if acc is None:
            acc = (f, r, v, p)
        else:
            fa, ra, va, off = acc
            fa = _mw_or(_mw_shl(fa, 2 * p), _advance_mw(f, off))
            ra = _mw_or(_mw_shl(_advance_mw(r, off), 2 * off), ra)
            va = va & _advance(v, off)
            acc = (fa, ra, va, off + p)
        remaining -= p
    fwd, rc, val, covered = acc
    assert covered == k

    mask0 = jnp.uint32(top_word_mask(k))
    fwd = [v[:, :P] for v in fwd]
    rc = [v[:, :P] for v in rc]
    fwd[0] = fwd[0] & mask0
    rc[0] = rc[0] & mask0
    val = val[:, :P]

    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    in_read = pos + k <= lengths[:, None].astype(jnp.int32)
    valid = val & in_read

    # canonical = min(fwd, rc), computed word-wise in SoA layout
    lt = jnp.zeros((B, P), bool)
    eq = jnp.ones((B, P), bool)
    for i in range(W):
        lt = lt | (eq & (rc[i] < fwd[i]))
        eq = eq & (rc[i] == fwd[i])
    is_rc = lt
    canon = jnp.stack(
        [jnp.where(is_rc, rc[i], fwd[i]) for i in range(W)], axis=-1
    )

    left_f = jnp.concatenate(
        [jnp.full((B, 1), BASE_N, jnp.uint8), codes[:, : P - 1]], axis=1
    )
    ridx = jnp.minimum(pos + k, L - 1)
    right_f = jnp.take_along_axis(codes, ridx, axis=1)
    right_f = jnp.where(pos + k < lengths[:, None], right_f, BASE_N).astype(jnp.uint8)
    left_f = jnp.where(left_f < BASE_N, left_f, BASE_N).astype(jnp.uint8)
    right_f = jnp.where(right_f < BASE_N, right_f, BASE_N).astype(jnp.uint8)

    def comp_or_n(x):
        return jnp.where(x < BASE_N, (3 - x) & 3, BASE_N).astype(jnp.uint8)

    left = jnp.where(is_rc, comp_or_n(right_f), left_f)
    right = jnp.where(is_rc, comp_or_n(left_f), right_f)

    return {
        "words": canon,
        "valid": valid,
        "left": left,
        "right": right,
        "is_rc": is_rc,
    }


@functools.partial(jax.jit, static_argnames=("k",))
def extract_kmers_directed(codes, k: int):
    """Directed (non-canonical) k-mers at every position of each row.

    Same log-doubling combiner as ``extract_kmers`` but forward strand
    only and with validity derived purely from base codes (pad reads with
    ``BASE_N``; no lengths argument).  Used by the batched gap-fill local
    assembler, where walk direction matters (localAsm.c builds its mini
    de Bruijn graph from directed read k-mers plus their reverse
    complements as separate entries).

    Args:
      codes: (..., L) uint8 base codes.
      k: odd k in [13, 127].
    Returns:
      words: (..., P, W) directed k-mer registers, P = L - k + 1
      valid: (..., P) bool — all k bases are ACGT
    """
    validate_k(k, allow_even=True)
    lead = codes.shape[:-1]
    L = codes.shape[-1]
    if L < k:
        raise ValueError(f"read buffer length {L} < k={k}")
    W = num_words(k)
    P = L - k + 1
    flat = codes.reshape((-1, L))
    B = flat.shape[0]

    base = flat.astype(jnp.uint32)
    ok = flat < BASE_N
    b_safe = jnp.where(ok, base, 0)

    zero = jnp.zeros((B, L), jnp.uint32)
    spans = {1: ([zero] * (W - 1) + [b_safe], ok)}
    m = 1
    while 2 * m <= k:
        f, v = spans[m]
        f2 = _mw_or(_mw_shl(f, 2 * m), _advance_mw(f, m))
        v2 = v & _advance(v, m)
        m *= 2
        spans[m] = (f2, v2)

    remaining = k
    acc = None
    for p in sorted(spans, reverse=True):
        if p > remaining:
            continue
        f, v = spans[p]
        if acc is None:
            acc = (f, v, p)
        else:
            fa, va, off = acc
            fa = _mw_or(_mw_shl(fa, 2 * p), _advance_mw(f, off))
            va = va & _advance(v, off)
            acc = (fa, va, off + p)
        remaining -= p
    fwd, val, covered = acc
    assert covered == k

    mask0 = jnp.uint32(top_word_mask(k))
    fwd = [v[:, :P] for v in fwd]
    fwd[0] = fwd[0] & mask0
    words = jnp.stack(fwd, axis=-1)
    valid = val[:, :P]
    return (
        words.reshape(lead + (P, W)),
        valid.reshape(lead + (P,)),
    )


@functools.partial(jax.jit, static_argnames=("k",))
def extract_kmers_scan(codes, lengths, k: int):
    """Chop every read into canonical k-mers with flanking-base context.

    TPU-native version of ``chopKmer4read`` (prlHashReads.c:163): a rolling
    update along the read axis keeps the forward and reverse-complement
    registers live, emitting one canonical k-mer per position.

    Args:
      codes:   (B, L) uint8 base codes (0..3, BASE_N for invalid).
      lengths: (B,)   int32 read lengths.
      k:       odd k in [13, 127].

    Returns a dict of arrays, all with leading shape (B, P) where
    ``P = L - k + 1`` positions:
      words:  (B, P, W) canonical k-mer registers
      valid:  (B, P) bool — all k bases valid and within the read
      left:   (B, P) uint8 — the base preceding the k-mer on the canonical
              strand (BASE_N if none/invalid), strand-adjusted like the
              reference's bal swap in ``put_kmerset`` calls
      right:  (B, P) uint8 — the base following the k-mer, strand-adjusted
      is_rc:  (B, P) bool — canonical form is the reverse complement
    """
    validate_k(k, allow_even=True)
    B, L = codes.shape
    if L < k:
        raise ValueError(f"read buffer length {L} < k={k}")
    W = num_words(k)
    P = L - k + 1

    codes_u32 = codes.astype(jnp.uint32)
    valid_base = codes < BASE_N

    def step(carry, x):
        fwd, rc, run = carry
        base, ok = x  # (B,) uint32, (B,) bool
        b = jnp.where(ok, base, 0)
        fwd = shift_left_append(fwd, b, k)
        rc = shift_right_prepend(rc, (3 - b) & 3, k)
        run = jnp.where(ok, run + 1, 0)
        return (fwd, rc, run), (fwd, rc, run)

    # derive the zero-init from the input so the carry has the same
    # device-varying type as xs under shard_map (scan-vma rule)
    zrow = codes_u32[:, :1] & jnp.uint32(0)
    init = (
        jnp.zeros((B, W), jnp.uint32) + zrow,
        jnp.zeros((B, W), jnp.uint32) + zrow,
        jnp.zeros((B,), jnp.int32) + zrow[:, 0].astype(jnp.int32),
    )
    xs = (codes_u32.T, valid_base.T)  # scan over L
    _, (fwd_seq, rc_seq, run_seq) = jax.lax.scan(step, init, xs)
    # position p's k-mer completes at base index p + k - 1
    fwd = jnp.moveaxis(fwd_seq[k - 1 :], 0, 1)  # (B, P, W)
    rc = jnp.moveaxis(rc_seq[k - 1 :], 0, 1)
    run = jnp.moveaxis(run_seq[k - 1 :], 0, 1)  # (B, P)

    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    in_read = pos + k <= lengths[:, None].astype(jnp.int32)
    valid = (run >= k) & in_read

    canon, is_rc = canonical(fwd, rc)

    # Flanking bases on the forward strand.
    left_f = jnp.concatenate(
        [jnp.full((B, 1), BASE_N, jnp.uint8), codes[:, : P - 1]], axis=1
    )
    # right flank base index = p + k  (guard the gather, then mask)
    ridx = jnp.minimum(pos + k, L - 1)
    right_f = jnp.take_along_axis(codes, ridx, axis=1)
    right_f = jnp.where(pos + k < lengths[:, None], right_f, BASE_N).astype(jnp.uint8)
    left_f = jnp.where(left_f < BASE_N, left_f, BASE_N).astype(jnp.uint8)
    right_f = jnp.where(right_f < BASE_N, right_f, BASE_N).astype(jnp.uint8)

    # Strand adjustment: if canonical is the rc, (left, right) of the node are
    # (comp(right_f), comp(left_f)) — mirrors the bal branch of chopKmer4read.
    def comp_or_n(x):
        return jnp.where(x < BASE_N, (3 - x) & 3, BASE_N).astype(jnp.uint8)

    left = jnp.where(is_rc, comp_or_n(right_f), left_f)
    right = jnp.where(is_rc, comp_or_n(left_f), right_f)

    return {
        "words": canon,
        "valid": valid,
        "left": left,
        "right": right,
        "is_rc": is_rc,
    }


# ---------------------------------------------------------------------------
# Host-side helpers for tests / IO
# ---------------------------------------------------------------------------


def kmer_to_int(words) -> int:
    """Python-int value of a single k-mer register (tests / debugging)."""
    words = np.asarray(words, dtype=np.uint64)
    v = 0
    for w in words:
        v = (v << 32) | int(w)
    return v


def int_to_kmer(value: int, k: int) -> np.ndarray:
    w = num_words(k)
    out = np.zeros((w,), dtype=np.uint32)
    for i in range(w - 1, -1, -1):
        out[i] = value & 0xFFFFFFFF
        value >>= 32
    return out


def kmer_to_string(words, k: int) -> str:
    v = kmer_to_int(words)
    return "".join("ACGT"[(v >> (2 * (k - 1 - i))) & 3] for i in range(k))


def string_to_kmer(s: str) -> np.ndarray:
    k = len(s)
    v = 0
    for c in s:
        v = (v << 2) | int(_BASE_FROM_CHAR[ord(c)])
    return int_to_kmer(v, k)


# -- packed host->device read transfer ---------------------------------------
# The remote-device tunnel moves ~20 MB/s (and degrades much further
# under load): shipping read batches as one uint8 PER BASE makes every
# full-stream pass pay a 150 MB upload at 5 Mb scale.  Pack 4 bases/byte
# on the host and unpack on device; interior N bases (rare) travel as a
# fixed-capacity exception list.

N_EXC_CAP = 512  # per-batch interior-N capacity; overflow -> unpacked path


def pack_codes_host(codes: np.ndarray, lengths: np.ndarray):
    """(B, L) uint8 codes -> ((B, ceil(L/4)) packed, n_rows, n_cols) or
    None when the batch has more than N_EXC_CAP interior Ns."""
    B, L = codes.shape
    inside = np.arange(L)[None, :] < lengths[:, None]
    rows, cols = np.nonzero((codes >= BASE_N) & inside)
    if rows.size > N_EXC_CAP:
        return None
    lp = (L + 3) & ~3
    tmp = np.zeros((B, lp), np.uint8)
    np.minimum(codes, 3, out=tmp[:, :L])
    q = tmp.reshape(B, lp // 4, 4)
    packed = (
        (q[:, :, 0] << 6) | (q[:, :, 1] << 4) | (q[:, :, 2] << 2)
        | q[:, :, 3]
    ).astype(np.uint8)
    n_rows = np.full((N_EXC_CAP,), B, np.int32)  # B = drop sentinel
    n_cols = np.zeros((N_EXC_CAP,), np.int32)
    n_rows[: rows.size] = rows
    n_cols[: cols.size] = cols
    return packed, n_rows, n_cols


def unpack_codes(packed, lengths, L: int, n_rows, n_cols):
    """Device-side inverse of pack_codes_host (call under jit)."""
    B = packed.shape[0]
    b = packed
    quads = jnp.stack(
        [(b >> 6) & 3, (b >> 4) & 3, (b >> 2) & 3, b & 3], axis=-1
    ).reshape(B, -1)[:, :L]
    pos = jnp.arange(L, dtype=jnp.int32)
    codes = jnp.where(pos[None, :] < lengths[:, None], quads,
                      jnp.uint8(BASE_N)).astype(jnp.uint8)
    codes = codes.at[n_rows, n_cols].set(jnp.uint8(BASE_N), mode="drop")
    return codes
