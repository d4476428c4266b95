"""Read ingestion: FASTA/FASTQ(.gz) streaming into fixed-shape code batches.

Replaces the reference's readseq1by1.c (FASTA ``readseq1by1:50``, FASTQ
``readseqfq:279``, library iteration ``openFileInLib:736`` /
``read1seqInLib:1037``) and the AIO double-buffering of prlHashReads.c —
on the TPU side the equivalent of "overlap disk with hashing" is the host
producing padded uint8 code batches that are device_put while the previous
batch computes.

Key reference semantics preserved:
  * reads are clipped to the library's ``rd_len_cutoff`` (readseq1by1.c)
  * ``reverse_seq=1`` libraries (mate pairs) are reverse-complemented on
    input
  * paired files are interleaved so a pair occupies consecutive read ids
    (2i, 2i+1) — the scaffolder pairs consecutive odd/even ids
    (attachPEinfo.c:384 ``connectByPE_grad``)
  * per-library read-id boundaries are recorded for ``*.peGrads``
    (prlHashReads.c:690-699)
"""

from __future__ import annotations

import dataclasses
import gzip
import io
import os
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import AssemblyConfig, LibInfo
from ..ops import kmer as kops

_COMP = bytes.maketrans(b"ACGTacgtN", b"TGCAtgcaN")


def _revcomp_bytes(seq: bytes) -> bytes:
    return seq.translate(_COMP)[::-1]


def open_maybe_gz(path: str) -> io.BufferedReader:
    if path.endswith(".gz"):
        return gzip.open(path, "rb")  # type: ignore[return-value]
    return open(path, "rb")


def iter_fastx(path: str) -> Iterator[bytes]:
    """Yield raw sequence bytes from a FASTA or FASTQ file (auto-detected
    by the first record character, like readseq1by1.c's format dispatch)."""
    with open_maybe_gz(path) as fh:
        if hasattr(fh, "peek"):
            first = fh.peek(1)[:1]
            if not first:
                return
            yield from _iter_fastx_lines(fh, first, None)
        else:
            line = fh.readline()
            if not line:
                return
            yield from _iter_fastx_lines(fh, line[:1], line)


def _iter_fastx_lines(fh, first: bytes, pushback) -> Iterator[bytes]:
    if first == b">":
        # FASTA (possibly multi-line)
        seq_parts: List[bytes] = []
        lines: Iterable[bytes] = fh if pushback is None else _chain(pushback, fh)
        for line in lines:
            line = line.rstrip()
            if not line:
                continue
            if line.startswith(b">"):
                if seq_parts:
                    yield b"".join(seq_parts)
                    seq_parts = []
            else:
                seq_parts.append(line)
        if seq_parts:
            yield b"".join(seq_parts)
    elif first == b"@":
        # FASTQ: 4-line records
        lines = fh if pushback is None else _chain(pushback, fh)
        it = iter(lines)
        while True:
            try:
                hdr = next(it)
            except StopIteration:
                return
            if not hdr.strip():
                continue
            try:
                seq = next(it).rstrip()
                _plus = next(it)
                _qual = next(it)
            except StopIteration:
                return
            yield seq
    else:
        raise ValueError(f"unrecognized read file format (first byte {first!r})")


def _chain(first_line, fh):
    yield first_line
    yield from fh


def iter_pairs(path1: str, path2: str) -> Iterator[bytes]:
    """Interleave two paired files: a, b, a, b, ... (consecutive ids)."""
    it1, it2 = iter_fastx(path1), iter_fastx(path2)
    while True:
        try:
            r1 = next(it1)
        except StopIteration:
            return
        try:
            r2 = next(it2)
        except StopIteration:
            return
        yield r1
        yield r2


def iter_lib_reads(
    lib: LibInfo, paired_only: bool = False
) -> Iterator[bytes]:
    """All reads of one library in id order: paired files first (interleaved),
    then interleaved 'p' files, then singles — mirroring openFileInLib's
    file-class order.  Applies rd_len_cutoff clipping and reverse_seq."""
    def fix(seq: bytes) -> bytes:
        if lib.rd_len_cutoff and len(seq) > lib.rd_len_cutoff:
            seq = seq[: lib.rd_len_cutoff]
        if lib.reverse_seq:
            seq = _revcomp_bytes(seq)
        return seq

    for p1, p2 in lib.paired_files():
        for seq in iter_pairs(p1, p2):
            yield fix(seq)
    for p in lib.interleaved_files():
        for seq in iter_fastx(p):
            yield fix(seq)
    for p in lib.bam_files():
        from .bam import iter_bam_reads

        for seq in iter_bam_reads(p):
            yield fix(seq)
    if not paired_only:
        for p in lib.single_files():
            for seq in iter_fastx(p):
                yield fix(seq)


@dataclasses.dataclass
class ReadBatch:
    """A fixed-shape batch of 2-bit-coded reads (host numpy)."""

    codes: np.ndarray  # (B, L) uint8; BASE_N padded
    lengths: np.ndarray  # (B,) int32
    start_id: int  # global id of row 0
    n: int  # live rows (<= B)

    def trimmed(self, lo: int = 256) -> "ReadBatch":
        """Slice a partially filled batch down to the next power-of-two
        row bucket >= n — partial batches (small libraries, stream tails)
        would otherwise pay full-batch compute; the pow2 bucket keeps the
        set of compiled shapes small."""
        b = self.codes.shape[0]
        rows = max(lo, 1 << max(self.n - 1, 1).bit_length())
        if rows >= b:
            return self
        return ReadBatch(
            codes=self.codes[:rows], lengths=self.lengths[:rows],
            start_id=self.start_id, n=self.n,
        )


def encode_read(seq: bytes, out: np.ndarray) -> int:
    """Encode ASCII bytes into a code row; returns length (clipped)."""
    L = min(len(seq), out.shape[0])
    arr = np.frombuffer(seq, np.uint8, count=L)
    out[:L] = kops.codes_from_ascii(arr)
    out[L:] = kops.BASE_N
    return L


def batch_reads(
    read_iter: Iterator[bytes],
    batch_size: int,
    max_len: int,
    start_id: int = 0,
) -> Iterator[ReadBatch]:
    """Pack a read stream into (B, L) code batches.  B is forced even so
    pairs never straddle a batch boundary (reference forces maxReadNum even,
    prlRead2Ctg.c:816)."""
    if batch_size % 2:
        batch_size += 1
    codes = np.full((batch_size, max_len), kops.BASE_N, np.uint8)
    lengths = np.zeros((batch_size,), np.int32)
    fill = 0
    gid = start_id
    for seq in read_iter:
        lengths[fill] = encode_read(seq, codes[fill])
        fill += 1
        if fill == batch_size:
            yield ReadBatch(codes.copy(), lengths.copy(), gid, fill)
            gid += fill
            fill = 0
            codes[:] = kops.BASE_N
            lengths[:] = 0
    if fill:
        lengths[fill:] = 0
        yield ReadBatch(codes.copy(), lengths.copy(), gid, fill)


@dataclasses.dataclass
class PeGrad:
    """One insert-size gradation (reference PE_INFO, def.h:348-354)."""

    insert_size: int
    end_read_id: int  # last read id + 1 belonging to this grad
    rank: int
    pair_num_cutoff: int


def count_lib_reads(lib: LibInfo, paired_only: bool = False) -> int:
    return sum(1 for _ in iter_lib_reads(lib, paired_only=paired_only))
