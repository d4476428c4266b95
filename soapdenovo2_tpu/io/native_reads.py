"""Native-accelerated read batching (ctypes wrapper over native/fastx.cpp).

Streams FASTQ/FASTA (plain or .gz) straight into the (B, L) uint8 code
batches the device consumes, with paired files interleaved by writing
even/odd row strides — one memcpy-free pass, no per-read Python.  Falls
back to the pure-Python reader when the native library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, List, Optional

import numpy as np

from .. import native
from ..config import LibInfo
from ..ops import kmer as kops
from . import reads as rio

_CHUNK = 4 << 20


class _FileDecoder:
    """Incremental record decoder over one fastx file (plain or gzip)."""

    def __init__(self, path: str, clip: int, rc: bool, lib,
                 chunk: int = _CHUNK):
        self._lib = lib
        self.chunk = chunk
        self.fh = open(path, "rb")
        self.is_gz = path.endswith(".gz")
        self.gz_state = ctypes.c_void_p(0)
        self.raw = b""  # undecompressed gz input remainder
        self.buf = bytearray()
        self.pos = 0
        self.eof = False
        self.clip = clip
        self.rc = rc
        self.is_fasta: Optional[bool] = None

    def close(self):
        try:
            self.fh.close()
        finally:
            if self.is_gz and self.gz_state.value:
                self._lib.gz_free(self.gz_state)
                self.gz_state = ctypes.c_void_p(0)

    def _refill(self) -> bool:
        """Append more text to buf; returns False at EOF with empty gain."""
        if self.pos:
            del self.buf[: self.pos]
            self.pos = 0
        if self.eof:
            return False
        if not self.is_gz:
            chunk = self.fh.read(self.chunk)
            if not chunk:
                self.eof = True
                return False
            self.buf.extend(chunk)
            return True
        # gz: inflate up to one chunk of text
        out = np.empty(self.chunk, np.uint8)
        produced_total = 0
        while produced_total == 0:
            if not self.raw:
                self.raw = self.fh.read(self.chunk)
                if not self.raw:
                    self.eof = True
                    return False
            consumed = ctypes.c_int64(0)
            produced = self._lib.gz_inflate(
                ctypes.byref(self.gz_state),
                self.raw, len(self.raw), ctypes.byref(consumed),
                out.ctypes.data_as(ctypes.c_void_p), self.chunk,
            )
            if produced < 0:
                raise IOError(f"gzip inflate error {produced}")
            self.raw = self.raw[consumed.value :]
            produced_total = produced
            if produced == 0 and consumed.value == 0:
                # need more input
                more = self.fh.read(self.chunk)
                if not more:
                    self.eof = True
                    return False
                self.raw += more
        self.buf.extend(out[:produced_total].tobytes())
        return True

    def decode_into(self, codes: np.ndarray, row0: int, row_stride: int,
                    lengths: np.ndarray, max_reads: int, max_len: int) -> int:
        """Decode up to max_reads into strided rows; returns count."""
        done = 0
        while done < max_reads:
            if self.pos >= len(self.buf):
                if not self._refill():
                    break
            n = len(self.buf)
            if self.is_fasta is None and n:
                self.is_fasta = self.buf[self.pos : self.pos + 1] == b">"
            limit = n
            if self.is_fasta and not self.eof:
                # only parse up to the last record start so a split FASTA
                # record is never half-committed; if the buffer holds a
                # single partial record (no later '>'), grow it until the
                # next record start or EOF arrives — the C decoder would
                # otherwise commit a silently truncated record
                last = self.buf.rfind(b">", self.pos + 1)
                while last <= self.pos and not self.eof:
                    self._refill()
                    last = self.buf.rfind(b">", self.pos + 1)
                n = len(self.buf)
                limit = last if last > self.pos else n
            buf_arr = (ctypes.c_char * n).from_buffer(self.buf)
            pos = ctypes.c_int64(self.pos)
            got = self._lib.fastx_decode(
                buf_arr, limit, ctypes.byref(pos),
                codes.ctypes.data_as(ctypes.c_void_p),
                (row0 + done * row_stride) * max_len,
                row_stride,
                ctypes.cast(
                    lengths.ctypes.data + 4 * (row0 + done * row_stride),
                    ctypes.POINTER(ctypes.c_int32),
                ),
                row_stride,
                max_reads - done, max_len,
                1 if self.rc else 0, self.clip,
            )
            del buf_arr
            done += got
            advanced = pos.value != self.pos
            self.pos = pos.value
            if got == 0 and not advanced:
                if not self._refill():
                    break
        return done


def native_available() -> bool:
    return native.get_lib() is not None


def batch_reads_lib(
    libinfo: LibInfo,
    batch_size: int,
    max_len: int,
    start_id: int = 0,
    paired_only: bool = False,
) -> Iterator[rio.ReadBatch]:
    """Batched reads of one library in id order, natively decoded.

    Pairs are interleaved (file1 -> even rows, file2 -> odd rows), then
    interleaved 'p' files, then singles — same order as
    reads.iter_lib_reads.  Falls back to the Python reader without the
    native library or for BAM inputs.
    """
    nlib = native.get_lib()
    if nlib is None or libinfo.bam_files():
        yield from rio.batch_reads(
            rio.iter_lib_reads(libinfo, paired_only=paired_only),
            batch_size, max_len, start_id=start_id,
        )
        return
    if batch_size % 2:
        batch_size += 1
    clip = libinfo.rd_len_cutoff or 0
    rc = bool(libinfo.reverse_seq)
    gid = start_id

    def new_batch():
        return (
            np.full((batch_size, max_len), kops.BASE_N, np.uint8),
            np.zeros((batch_size,), np.int32),
        )

    codes, lengths = new_batch()
    fill = 0  # rows filled

    for p1, p2 in libinfo.paired_files():
        d1 = _FileDecoder(p1, clip, rc, nlib)
        d2 = _FileDecoder(p2, clip, rc, nlib)
        try:
            while True:
                half = (batch_size - fill) // 2
                n1 = d1.decode_into(codes, fill, 2, lengths, half, max_len)
                n2 = d2.decode_into(codes, fill + 1, 2, lengths, n1, max_len)
                if n2 < n1:
                    n1 = n2  # ragged pair tail: drop the unpaired read
                fill += 2 * n1
                if fill >= batch_size:
                    yield rio.ReadBatch(codes, lengths, gid, fill)
                    gid += fill
                    codes, lengths = new_batch()
                    fill = 0
                if n1 < half:
                    break
        finally:
            d1.close()
            d2.close()
    for p in libinfo.interleaved_files():
        d = _FileDecoder(p, clip, rc, nlib)
        try:
            while True:
                want = batch_size - fill
                got = d.decode_into(codes, fill, 1, lengths, want, max_len)
                fill += got
                if fill >= batch_size:
                    yield rio.ReadBatch(codes, lengths, gid, fill)
                    gid += fill
                    codes, lengths = new_batch()
                    fill = 0
                if got < want:
                    break
        finally:
            d.close()
    if not paired_only:
        for p in libinfo.single_files():
            d = _FileDecoder(p, clip, rc, nlib)
            try:
                while True:
                    want = batch_size - fill
                    got = d.decode_into(codes, fill, 1, lengths, want, max_len)
                    fill += got
                    if fill >= batch_size:
                        yield rio.ReadBatch(codes, lengths, gid, fill)
                        gid += fill
                        codes, lengths = new_batch()
                        fill = 0
                    if got < want:
                        break
            finally:
                d.close()
    if fill:
        lengths[fill:] = 0
        yield rio.ReadBatch(codes, lengths, gid, fill)
