"""Minimal pure-Python BAM reader for read ingestion.

The reference links vendored samtools (standardPregraph/inc/libbam.a) and
pulls sequences with ``read1seqbam`` (readseq1by1.c:449), skipping
records with the QC-fail flag 0x0200.  BGZF is a sequence of standard
gzip members, which Python's zlib handles; records are parsed with
struct/numpy — no external dependency.

Only what assembly input needs is extracted: the sequence (4-bit packed,
'=ACMGRSVTWYHKDBN') and the FLAG word for QC filtering.  Secondary
(0x100) and supplementary (0x800) alignments are skipped so each physical
read appears once, and reverse-strand records are flipped back to the
original read orientation (seq is stored reference-forward in BAM).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

# 4-bit nibble -> ASCII base
_NIB = b"=ACMGRSVTWYHKDBN"
_COMP = bytes.maketrans(b"ACGTN", b"TGCAN")

FLAG_REVERSE = 0x10
FLAG_QC_FAIL = 0x200  # readseq1by1.c:449 skip rule
FLAG_SECONDARY = 0x100
FLAG_SUPPLEMENTARY = 0x800


def _bgzf_stream(path: str, chunk: int = 1 << 20) -> Iterator[bytes]:
    """Decompressed byte chunks of a BGZF/gzip file."""
    with open(path, "rb") as fh:
        d = zlib.decompressobj(15 + 32)
        while True:
            raw = fh.read(chunk)
            if not raw:
                break
            data = d.decompress(raw)
            if data:
                yield data
            while d.eof and d.unused_data:
                # next gzip member (BGZF blocks are separate members)
                tail = d.unused_data
                d = zlib.decompressobj(15 + 32)
                data = d.decompress(tail)
                if data:
                    yield data


class _Buf:
    def __init__(self, stream: Iterator[bytes]):
        self.stream = stream
        self.buf = bytearray()
        self.pos = 0

    def need(self, n: int) -> bool:
        while len(self.buf) - self.pos < n:
            try:
                chunk = next(self.stream)
            except StopIteration:
                return False
            if self.pos > (1 << 20):
                del self.buf[: self.pos]
                self.pos = 0
            self.buf.extend(chunk)
        return True

    def take(self, n: int) -> bytes:
        out = bytes(self.buf[self.pos : self.pos + n])
        self.pos += n
        return out


def iter_bam_reads(path: str) -> Iterator[bytes]:
    """Yield read sequences (ASCII bytes, original orientation) from a BAM."""
    buf = _Buf(_bgzf_stream(path))
    if not buf.need(12):
        raise IOError(f"{path}: truncated BAM header")
    magic = buf.take(4)
    if magic != b"BAM\x01":
        raise IOError(f"{path}: not a BAM file (magic {magic!r})")
    (l_text,) = struct.unpack("<i", buf.take(4))
    if not buf.need(l_text + 4):
        raise IOError(f"{path}: truncated header text")
    buf.take(l_text)
    (n_ref,) = struct.unpack("<i", buf.take(4))
    for _ in range(n_ref):
        if not buf.need(4):
            raise IOError(f"{path}: truncated refs")
        (l_name,) = struct.unpack("<i", buf.take(4))
        if not buf.need(l_name + 4):
            raise IOError(f"{path}: truncated ref record")
        buf.take(l_name + 4)

    while buf.need(4):
        (block_size,) = struct.unpack("<i", buf.take(4))
        if not buf.need(block_size):
            break
        rec = buf.take(block_size)
        # fixed fields: refID pos l_read_name mapq bin n_cigar_op flag
        #               l_seq next_refID next_pos tlen
        l_read_name = rec[8]
        n_cigar = struct.unpack_from("<H", rec, 12)[0]
        flag = struct.unpack_from("<H", rec, 14)[0]
        l_seq = struct.unpack_from("<i", rec, 16)[0]
        if flag & (FLAG_QC_FAIL | FLAG_SECONDARY | FLAG_SUPPLEMENTARY):
            continue
        if l_seq <= 0:
            continue
        off = 32 + l_read_name + 4 * n_cigar
        packed = rec[off : off + (l_seq + 1) // 2]
        seq = bytearray(l_seq)
        for i in range(l_seq):
            nib = packed[i >> 1]
            seq[i] = _NIB[(nib >> 4) if i % 2 == 0 else (nib & 0xF)]
        out = bytes(seq)
        if flag & FLAG_REVERSE:
            out = out.translate(_COMP)[::-1]
        yield out


def write_minimal_bam(path: str, reads, flags=None) -> None:
    """Write an unaligned BAM (test fixture / interchange helper)."""
    import gzip

    body = bytearray()
    body += b"BAM\x01"
    text = b"@HD\tVN:1.6\n"
    body += struct.pack("<i", len(text)) + text
    body += struct.pack("<i", 0)  # n_ref
    enc = {65: 1, 67: 2, 71: 4, 84: 8}
    for i, seq in enumerate(reads):
        flag = 0 if flags is None else flags[i]
        name = f"r{i}".encode() + b"\x00"
        l_seq = len(seq)
        packed = bytearray((l_seq + 1) // 2)
        for j, c in enumerate(seq):
            nib = enc.get(c, 15)
            if j % 2 == 0:
                packed[j >> 1] |= nib << 4
            else:
                packed[j >> 1] |= nib
        rec = struct.pack(
            "<iiBBHHHiiii", -1, -1, len(name), 0, 0, 0, flag,
            l_seq, -1, -1, 0,
        ) + name + bytes(packed) + b"\xff" * l_seq
        body += struct.pack("<i", len(rec)) + rec
    with gzip.open(path, "wb") as fh:
        fh.write(bytes(body))
