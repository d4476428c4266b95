"""Stage file protocol: reference-compatible checkpoint files.

The reference's stages communicate exclusively through ``prefix.*`` files
(SURVEY.md section 5 — the load-bearing checkpoint/resume mechanism).  We
keep the same filenames and text formats so stages are restartable and so
golden-file comparisons against reference binaries are possible:

  *.kmerFreq       255 lines of counts            (prlHashReads.c freqStat:1104)
  *.vertex         branch k-mers, 8 per line      (output_pregraph.c:31)
  *.preGraphBasic  VERTEX/EDGEs/MaxReadLen lines  (output_pregraph.c:83)
  *.edge.gz        ">length L,<kmer>,<kmer>,cvg C, B" + bases
                                                  (output_pregraph.c:88)
  *.preArc         "from to1 w1 to2 w2 ..." lines (prlRead2path.c output_arcs:427)
  *.markOnEdge     one count per edge             (prlRead2path.c:443)
  *.peGrads        lib gradation table            (prlHashReads.c:690)
  *.contig         FASTA of contigs               (output_contig.c:147)
  *.ContigIndex    per-contig length/cvg table    (output_contig.c)
  *.updated.edge   per-contig edge records        (output_contig.c output_updated_edges:333)
  *.Arc            contig arcs "from to1 w1 ..."  (output_contig.c output_heavyArcs:398)
  *.newContigIndex contigs re-sorted by length    (loadGraph.c loadUpdatedEdges:269)
  *.scaf_gap       scaffolds with gap contigs     (orderContig.c scaffolding:4591)

Directed contig ids in *.Arc are 1-based ``2*(cid-1)+dir+1`` where dir 0 is
the emitted orientation of contig ``cid`` and dir 1 its reverse complement
(the reference instead numbers twin edges adjacently via bal_edge; same
information, fixed encoding).
"""

from __future__ import annotations

import dataclasses
import gzip
import struct
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..ops import kmer as kops

# -- gap encoding -----------------------------------------------------------
# Scaffold gaps are PE-estimated and may be (moderately) negative
# (attach1PE allows down to -ins/10); those stay approximate and render as
# >=1 N.  Exact junctions created by arc-route gap placement (arc-adjacent
# contigs share a full k-base junction; see scaffold.py fill_gaps_by_arc)
# are encoded below the sentinel so the two can never collide.
SPLICE_BASE = -(1 << 20)


def splice_gap(overlap: int) -> int:
    """Encode an exact junction overlap as a gap value."""
    return SPLICE_BASE - int(overlap)


def is_splice(g: int) -> bool:
    return int(g) <= SPLICE_BASE


def splice_overlap(g: int) -> int:
    return SPLICE_BASE - int(g)


def gap_span(g: int) -> int:
    """Bases a gap contributes to scaffold coordinates: >=1 N for an open
    or estimated gap, a negative exact overlap for a spliced junction."""
    g = int(g)
    if is_splice(g):
        return -splice_overlap(g)
    return max(g, 1)


def write_kmer_freq(prefix: str, freq: np.ndarray) -> None:
    with open(prefix + ".kmerFreq", "w") as fh:
        for i in range(255):
            fh.write(f"{int(freq[i]) if i < len(freq) else 0}\n")


def write_pre_graph_basic(
    prefix: str, n_vertex: int, k: int, n_edge: int,
    max_read_len: int, min_read_len: int = 0, max_name_len: int = 256,
) -> None:
    with open(prefix + ".preGraphBasic", "w") as fh:
        fh.write(f"VERTEX {n_vertex} K {k}\n")
        fh.write(f"\nEDGEs {n_edge}\n")
        fh.write(
            f"\nMaxReadLen {max_read_len} MinReadLen {min_read_len} "
            f"MaxNameLen {max_name_len}\n"
        )


def read_pre_graph_basic(prefix: str) -> dict:
    out = {}
    with open(prefix + ".preGraphBasic") as fh:
        for line in fh:
            t = line.split()
            if not t:
                continue
            if t[0] == "VERTEX":
                out["n_vertex"] = int(t[1])
                out["k"] = int(t[3])
            elif t[0] == "EDGEs":
                out["n_edge"] = int(t[1])
            elif t[0] == "MaxReadLen":
                out["max_read_len"] = int(t[1])
                out["min_read_len"] = int(t[3])
    return out


def write_vertex(prefix: str, kmers: np.ndarray, k: int) -> int:
    """kmers: (N, W) canonical branch k-mers.

    Vectorized: the per-kmer ``kmer_to_string`` loop cost ~30 s over the
    E-scale branch sets (50 Mb checkpoint); one numpy shift/gather
    renders the whole file body at once."""
    n, w = kmers.shape[0], kmers.shape[1] if kmers.ndim == 2 else 1
    with open(prefix + ".vertex", "wb") as fh:
        if n:
            km = np.asarray(kmers, np.uint32).reshape(n, w)
            # words are big-endian (word 0 most significant); the k-mer
            # occupies the low 2k bits of the 32w-bit register
            shifts = (np.arange(15, -1, -1, dtype=np.uint32) * 2)
            codes = ((km[:, :, None] >> shifts[None, None, :]) & 3)
            codes = codes.astype(np.uint8).reshape(n, 16 * w)[:, 16 * w - k:]
            letters = np.frombuffer(b"ACGT", np.uint8)[codes]  # (n, k)
            out = np.empty((n, k + 1), np.uint8)
            out[:, :k] = letters
            out[:, k] = ord(" ")
            out[7::8, k] = ord("\n")
            fh.write(out.tobytes())
        fh.write(b"\n")
    return n


def write_edges(
    prefix: str,
    k: int,
    records: Iterable[Tuple[int, str, int, int]],
) -> int:
    """Write *.edge.gz.

    records: (length, full_seq, cvg, bal) per undirected edge, where
    ``full_seq`` is the complete base string (k + length bases), length the
    appended-base count, bal 1 if a distinct twin exists else 0.
    """
    n = 0
    # compresslevel 2: our own checkpoint (level 9 default cost ~2.5x
    # the wall-clock for ~15% size on the 50 Mb edge set); the gzip
    # container stays reference-readable at any level
    with gzip.open(prefix + ".edge.gz", "wt", compresslevel=2) as fh:
        for length, seq, cvg, bal in records:
            from_k = seq[:k]
            to_k = seq[-k:]
            fh.write(f">length {length},{from_k},{to_k},cvg {cvg}, {bal}\n")
            body = seq[k:]
            for i in range(0, len(body), 100):
                fh.write(body[i : i + 100] + "\n")
            if not body:
                fh.write("\n")
            n += 1
    return n


def read_edges(prefix: str, k: int) -> List[Tuple[int, str, int, int]]:
    records = []
    with gzip.open(prefix + ".edge.gz", "rt") as fh:
        header = None
        seq_parts: List[str] = []
        for line in fh:
            line = line.strip()
            if line.startswith(">"):
                if header is not None:
                    records.append(_finish_edge(header, seq_parts, k))
                header = line
                seq_parts = []
            elif line:
                seq_parts.append(line)
        if header is not None:
            records.append(_finish_edge(header, seq_parts, k))
    return records


def _finish_edge(header: str, seq_parts: List[str], k: int):
    # >length L,<from>,<to>,cvg C, B
    body = header[1:]
    fields = body.split(",")
    length = int(fields[0].split()[1])
    from_k = fields[1].strip()
    cvg = int(fields[3].split()[1])
    bal = int(fields[4].strip())
    seq = from_k + "".join(seq_parts)
    return (length, seq, cvg, bal)


def write_pre_arcs(prefix: str, keys: np.ndarray, mult: np.ndarray) -> None:
    """keys: (N,2) [from,to] sorted; mult: (N,). One line per from-edge."""
    with open(prefix + ".preArc", "w") as fh:
        froms = np.asarray(keys[:, 0]).tolist()
        tos = np.asarray(keys[:, 1]).tolist()
        ms = np.asarray(mult).tolist()
        parts: List[str] = []
        prev = None
        for f, t, m in zip(froms, tos, ms):
            if f != prev:
                if prev is not None:
                    parts.append("\n")
                parts.append(str(f))
                prev = f
            parts.append(f" {t} {m}")
        if prev is not None:
            parts.append("\n")
        fh.write("".join(parts))


def read_pre_arcs(prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    rows = []
    with open(prefix + ".preArc") as fh:
        for line in fh:
            t = line.split()
            if not t:
                continue
            f = int(t[0])
            for j in range(1, len(t), 2):
                rows.append((f, int(t[j]), int(t[j + 1])))
    if not rows:
        return np.zeros((0, 2), np.int64), np.zeros((0,), np.int64)
    arr = np.array(rows, np.int64)
    return arr[:, :2], arr[:, 2]


def write_mark_on_edge(prefix: str, marker: np.ndarray) -> None:
    with open(prefix + ".markOnEdge", "w") as fh:
        if len(marker):
            fh.write("\n".join(map(str, np.asarray(marker).tolist())))
            fh.write("\n")


def write_pe_grads(
    prefix: str, grads: Sequence, max_read_len: int,
    n_reads: Optional[int] = None,
) -> None:
    """grads: PeGrad list sorted by insert size (prlHashReads.c:690-699).
    Header carries (grad count, total reads, max read len) — the reference
    loader sscanf's all three (loadPEgrads, attachPEinfo.c:95); rows add a
    4th pair_num_cutoff field the reference also accepts (:107)."""
    if n_reads is None:
        n_reads = int(grads[-1].end_read_id) if grads else 0
    with open(prefix + ".peGrads", "w") as fh:
        fh.write(f"grads&num: {len(grads)}\t{n_reads}\t{max_read_len}\n")
        for g in grads:
            fh.write(
                f"{g.insert_size}\t{g.end_read_id}\t{g.rank}\t{g.pair_num_cutoff}\n"
            )


def read_pe_grads(prefix: str):
    from .reads import PeGrad

    grads = []
    with open(prefix + ".peGrads") as fh:
        head = fh.readline().split()
        # our header: (n, n_reads, max_len).  The reference writes only
        # (n, n_solexa) — a 2-number header whose second value is a read
        # COUNT, not a length; lengths are bounded (<=2048) so a large
        # second value means reference format with no max_len recorded.
        if len(head) > 3:
            max_read_len = int(head[3])
        elif len(head) > 2:
            v = int(head[2])
            max_read_len = v if v <= 2048 else 0
        else:
            max_read_len = int(head[1]) if len(head) > 1 else 0
        for line in fh:
            t = line.split()
            if len(t) >= 3:
                grads.append(
                    PeGrad(int(t[0]), int(t[1]), int(t[2]),
                           int(t[3]) if len(t) > 3 else 3)
                )
    return grads, max_read_len


def write_contigs(
    prefix: str, contigs: Iterable[Tuple[int, str, float]], suffix: str = ".contig"
) -> int:
    """FASTA-ish contig file: '>id length X cvg_Y' header then sequence
    (output_contig.c:147 writes '>%d length %d cvg_%.1f_tip_%d')."""
    n = 0
    with open(prefix + suffix, "w") as fh:
        for cid, seq, cvg in contigs:
            fh.write(f">{cid} length {len(seq)} cvg_{cvg:.1f}_tip_0\n")
            for i in range(0, len(seq), 100):
                fh.write(seq[i : i + 100] + "\n")
            n += 1
    return n


# -- reference directed-id space --------------------------------------------
# On disk, contigs live in the reference's DIRECTED id space
# (output_contig.c:292 *.ContigIndex / :333 *.updated.edge): ids 1..D where
# a non-palindromic contig occupies two adjacent slots (rep first, twin
# second) and a palindrome one slot.  In memory we use 0-based directed ids
# 2*t + orient.  dir_to_ref_ids/RefIdMap convert between the two.


_RC_TRANS = bytes.maketrans(b"ACGTN", b"TGCAN")


def is_palindrome(seq: str) -> bool:
    """True when a contig equals its own reverse complement (bal_edge=0
    in the reference: the twin shares the directed file slot)."""
    b = seq.encode()
    return b == b.translate(_RC_TRANS)[::-1]


def dir_to_ref_ids(pal: Sequence[bool]) -> np.ndarray:
    """(2N,) array: our directed id 2t+o -> 1-based reference directed id.
    ``pal[t]`` marks palindromic contigs (twin == self, one file slot)."""
    n = len(pal)
    out = np.zeros((2 * n,), np.int64)
    fid = 1
    for t in range(n):
        out[2 * t] = fid
        if pal[t]:
            out[2 * t + 1] = fid
            fid += 1
        else:
            out[2 * t + 1] = fid + 1
            fid += 2
    return out


@dataclasses.dataclass
class RefIdMap:
    """Both directions of the directed-id translation plus per-slot
    lengths, built from *.ContigIndex."""

    dir2ref: np.ndarray  # (2N,) int64, 1-based ref ids
    ref2dir: np.ndarray  # (D+1,) int64, our 0-based directed ids
    lengths: np.ndarray  # (N,) int64 full sequence lengths
    n_contigs: int


def write_contig_index(prefix: str, lengths: Sequence[int],
                       pal: Sequence[bool], n_long: int = 0) -> None:
    """*.ContigIndex in the reference format (output_contig.c:292):
    ``Edge_num <directed-count> <output-count>`` + column header, then one
    line per undirected contig ``<directed-id>\\t<length>\\t<rc>`` where rc=1
    reserves the next directed id for the twin (basicContigInfo,
    prlRead2Ctg.c:727 reconstructs the directed array from this)."""
    d2r = dir_to_ref_ids(pal)
    num_directed = int(d2r[-1]) if len(d2r) else 0
    with open(prefix + ".ContigIndex", "w") as fh:
        fh.write(f"Edge_num {num_directed} {n_long or len(lengths)}\n")
        fh.write("index\tlength\treverseComplement\n")
        for t, ln in enumerate(lengths):
            fh.write(f"{int(d2r[2 * t])}\t{int(ln)}\t{0 if pal[t] else 1}\n")


def read_contig_index(prefix: str) -> RefIdMap:
    """Parse *.ContigIndex (either the reference format or the legacy
    ``cid len cvg`` one) into a RefIdMap."""
    rows: List[Tuple[int, int, int]] = []  # (ref_id, length, rc)
    legacy = False
    with open(prefix + ".ContigIndex") as fh:
        for line in fh:
            t = line.split()
            if not t or not t[0].lstrip("-").isdigit():
                continue  # headers
            if len(t) >= 3 and t[2].lstrip("-").replace(".", "").isdigit():
                if "." in t[2]:
                    legacy = True  # third column is a cvg float
                    rows.append((int(t[0]), int(t[1]), 1))
                else:
                    rows.append((int(t[0]), int(t[1]), int(t[2])))
            elif len(t) >= 2:
                legacy = True
                rows.append((int(t[0]), int(t[1]), 1))
    n = len(rows)
    dir2ref = np.zeros((2 * n,), np.int64)
    lengths = np.zeros((n,), np.int64)
    if legacy:
        # legacy ids were sequential per undirected contig: synthesize the
        # directed numbering assuming all non-palindromic
        fid = 1
        for t, (_cid, ln, _rc) in enumerate(rows):
            dir2ref[2 * t] = fid
            dir2ref[2 * t + 1] = fid + 1
            lengths[t] = ln
            fid += 2
    else:
        for t, (ref_id, ln, rc) in enumerate(rows):
            dir2ref[2 * t] = ref_id
            dir2ref[2 * t + 1] = ref_id + 1 if rc != 0 else ref_id
            lengths[t] = ln
    num_d = int(dir2ref.max()) if n else 0
    ref2dir = np.zeros((num_d + 1,), np.int64)
    for t in range(n):
        ref2dir[dir2ref[2 * t]] = 2 * t
        ref2dir[dir2ref[2 * t + 1]] = 2 * t + 1
        if dir2ref[2 * t] == dir2ref[2 * t + 1]:
            ref2dir[dir2ref[2 * t]] = 2 * t
    return RefIdMap(dir2ref=dir2ref, ref2dir=ref2dir, lengths=lengths,
                    n_contigs=n)


def write_updated_edges(
    prefix: str, records: Iterable[Tuple[int, int, float]]
) -> None:
    """*.updated.edge (output_updated_edges, output_contig.c:333): one
    line per DIRECTED contig ``>length L,flag,cvg10`` — flag 1 for the rep
    of a twin pair (twin on the next line with -1), 0 for a palindrome;
    cvg is stored x10 (loadUpdatedEdges divides by 10, loadGraph.c:391).

    ``records``: (length, pal, cvg) per undirected contig in file order."""
    recs = list(records)
    n_dir = sum(1 if p else 2 for _, p, _ in recs)
    with open(prefix + ".updated.edge", "w") as fh:
        fh.write(f"EDGEs {n_dir}\n")
        for length, pal, cvg in recs:
            c10 = int(round(cvg * 10))
            if pal:
                fh.write(f">length {length},0,{c10},\n")
            else:
                fh.write(f">length {length},1,{c10},\n")
                fh.write(f">length {length},-1,{c10},\n")


def read_contig_cvg(prefix: str, n: int) -> Optional[np.ndarray]:
    """Per-undirected-contig coverage from *.updated.edge (the x10 field;
    loadGraph.c:391 ``cvg / 10``)."""
    try:
        cvg = np.zeros((n,), np.float64)
        t = 0
        with open(prefix + ".updated.edge") as fh:
            for line in fh:
                if not line.startswith(">length"):
                    continue
                fields = line[len(">length "):].split(",")
                if len(fields) >= 4 and "." in fields[3]:
                    # legacy (pre-r3) format: L,cid,bal,cvg — one line per
                    # undirected contig, cvg a plain float
                    if t < n:
                        cvg[t] = float(fields[3])
                    t += 1
                    continue
                flag = int(fields[1])
                if flag == -1:
                    continue  # twin line
                if t < n:
                    cvg[t] = float(fields[2]) / 10.0
                t += 1
        return cvg
    except (FileNotFoundError, IndexError, ValueError):
        return None


def write_heavy_arcs(
    prefix: str, arcs: Iterable[Tuple[int, List[Tuple[int, int]]]],
    dir2ref: Optional[np.ndarray] = None,
) -> None:
    """*.Arc (output_heavyArcs, output_contig.c:398): one line per directed
    contig with out-arcs: ``from to1 w1 to2 w2 ...``.  With ``dir2ref`` the
    ids on disk are 1-based REFERENCE directed ids; otherwise our 0-based
    directed ids + 1."""
    with open(prefix + ".Arc", "w") as fh:
        for dfrom, outs in arcs:
            if not outs:
                continue
            if dir2ref is not None:
                fh.write(str(int(dir2ref[dfrom])))
                for dto, w in sorted(outs):
                    fh.write(f" {int(dir2ref[dto])} {w}")
            else:
                fh.write(str(dfrom + 1))
                for dto, w in sorted(outs):
                    fh.write(f" {dto + 1} {w}")
            fh.write("\n")


def read_heavy_arcs(prefix: str,
                    ref2dir: Optional[np.ndarray] = None) -> dict:
    """*.Arc -> {directed_from: [(directed_to, weight), ...]} in our
    0-based directed ids (ids translated through ``ref2dir`` when given;
    loadArcs loadGraph.c:541 analog)."""

    def conv(i: int) -> int:
        if ref2dir is not None and 0 < i < len(ref2dir):
            return int(ref2dir[i])
        return i - 1

    arcs: dict = {}
    try:
        with open(prefix + ".Arc") as fh:
            for line in fh:
                t = line.split()
                if len(t) < 3:
                    continue
                dfrom = conv(int(t[0]))
                outs = arcs.setdefault(dfrom, [])
                for i in range(1, len(t) - 1, 2):
                    outs.append((conv(int(t[i])), int(t[i + 1])))
    except FileNotFoundError:
        pass
    return arcs


def write_new_contig_index(prefix: str, ctg_len, cvg=None) -> None:
    """*.newContigIndex (loadUpdatedEdges, loadGraph.c:269): contigs
    re-indexed by decreasing length — ``newID oldID length cvg``."""
    n = len(ctg_len) // 2
    order = sorted(range(n), key=lambda t: (-int(ctg_len[2 * t]), t))
    with open(prefix + ".newContigIndex", "w") as fh:
        for new_id, t in enumerate(order, 1):
            c = 0.0 if cvg is None else float(cvg[t])
            fh.write(f"{new_id}\t{t + 1}\t{int(ctg_len[2 * t])}\t{c:.1f}\n")


def read_scaf_gap(prefix: str):
    """Rebuild scaffold structures from *.scaf_gap — the seam that lets
    ``scaff -S`` resume at gap filling only (scaffold.c:161-164: with -S
    the reference skips PE2Links/Links2Scaf/scaffolding and goes straight
    to prlReadsCloseGap on the saved layout).

    Returns a list of Scaffold objects (directed contig ids + gaps)."""
    from ..models.scaffold import Scaffold

    scaffolds = []
    ctgs: list = []
    rows: list = []  # (acc, length)

    def commit():
        if not ctgs:
            return
        gaps = []
        for j in range(len(ctgs) - 1):
            acc, ln = rows[j]
            nxt_acc, _ = rows[j + 1]
            d = int(nxt_acc - (acc + ln))
            # negative coordinate delta = exact spliced junction
            # (gap_span inverse); deltas >= 1 are open gap estimates
            gaps.append(splice_gap(-d) if d < 0 else d)
        scaffolds.append(Scaffold(list(ctgs), gaps))

    with open(prefix + ".scaf_gap") as fh:
        for line in fh:
            if line.startswith(">"):
                commit()
                ctgs, rows = [], []
                continue
            t = line.split()
            if len(t) < 4:
                continue
            cid = int(t[0]) - 1
            acc = int(t[1])
            orient = t[2]
            ln = int(t[3])
            ctgs.append(2 * cid + (1 if orient == "-" else 0))
            rows.append((acc, ln))
    commit()
    return scaffolds


def write_scaf_gap(prefix: str, scaffolds, ctg_len, arc_fills) -> None:
    """*.scaf_gap (scaffolding, orderContig.c:4591): like *.scaf but gap
    contigs placed by arc routes are marked with a trailing GAP flag."""
    filled = {}  # (scaffold idx, contig position) -> placed by arc route
    for si, j0, path in arc_fills:
        for off in range(len(path)):
            filled[(si, j0 + 1 + off)] = True
    with open(prefix + ".scaf_gap", "w") as fh:
        for si, sc in enumerate(scaffolds):
            total = sum(int(ctg_len[c]) for c in sc.ctgs) + sum(
                gap_span(g) for g in sc.gaps
            )
            fh.write(f">scaffold{si + 1} {len(sc.ctgs)} {total}\n")
            acc = 0
            for j, c in enumerate(sc.ctgs):
                orient = "-" if (c & 1) else "+"
                tag = "\tGAP" if filled.get((si, j)) else ""
                fh.write(
                    f"{(c >> 1) + 1}\t{acc}\t{orient}\t{int(ctg_len[c])}{tag}\n"
                )
                acc += int(ctg_len[c])
                if j < len(sc.gaps):
                    # gap_span: >=1 for open/estimated gaps, negative
                    # exact overlap for spliced junctions (raw splice
                    # encodings must never leak into coordinates)
                    acc += gap_span(sc.gaps[j])


def read_contigs(path: str) -> List[Tuple[int, str]]:
    out = []
    cid = None
    parts: List[str] = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith(">"):
                if cid is not None:
                    out.append((cid, "".join(parts)))
                cid = int(line[1:].split()[0])
                parts = []
            elif line:
                parts.append(line)
    if cid is not None:
        out.append((cid, "".join(parts)))
    return out


def pack_tight(codes: np.ndarray) -> bytes:
    """2-bit pack base codes 4/byte, first base in the high bits
    (writeChar2tightString, seq.c:81); emits len//4+1 bytes like the
    reference (always one slack byte)."""
    n = len(codes)
    padded = np.zeros(((n // 4 + 1) * 4,), np.uint8)
    padded[:n] = np.minimum(codes, 3)
    quads = padded.reshape(-1, 4)
    packed = (quads[:, 0] << 6) | (quads[:, 1] << 4) | (quads[:, 2] << 2) \
        | quads[:, 3]
    return packed.astype(np.uint8).tobytes()


def unpack_tight(buf: bytes, n: int) -> np.ndarray:
    """Inverse of pack_tight (getCharInTightString, seq.c:122)."""
    b = np.frombuffer(buf, np.uint8)
    out = np.empty((len(b) * 4,), np.uint8)
    out[0::4] = (b >> 6) & 3
    out[1::4] = (b >> 4) & 3
    out[2::4] = (b >> 2) & 3
    out[3::4] = b & 3
    return out[:n]


def write_read_on_contig(
    prefix: str, read_id: np.ndarray, ctg: np.ndarray, pos: np.ndarray,
    dir2ref: Optional[np.ndarray] = None, compat: bool = False,
) -> None:
    """*.readOnContig.gz (recordAlldgn, prlRead2Ctg.c:666): header then
    ``read<TAB>contig<TAB>pos<TAB>orien`` with 1-based read ids and
    1-based REFERENCE directed contig ids; orien is '-' when the id is
    the twin slot (parse1read:350-358)."""
    opener = (open(prefix + ".readOnContig", "wt") if compat
              else gzip.open(prefix + ".readOnContig.gz", "wt"))
    with opener as fh:
        fh.write("read\tcontig\tpos\n")
        for r, c, p in zip(read_id, ctg, pos):
            c = int(c)
            if dir2ref is not None:
                rc = int(dir2ref[c])
                orien = "-" if (c & 1) and dir2ref[c ^ 1] != rc else "+"
            else:
                rc = c + 1
                orien = "-" if c & 1 else "+"
            fh.write(f"{int(r) + 1}\t{rc}\t{int(p)}\t{orien}\n")


def read_read_on_contig(
    prefix: str, compat: bool = False,
    ref2dir: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reads both the reference 4-column format (ids translated through
    ``ref2dir`` when given) and the legacy 3-column one.  compat=True is
    the -z COMPATIBLE_MODE (scaffold.c:206-209): the uncompressed
    v1.05-style *.readOnContig instead of *.readOnContig.gz."""
    rows = []
    if compat:
        opener = open(prefix + ".readOnContig", "rt")
    else:
        opener = gzip.open(prefix + ".readOnContig.gz", "rt")
    with opener as fh:
        header = fh.readline()
        for line in fh:
            t = line.split()
            if len(t) >= 4:
                # reference format: 1-based read ids, ref directed ctg ids
                c = int(t[1])
                if ref2dir is not None and c < len(ref2dir):
                    c = int(ref2dir[c])
                    if t[3] == "-":
                        # twin slot already encoded in the id; ref2dir
                        # resolves it — nothing more to do
                        pass
                else:
                    c = c - 1
                rows.append((int(t[0]) - 1, c, int(t[2])))
            elif len(t) == 3:
                rows.append((int(t[0]), int(t[1]) - 1, int(t[2])))
    if not rows:
        return (np.zeros((0,), np.int64),) * 3  # type: ignore[return-value]
    arr = np.array(rows, np.int64)
    return arr[:, 0], arr[:, 1].astype(np.int32), arr[:, 2].astype(np.int32)


def _write_gap_records(fh_write, gap_reads, dir2ref, long_pool: bool):
    """Binary gap-read records (output1read_gz, prlRead2Ctg.c:427):
    int32 len, int32 ctgID, int32 pos, len//4+1 tight-packed bytes.
    For PE pool entries pos = mate_pos + ins - len (getReadIngap:589);
    long-pool entries store their own placement verbatim."""
    n = 0
    for i in range(len(gap_reads)):
        codes = np.frombuffer(gap_reads.seqs[i], np.uint8)
        ln = len(codes)
        c = int(gap_reads.anchor_ctg[i])
        ref = int(dir2ref[c]) if dir2ref is not None else c + 1
        if long_pool:
            pos = int(gap_reads.anchor_pos[i])
        else:
            pos = int(gap_reads.anchor_pos[i]
                      + gap_reads.insert_size[i] - ln)
        fh_write(struct.pack("<iii", ln, ref, pos))
        fh_write(pack_tight(codes))
        n += 1
    return n


def write_read_in_gap(prefix: str, gap_reads,
                      dir2ref: Optional[np.ndarray] = None,
                      compat: bool = False) -> None:
    """*.readInGap.gz — binary gap-read pool in the reference format
    (loadReads4gap/getRead1by1_gz parse it back, prlReadFillGap.c:107).
    compat=True writes the uncompressed v1.05 *.readInGap."""
    if compat:
        with open(prefix + ".readInGap", "wb") as fh:
            _write_gap_records(fh.write, gap_reads, dir2ref, False)
    else:
        with gzip.open(prefix + ".readInGap.gz", "wb") as fh:
            _write_gap_records(fh.write, gap_reads, dir2ref, False)


def write_long_read_in_gap(prefix: str, long_reads,
                           dir2ref: Optional[np.ndarray] = None) -> None:
    """*.longReadInGap — same record layout, uncompressed (recordLongRead
    via output1read, prlRead2Ctg.c:456; read back at
    prlReadFillGap.c:224)."""
    if not len(long_reads):
        return
    with open(prefix + ".longReadInGap", "wb") as fh:
        _write_gap_records(fh.write, long_reads, dir2ref, True)


def _read_gap_records(read_fn, pool, ref2dir) -> int:
    n = 0
    while True:
        head = read_fn(12)
        if len(head) < 12:
            break
        ln, ref, pos = struct.unpack("<iii", head)
        nbytes = ln // 4 + 1
        buf = read_fn(nbytes)
        if len(buf) < nbytes:
            break
        codes = unpack_tight(buf, ln)
        if ref2dir is not None and 0 < ref < len(ref2dir):
            c = int(ref2dir[ref])
        else:
            c = ref - 1
        pool.anchor_ctg.append(c)
        # records carry the EXPECTED read start (pos = mate + ins - len,
        # getReadIngap:589).  Re-anchor as (pos - 2*len, ins = 3*len) so
        # gap-pool windowing [anchor + max(ins-3rl,0), anchor + ins + rl]
        # spans [pos - 2rl, pos + 2rl] — the same reach as the in-memory
        # pool's [mate + ins - 3rl, mate + ins + rl]; the write formula
        # anchor + ins - len = pos keeps the round-trip stable
        pool.anchor_pos.append(pos - 2 * ln)
        pool.insert_size.append(3 * ln)
        pool.seqs.append(codes.tobytes())
        n += 1
    return n


def read_read_in_gap(prefix: str, compat: bool = False,
                     ref2dir: Optional[np.ndarray] = None):
    """Load the binary *.readInGap[.gz] + *.longReadInGap pools
    (prlReadFillGap.c loadReads4gap:206).  compat=True (-z) reads the
    uncompressed v1.05 *.readInGap."""
    from ..models.mapping import GapReads

    pool = GapReads.empty()
    try:
        if compat:
            fh_cm = open(prefix + ".readInGap", "rb")
        else:
            fh_cm = gzip.open(prefix + ".readInGap.gz", "rb")
        with fh_cm as fh:
            _read_gap_records(fh.read, pool, ref2dir)
    except FileNotFoundError:
        pass
    try:
        with open(prefix + ".longReadInGap", "rb") as fh:
            _read_gap_records(fh.read, pool, ref2dir)
    except FileNotFoundError:
        pass
    return pool


def write_short_read_in_gap(prefix: str, gap_reads,
                            dir2ref: Optional[np.ndarray] = None) -> None:
    """*.shortreadInGap.gz (-f; output1read_gz outfp2, prlRead2Ctg.c:445):
    text ``>len<TAB>ctg<TAB>pos<TAB>orien<TAB>ins<TAB>dhflag`` + bases, for
    reads with insert <2000 — consumed by the external SRkgf tool."""
    with gzip.open(prefix + ".shortreadInGap.gz", "wt") as fh:
        for i in range(len(gap_reads)):
            ins = int(gap_reads.insert_size[i])
            codes = np.frombuffer(gap_reads.seqs[i], np.uint8)
            ln = len(codes)
            if ins >= 2000 or ln == 0:
                continue
            c = int(gap_reads.anchor_ctg[i])
            ref = int(dir2ref[c]) if dir2ref is not None else c + 1
            pos = int(gap_reads.anchor_pos[i] + ins - ln)
            # gap read aligns opposite to its mapped mate
            mate_orien = "-" if c & 1 else "+"
            orien = "+" if mate_orien == "-" else "-"
            dh = gap_reads.dh[i] if i < len(gap_reads.dh) else 0
            seq = kops.ascii_from_codes(codes).tobytes().decode()
            fh.write(f">{ln}\t{ref}\t{pos}\t{orien}\t{ins}\t{dh}\n{seq}\n")


def write_pe_read_on_contig_open(prefix: str):
    """Open *.PEreadOnContig.gz (-f; getPEreadOnContig,
    prlRead2Ctg.c:499) and return (append_pair, close): binary records of
    both mates of fully-mapped pairs with insert <2000."""
    fh = gzip.open(prefix + ".PEreadOnContig.gz", "wb")

    def append_pair(len1, ctg1, pos1, orien1, ins, codes1,
                    len2, ctg2, pos2, orien2, codes2):
        if ins >= 2000:
            return
        fh.write(struct.pack("<iii", len1, ctg1, pos1))
        fh.write(orien1.encode())
        fh.write(struct.pack("<i", ins))
        fh.write(pack_tight(codes1))
        fh.write(struct.pack("<iii", len2, ctg2, pos2))
        fh.write(orien2.encode())
        fh.write(struct.pack("<i", ins))
        fh.write(pack_tight(codes2))

    return append_pair, fh.close


def write_scaf(prefix: str, scaffolds, ctg_len) -> None:
    """*.scaf: per scaffold, the ordered contigs with orientation and
    cumulative start position (orderContig.c scaffolding:4591 format-ish)."""
    with open(prefix + ".scaf", "w") as fh:
        for si, sc in enumerate(scaffolds):
            total = sum(int(ctg_len[c]) for c in sc.ctgs) + sum(
                gap_span(g) for g in sc.gaps
            )
            fh.write(f">scaffold{si + 1} {len(sc.ctgs)} {total}\n")
            acc = 0
            for j, c in enumerate(sc.ctgs):
                orient = "-" if (c & 1) else "+"
                fh.write(f"{(c >> 1) + 1}\t{acc}\t{orient}\t{int(ctg_len[c])}\n")
                acc += int(ctg_len[c])
                if j < len(sc.gaps):
                    acc += gap_span(sc.gaps[j])


def write_scaf_seq(prefix: str, seqs, name: str = "scaffold",
                   names: Optional[List[str]] = None) -> None:
    """*.scafSeq.  Multi-contig scaffolds are named ``scaffoldN`` and
    singleton contigs ``C<id>`` like the reference (orderContig.c:4883,
    prlReadFillGap.c:1679) — ScafStat keys its Singleton_Num count off the
    leading 'C'."""
    if names is None:
        names = [f"{name}{i + 1} {len(s)}" for i, s in enumerate(seqs)]
    write_fasta_generic(prefix + ".scafSeq", zip(names, seqs))


def scaf_seq_names(scaffolds, seqs, cvg=None) -> List[str]:
    """Reference-style record names for write_scaf_seq: running
    ``scaffoldN <cvg>`` for chains of >=2 contigs, ``C<id> <cvg>`` for
    singletons (orderContig.c:4883 / prlReadFillGap.c:866,1679)."""
    out = []
    count = 0
    for si, sc in enumerate(scaffolds):
        ln = len(seqs[si]) if si < len(seqs) else 0
        if len(sc.ctgs) <= 1:
            c = int(sc.ctgs[0]) if len(sc.ctgs) else 0
            cv = float(cvg[c >> 1]) if cvg is not None else 0.0
            out.append("C%d %4.1f" % ((c >> 1) + 1, cv))
        else:
            count += 1
            if cvg is not None:
                num = sum(float(cvg[c >> 1]) * 1.0 for c in sc.ctgs)
                den = max(len(sc.ctgs), 1)
                cv = num / den
            else:
                cv = 0.0
            out.append("scaffold%d %4.1f" % (count, cv))
        del ln
    return out


def _scafstat_section(fh, title: str, path: str, label: str,
                      cut_off_len: int, known_genome_size: int,
                      with_singletons: bool) -> None:
    """One section of *.scafStatistics (ScafStat, orderContig.c:3429):
    per-record ACGTN accounting with the <cutoff drop rule, the size
    ladder, nucleotide/GC table, and the banded N10..N90 ladder (each Nxx
    printed only when the cumulative sum first lands inside its decade
    band, N50 re-derived if skipped — reference quirk preserved)."""
    sizes: List[int] = []
    counts: List[List[int]] = []  # per-record [A,C,G,T,N,non]
    singleton = 0
    cur = None
    # byte -> tally lane (A/C/G/T/N/other), vectorized per line — a
    # per-character Python loop costs seconds per scaff run at Mb scale
    lane = np.full(256, 5, np.uint8)
    for i, chars in enumerate(["Aa", "Cc", "Gg", "Tt", "Nn"]):
        for ch in chars:
            lane[ord(ch)] = i
    try:
        fhin = open(path)
    except FileNotFoundError:
        fhin = None
    if fhin is not None:
        with fhin:
            for line in fhin:
                if line.startswith(">"):
                    if cur is not None and sum(cur) >= cut_off_len:
                        sizes.append(sum(cur))
                        counts.append(cur)
                    elif cur is not None and with_singletons and cur_single:
                        singleton -= 1
                    cur = [0, 0, 0, 0, 0, 0]
                    cur_single = line[1:2] == "C"
                    if with_singletons and cur_single:
                        singleton += 1
                    continue
                if cur is None:
                    cur = [0, 0, 0, 0, 0, 0]
                    cur_single = False
                buf = np.frombuffer(line.strip().encode(), np.uint8)
                if buf.size:
                    tally = np.bincount(lane[buf], minlength=6)
                    for j in range(6):
                        cur[j] += int(tally[j])
            if cur is not None and sum(cur) >= cut_off_len:
                sizes.append(sum(cur))
                counts.append(cur)
            elif cur is not None and with_singletons and cur_single:
                singleton -= 1
    fh.write("<-- Information for assembly %s '%s'.(cut_off_length < "
             "100bp) -->\n\n" % (title, label))
    n = len(sizes)
    if n == 0:
        fh.write("%s_Num\t0\n\n" % title)
        return
    tot = [sum(c[j] for c in counts) for j in range(6)]
    size_inc_n = sum(sizes)
    sizes_sorted = sorted(sizes)
    fh.write("Size_includeN\t%d\n" % size_inc_n)
    fh.write("Size_withoutN\t%d\n" % (size_inc_n - tot[4]))
    fh.write("%s_Num\t%d\n" % (title, n))
    fh.write("Mean_Size\t%d\n" % (size_inc_n // n))
    fh.write("Median_Size\t%d\n" % sizes_sorted[(n + 1) // 2 - 1])
    fh.write("Longest_Seq\t%d\n" % sizes_sorted[-1])
    fh.write("Shortest_Seq\t%d\n" % sizes_sorted[0])
    if with_singletons:
        fh.write("Singleton_Num\t%d\n" % singleton)
        fh.write("Average_length_of_break(N)_in_scaffold\t%d\n"
                 % (tot[4] // n))
    fh.write("\n")
    if with_singletons:
        if known_genome_size:
            fh.write("Known_genome_size\t%d\n" % known_genome_size)
            fh.write("Total_scaffold_length_as_percentage_of_known_genome_"
                     "size\t%.2f%%\n" % (100.0 * size_inc_n /
                                         known_genome_size))
        else:
            fh.write("Known_genome_size\tNaN\n")
            fh.write("Total_scaffold_length_as_percentage_of_known_genome_"
                     "size\tNaN\n")
        fh.write("\n")
    ladder = ((100, "100 "), (500, "500 "), (1000, "1K  "),
              (10000, "10K "), (100000, "100K"), (1000000, "1M  "))
    word = "scaffolds" if with_singletons else title
    for cut, lab in ladder:
        cnt = sum(1 for s in sizes if s > cut)
        fh.write("%s>%s\t%d\t%.2f%%\n" % (word, lab, cnt, 100.0 * cnt / n))
    fh.write("\n")
    for j, nm in ((0, "Nucleotide_A"), (1, "Nucleotide_C"),
                  (2, "Nucleotide_G"), (3, "Nucleotide_T"),
                  (4, "GapContent_N"), (5, "Non_ACGTN")):
        fh.write("%s\t%d\t%.2f%%\n" % (nm, tot[j],
                                       100.0 * tot[j] / size_inc_n))
    acgt = tot[0] + tot[1] + tot[2] + tot[3]
    fh.write("GC_Content\t%.2f%%\t\t(G+C)/(A+C+G+T)\n"
             % (100.0 * (tot[1] + tot[2]) / max(acgt, 1)))
    fh.write("\n")
    # banded N10..N90 ladder: walk sizes descending; Nxx prints only if the
    # cumulative sum FIRST lands inside [x/100, (x+1)/10) of the total
    # (orderContig.c:3679-3725 skips bands jumped over; N90 is open-ended)
    flags = [False] * 10
    n50 = 0
    n50_known = 0
    num_n50_known = 0
    flag_known = False
    acc = 0
    for i in range(n - 1, -1, -1):
        acc += sizes_sorted[i]
        placed = None
        for d in range(1, 9):
            if (acc >= size_inc_n * d / 10.0
                    and acc < size_inc_n * (d + 1) / 10.0
                    and not flags[d]):
                placed = d
                break
        if placed is None and acc >= size_inc_n * 0.9 and not flags[9]:
            placed = 9
        if placed is not None:
            flags[placed] = True
            fh.write("N%d0\t%d\t%d\n" % (placed, sizes_sorted[i], n - i))
            if placed == 5:
                n50 = sizes_sorted[i]
        if (known_genome_size and acc >= known_genome_size * 0.5
                and not flag_known):
            n50_known = sizes_sorted[i]
            num_n50_known = n - i
            flag_known = True
    if not flags[5]:
        acc = 0
        for i in range(n - 1, -1, -1):
            acc += sizes_sorted[i]
            if acc >= size_inc_n * 0.5:
                fh.write("N50\t%d\t%d\n" % (sizes_sorted[i], n - i))
                n50 = sizes_sorted[i]
                break
    fh.write("\n")
    if known_genome_size:
        fh.write("NG50\t%d\t%d\n" % (n50_known, num_n50_known))
        fh.write("N50_%s-NG50_%s_length_difference\t%d\n"
                 % (title.lower(), title.lower(), abs(n50 - n50_known)))
    else:
        fh.write("NG50\tNaN\tNaN\n")
        fh.write("N50_%s-NG50_%s_length_difference\tNaN\n"
                 % (title.lower(), title.lower()))
    fh.write("\n")


def write_scaf_statistics(prefix: str, known_genome_size: int = 0) -> None:
    """*.scafStatistics: full ScafStat (orderContig.c:3429) — reads the
    just-written *.scafSeq and *.contig back like the reference, drops
    records <100 bp, and reports sizes/GC/ladder/N10-N90/NG50 for both the
    scaffold and contig sections."""
    with open(prefix + ".scafStatistics", "w") as fh:
        _scafstat_section(fh, "Scaffold", prefix + ".scafSeq",
                          prefix + ".scafSeq", 100, known_genome_size,
                          with_singletons=True)
        _scafstat_section(fh, "Contig", prefix + ".contig",
                          prefix + ".contig", 100, known_genome_size,
                          with_singletons=False)


def write_fasta_generic(path: str, records: Iterable[Tuple[str, str]]) -> None:
    with open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), 100):
                fh.write(seq[i : i + 100] + "\n")


def write_links(prefix: str, grads_links) -> None:
    """*.links: per gradation, weighted contig links with gap estimates
    (attachPEinfo.c writes these after connectByPE_grad)."""
    with open(prefix + ".links", "w") as fh:
        for gi, links in enumerate(grads_links):
            fh.write(f"#grad {gi}\n")
            for i in range(links.c1.shape[0]):
                fh.write(
                    f"{int(links.c1[i]) + 1}\t{int(links.c2[i]) + 1}\t"
                    f"{int(links.weight[i])}\t{int(links.gap[i])}\n"
                )


def read_links(prefix: str):
    """Read *.links back: list (per gradation) of (c1, c2, weight, gap)
    int arrays with 0-based directed contig ids (inverse of write_links)."""
    grads = []
    cur: List[Tuple[int, int, int, int]] = []
    started = False
    with open(prefix + ".links") as fh:
        for line in fh:
            if line.startswith("#grad"):
                if started:
                    grads.append(cur)
                    cur = []
                started = True
                continue
            t = line.split()
            if len(t) >= 4:
                cur.append((int(t[0]) - 1, int(t[1]) - 1,
                            int(t[2]), int(t[3])))
    if started:
        grads.append(cur)
    out = []
    for cur in grads:
        arr = np.array(cur, np.int64).reshape((-1, 4))
        out.append((arr[:, 0].astype(np.int32), arr[:, 1].astype(np.int32),
                    arr[:, 2].astype(np.int32), arr[:, 3].astype(np.int32)))
    return out


def write_contig_pos_in_scaff(prefix: str, scaffolds, ctg_len) -> None:
    """*.contigPosInscaff — contig placements per scaffold
    (prlReadFillGap.c output)."""
    with open(prefix + ".contigPosInscaff", "w") as fh:
        for si, sc in enumerate(scaffolds):
            fh.write(f">scaffold{si + 1}\n")
            acc = 0
            for j, c in enumerate(sc.ctgs):
                orient = "-" if (c & 1) else "+"
                fh.write(f"{(c >> 1) + 1}\t{acc}\t{orient}\n")
                acc += int(ctg_len[c])
                if j < len(sc.gaps):
                    acc += gap_span(sc.gaps[j])


def write_arc_gvz(prefix: str, graph) -> None:
    """*.arcGVZ — GraphViz dump of the contig/edge graph (-V; arc.c:81)."""
    with open(prefix + ".arcGVZ", "w") as fh:
        fh.write("digraph G{\n\tsize=\"512,512\";\n")
        for e in range(graph.n_edges):
            if graph.deleted[e]:
                continue
            for t, m in graph.live_arcs(e):
                fh.write(f"\tC{e + 1}_{len(graph.seqs[e])} -> "
                         f"C{t + 1}_{len(graph.seqs[t])} [label = {m}];\n")
        fh.write("}\n")


def write_cnt_gvz(prefix: str, grads_links) -> None:
    """*.cntGVZ — GraphViz dump of the PE connection graph (-V;
    connect.c:73)."""
    with open(prefix + ".cntGVZ", "w") as fh:
        fh.write("digraph G{\n\tsize=\"512,512\";\n")
        for links in grads_links:
            for i in range(links.c1.shape[0]):
                fh.write(
                    f"\tC{int(links.c1[i]) + 1} -> C{int(links.c2[i]) + 1}"
                    f" [label = {int(links.weight[i])}];\n"
                )
        fh.write("}\n")


def write_read_on_scaf(prefix: str, read_id, ctg, pos, scaffolds, ctg_len) -> None:
    """*.readOnScaf — read locations lifted to scaffold coordinates
    (read2scaf.c locateReadOnScaf:286)."""
    # contig -> (scaffold, offset, flipped)
    place = {}
    for si, sc in enumerate(scaffolds):
        acc = 0
        for j, c in enumerate(sc.ctgs):
            place[int(c)] = (si, acc, False)
            place[int(c) ^ 1] = (si, acc, True)
            acc += int(ctg_len[c])
            if j < len(sc.gaps):
                acc += gap_span(sc.gaps[j])
    with open(prefix + ".readOnScaf", "w") as fh:
        fh.write("read\tscaffold\tpos\n")
        for r, c, p in zip(read_id, ctg, pos):
            info = place.get(int(c))
            if info is None:
                continue
            si, off, flipped = info
            if flipped:
                coord = off + int(ctg_len[int(c)]) - int(p)
            else:
                coord = off + int(p)
            fh.write(f"{int(r)}\t{si + 1}\t{coord}\n")


def read_fasta(path: str) -> List[Tuple[str, str]]:
    out: List[Tuple[str, str]] = []
    name = None
    parts: List[str] = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith(">"):
                if name is not None:
                    out.append((name, "".join(parts)))
                name = line[1:]
                parts = []
            elif line:
                parts.append(line)
    if name is not None:
        out.append((name, "".join(parts)))
    return out


def write_amos_asm(prefix: str, scaffolds, seqs, contig_seqs, ctg_len) -> None:
    """*.asm + *.contig4asm — AMOS/Hawkeye visualization dump
    (prlReadFillGap.c:1745-1752, outputScafSeq:826 fo3/foc2 writers).

    Per scaffold: an {AFG} read stub per placed contig, one {CCO} contig
    message whose consensus is the scaffold sequence (qlt all 'D' like
    the reference) with an {MPS} tiling entry per placed contig
    (positions swapped for reverse placements), and a trailing {SCF}
    record per scaffold (prlReadFillGap.c:1928).  *.contig4asm holds the
    placed pieces as FASTA in placement orientation.  Gap-consensus
    pieces (``<gapNum>-0`` lowercase records) are not emitted — gap
    sequence already appears in the consensus."""
    def wrap(s, w=60):
        return "\n".join(s[i : i + w] for i in range(0, len(s), w))

    comp = str.maketrans("ACGTN", "TGCAN")
    with open(prefix + ".asm", "w") as fa, open(
        prefix + ".contig4asm", "w"
    ) as fc:
        for si, (sc, seq) in enumerate(zip(scaffolds, seqs)):
            pieces = []  # (name, start, end, oriented piece seq)
            acc = 0
            for j, c in enumerate(sc.ctgs):
                cid = (c >> 1) + 1
                s = contig_seqs[c >> 1]
                if c & 1:
                    s = s.translate(comp)[::-1]
                pieces.append((str(cid), acc, acc + len(s), s, bool(c & 1)))
                acc += int(ctg_len[c])
                if j < len(sc.gaps):
                    acc += gap_span(sc.gaps[j])
            for name, a, b, s, rev in pieces:
                fa.write(f"{{AFG\nacc:{name}\nclr:0,{len(s)}\n}}\n")
                fc.write(f">{name}\n{wrap(s)}\n")
            fa.write(
                f"{{CCO\nacc:{si + 1}\npla:P\nlen:{len(seq)}\ncns:\n"
                f"{wrap(seq)}\n.\nqlt:\n{wrap('D' * len(seq))}\n.\n"
                f"npc:{len(pieces)}\n"
            )
            for name, a, b, s, rev in pieces:
                p0, p1 = (b, a) if rev else (a, b)
                fa.write(
                    f"{{MPS\ntyp:R\nmid:{name}\nsrc:\n.\npos:{p0},{p1}\n"
                    "dln:0\ndel:\n}\n"
                )
            fa.write("}\n")
        for si in range(len(scaffolds)):
            fa.write(
                f"{{SCF\nacc:{si + 1}\nnoc:0\n{{CTP\nct1:{si + 1}\n"
                f"ct2:{si + 1}\nmea:0\nstd:0\nori:N\n}}\n}}\n"
            )
