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

import gzip
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..ops import kmer as kops

# -- gap encoding -----------------------------------------------------------
# Scaffold gaps are PE-estimated and may be (moderately) negative
# (attach1PE allows down to -ins/10); those stay approximate and render as
# >=1 N.  Exact junctions created by arc-route gap placement (adjacent
# contigs overlap k-1 bases in the edge graph) are encoded below the
# sentinel so the two can never collide.
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
    """kmers: (N, W) canonical branch k-mers."""
    n = kmers.shape[0]
    with open(prefix + ".vertex", "w") as fh:
        for i in range(n):
            fh.write(kops.kmer_to_string(kmers[i], k))
            fh.write("\n" if (i + 1) % 8 == 0 else " ")
        fh.write("\n")
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
    with gzip.open(prefix + ".edge.gz", "wt") as fh:
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
        i = 0
        n = keys.shape[0]
        while i < n:
            f = int(keys[i, 0])
            fh.write(f"{f}")
            while i < n and int(keys[i, 0]) == f:
                fh.write(f" {int(keys[i, 1])} {int(mult[i])}")
                i += 1
            fh.write("\n")


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
        for m in marker:
            fh.write(f"{int(m)}\n")


def write_pe_grads(
    prefix: str, grads: Sequence, max_read_len: int, n_libs: Optional[int] = None
) -> None:
    """grads: PeGrad list sorted by insert size (prlHashReads.c:690-699)."""
    with open(prefix + ".peGrads", "w") as fh:
        fh.write(f"grads&num: {len(grads)}\t{max_read_len}\n")
        for g in grads:
            fh.write(
                f"{g.insert_size}\t{g.end_read_id}\t{g.rank}\t{g.pair_num_cutoff}\n"
            )


def read_pe_grads(prefix: str):
    from .reads import PeGrad

    grads = []
    with open(prefix + ".peGrads") as fh:
        head = fh.readline().split()
        max_read_len = int(head[1]) if len(head) > 1 else 0
        for line in fh:
            t = line.split()
            if len(t) >= 4:
                grads.append(
                    PeGrad(int(t[0]), int(t[1]), int(t[2]), int(t[3]))
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


def write_updated_edges(
    prefix: str, records: Iterable[Tuple[int, int, int, float]]
) -> None:
    """*.updated.edge (output_updated_edges, output_contig.c:333): per
    contig ``>length L,cid,bal,cvg`` — bal 1 for a palindrome (its own
    twin), 0 otherwise (the reference stores a relative twin offset)."""
    recs = list(records)
    with open(prefix + ".updated.edge", "w") as fh:
        fh.write(f"EDGEs {len(recs)}\n")
        for cid, length, bal, cvg in recs:
            fh.write(f">length {length},{cid},{bal},{cvg:.1f}\n")


def write_heavy_arcs(
    prefix: str, arcs: Iterable[Tuple[int, List[Tuple[int, int]]]]
) -> None:
    """*.Arc (output_heavyArcs, output_contig.c:398): one line per directed
    contig with out-arcs: ``from to1 w1 to2 w2 ...`` (1-based directed ids,
    see module docstring)."""
    with open(prefix + ".Arc", "w") as fh:
        for dfrom, outs in arcs:
            if not outs:
                continue
            fh.write(str(dfrom + 1))
            for dto, w in sorted(outs):
                fh.write(f" {dto + 1} {w}")
            fh.write("\n")


def read_heavy_arcs(prefix: str) -> dict:
    """*.Arc -> {directed_from: [(directed_to, weight), ...]} (0-based
    directed ids, loadArcs loadGraph.c:541 analog)."""
    arcs: dict = {}
    try:
        with open(prefix + ".Arc") as fh:
            for line in fh:
                t = line.split()
                if len(t) < 3:
                    continue
                dfrom = int(t[0]) - 1
                outs = arcs.setdefault(dfrom, [])
                for i in range(1, len(t) - 1, 2):
                    outs.append((int(t[i]) - 1, int(t[i + 1])))
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


def write_read_on_contig(
    prefix: str, read_id: np.ndarray, ctg: np.ndarray, pos: np.ndarray
) -> None:
    """*.readOnContig.gz: 'read contig pos' per mapped read
    (prlRead2Ctg.c:863-880).  Contig ids are 1-based directed ids."""
    with gzip.open(prefix + ".readOnContig.gz", "wt") as fh:
        fh.write("read\tcontig\tpos\n")
        for r, c, p in zip(read_id, ctg, pos):
            fh.write(f"{int(r)}\t{int(c) + 1}\t{int(p)}\n")


def read_read_on_contig(
    prefix: str, compat: bool = False
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """compat=True is the -z COMPATIBLE_MODE (scaffold.c:206-209): read the
    uncompressed v1.05-style *.readOnContig instead of *.readOnContig.gz."""
    rows = []
    if compat:
        opener = open(prefix + ".readOnContig", "rt")
    else:
        opener = gzip.open(prefix + ".readOnContig.gz", "rt")
    with opener as fh:
        header = fh.readline()
        for line in fh:
            t = line.split()
            if len(t) >= 3:
                rows.append((int(t[0]), int(t[1]) - 1, int(t[2])))
    if not rows:
        return (np.zeros((0,), np.int64),) * 3  # type: ignore[return-value]
    arr = np.array(rows, np.int64)
    return arr[:, 0], arr[:, 1].astype(np.int32), arr[:, 2].astype(np.int32)


def write_read_in_gap(prefix: str, gap_reads) -> None:
    """*.readInGap.gz — PE-anchored gap-filling read pool:
    'anchor_ctg anchor_pos insert_size seq' per line (the combined role of
    the reference's readInGap.gz + PEreadOnContig.gz)."""
    from ..ops import kmer as kops

    with gzip.open(prefix + ".readInGap.gz", "wt") as fh:
        for i in range(len(gap_reads)):
            codes = np.frombuffer(gap_reads.seqs[i], np.uint8)
            seq = kops.ascii_from_codes(codes).tobytes().decode()
            fh.write(
                f"{gap_reads.anchor_ctg[i] + 1}\t{gap_reads.anchor_pos[i]}"
                f"\t{gap_reads.insert_size[i]}\t{seq}\n"
            )


def read_read_in_gap(prefix: str, compat: bool = False):
    """compat=True (-z): read the uncompressed *.readInGap
    (prlReadFillGap.c:213-252 reads the v1.05 plain file)."""
    from ..models.mapping import GapReads
    from ..ops import kmer as kops

    pool = GapReads.empty()
    try:
        if compat:
            fh_cm = open(prefix + ".readInGap", "rt")
        else:
            fh_cm = gzip.open(prefix + ".readInGap.gz", "rt")
        with fh_cm as fh:
            for line in fh:
                t = line.split()
                if len(t) < 4:
                    continue
                pool.anchor_ctg.append(int(t[0]) - 1)
                pool.anchor_pos.append(int(t[1]))
                pool.insert_size.append(int(t[2]))
                pool.seqs.append(
                    kops.codes_from_ascii(
                        np.frombuffer(t[3].encode(), np.uint8)
                    ).tobytes()
                )
    except FileNotFoundError:
        pass
    return pool


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


def write_scaf_seq(prefix: str, seqs, name: str = "scaffold") -> None:
    write_fasta_generic(
        prefix + ".scafSeq",
        ((f"{name}{i + 1} {len(s)}", s) for i, s in enumerate(seqs)),
    )


def write_scaf_statistics(prefix: str, contig_stats: dict, scaff_stats: dict) -> None:
    """*.scafStatistics (ScafStat, orderContig.c:3429)."""
    with open(prefix + ".scafStatistics", "w") as fh:
        fh.write("<-- Information for assembly Scaffold '%s.scafSeq'.(cut_off_length < 100bp) -->\n\n" % prefix)
        for title, st in (("Scaffold", scaff_stats), ("Contig", contig_stats)):
            fh.write(f"{title}_Number {st.get('n', 0)}\n")
            fh.write(f"{title}_Total_Length {st.get('total', 0)}\n")
            fh.write(f"{title}_Longest {st.get('max', 0)}\n")
            fh.write(f"{title}_N50 {st.get('N50', 0)}\n")
            fh.write(f"{title}_N90 {st.get('N90', 0)}\n\n")


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
