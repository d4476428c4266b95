"""Stage checkpointing: serialize pipeline state to the reference's
``prefix.*`` file protocol and rebuild it (SURVEY.md section 5 — files are
the inter-stage interface, making every stage restartable).

Edge-id convention on disk (matches loadPreGraph.c:448 semantics): the
edge file holds one record per undirected edge; a record with bal=1
expands to two directed edges (ids adjacent), bal=0 (palindrome) to one.
Ids are 1-based in files.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..io import files as fio
from ..io import reads as rio
from ..ops import kmer as kops
from . import contig as cm
from . import pregraph as pg

log = logging.getLogger("soapdenovo2_tpu.checkpoint")


def edge_file_order(eg) -> Tuple[List[int], np.ndarray]:
    """Deterministic undirected emission order + directed->file-id map.

    For each twin pair, the representative is the direction with the
    lexicographically smaller sequence (ties: lower index).  Returns
    (reps, dir_to_file) where file ids are 1-based.
    """
    E = eg.n_edges
    reps: List[int] = []
    seen = np.zeros((E,), bool)
    for e in range(E):
        if seen[e]:
            continue
        t = int(eg.twin[e])
        if t == e:
            reps.append(e)
            seen[e] = True
            continue
        se = eg.edge_string(e)
        st = eg.edge_string(t)
        rep = e if se <= st else t
        reps.append(rep)
        seen[e] = seen[t] = True
    dir_to_file = np.zeros((E,), np.int64)
    fid = 1
    for rep in reps:
        t = int(eg.twin[rep])
        dir_to_file[rep] = fid
        if t != rep:
            dir_to_file[t] = fid + 1
            fid += 2
        else:
            fid += 1
    return reps, dir_to_file


def write_pregraph(prefix: str, pre: pg.PregraphResult,
                   grads: Optional[List[rio.PeGrad]] = None) -> None:
    eg = pre.edges
    k = pre.k
    # kmerFreq
    fio.write_kmer_freq(prefix, pre.kmer_freq)
    # vertex file: branch (non-linear, non-deleted) kmers.  The sharded
    # path downloads only these E-scale keys (branch_keys); the
    # single-device path derives them from the resident graph.
    if pre.branch_keys is not None:
        keys = pre.branch_keys
    else:
        from . import kmer_graph as kg

        g = pre.graph
        nb = int(kg.branch_count(g.linear, g.deleted))
        cap = 1 << max(nb - 1, 0).bit_length() if nb else 1
        keys = np.asarray(
            kg.branch_keys_compact(g.keys, g.linear, g.deleted, cap)
        )[:nb]
    n_vertex = fio.write_vertex(prefix, keys, k)
    # edges
    reps, dir_to_file = edge_file_order(eg)

    def edge_records():
        for rep in reps:
            t = int(eg.twin[rep])
            bal = 1 if t != rep else 0
            seq = eg.edge_string(rep)
            length = len(seq) - k
            yield (length, seq, int(eg.cvg10[rep]), bal)

    n_rec = fio.write_edges(prefix, k, edge_records())
    n_dir_ids = int(dir_to_file.max()) if len(reps) else 0
    fio.write_pre_graph_basic(
        prefix, n_vertex, k, n_dir_ids, pre.max_read_len
    )
    # preArcs in file ids
    n = int(pre.arcs.n)
    akeys = np.asarray(pre.arcs.keys)[:n].astype(np.int64)
    amult = np.asarray(pre.arcs.mult)[:n]
    fkeys = np.stack(
        [dir_to_file[akeys[:, 0]], dir_to_file[akeys[:, 1]]], axis=1
    )
    order = np.lexsort((fkeys[:, 1], fkeys[:, 0]))
    fio.write_pre_arcs(prefix, fkeys[order], amult[order])
    # markOnEdge rows are keyed by FILE id (the reference's output_arcs
    # writes i = 1..num_ed in file order and loadPathBin reads them back
    # positionally) — remap from internal directed-edge order
    E = eg.n_edges
    marker_file = np.zeros((n_dir_ids,), np.int32)
    if E:
        marker_file[dir_to_file[np.arange(E)] - 1] = pre.marker_on_edge
    fio.write_mark_on_edge(prefix, marker_file)
    if pre.paths is not None:
        write_paths(prefix, pre.paths, dir_to_file)
    if grads is not None:
        fio.write_pe_grads(prefix, grads, pre.max_read_len)
    log.info("pregraph checkpoint: %d vertices, %d edge records", n_vertex, n_rec)


def write_paths(prefix: str, paths, dir_to_file: np.ndarray) -> None:
    """*.path — read paths (>=3 edges) in the reference BINARY format
    (recordPathBin, prlRead2path.c:478-543): one record per qualifying
    read, a u8 edge count followed by that many little-endian u32
    1-based edge file ids — so a reference ``contig -R`` can consume our
    pregraph output directly."""
    with open(prefix + ".path", "wb") as fh:
        for p in paths:
            ids = dir_to_file[np.asarray(p, np.int64)]
            c = min(len(ids), 255)  # count field is one byte
            fh.write(bytes((c,)))
            fh.write(ids[:c].astype("<u4").tobytes())


def load_paths(prefix: str):
    """Load binary *.path into 0-based directed edge ids of
    load_contig_graph's numbering (file id - 1); mirrors loadPathBin's
    record loop (loadPath.c:303-318)."""
    try:
        with open(prefix + ".path", "rb") as fh:
            data = fh.read()
    except FileNotFoundError:
        return None
    paths = []
    off = 0
    n = len(data)
    while off < n:
        c = data[off]
        off += 1
        if off + 4 * c > n:
            break  # truncated trailing record
        ids = np.frombuffer(data, "<u4", count=c, offset=off)
        off += 4 * c
        if c >= 3:
            paths.append(ids.astype(np.int64) - 1)
    return paths


def load_contig_graph(prefix: str) -> cm.ContigGraph:
    """Rebuild the directed contig graph from *.edge.gz + *.preArc
    (loadPreGraph.c loadEdge:448 + buildReverseComplementEdge:274 +
    loadPreArcs:658)."""
    info = fio.read_pre_graph_basic(prefix)
    k = info["k"]
    records = fio.read_edges(prefix, k)
    seqs: List[np.ndarray] = []
    cvg10: List[int] = []
    twin: List[int] = []
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    for length, seq, cvg, bal in records:
        codes = kops.codes_from_ascii(np.frombuffer(seq.encode(), np.uint8))
        e = len(seqs)
        seqs.append(codes)
        cvg10.append(cvg)
        if bal:
            rc = seq.encode().translate(comp)[::-1]
            seqs.append(kops.codes_from_ascii(np.frombuffer(rc, np.uint8)))
            cvg10.append(cvg)
            twin += [e + 1, e]
        else:
            twin.append(e)
    E = len(seqs)
    arcs: List[Dict[int, int]] = [dict() for _ in range(E)]
    akeys, amult = fio.read_pre_arcs(prefix)
    twin_arr = np.asarray(twin, np.int32)
    raw: Dict[Tuple[int, int], int] = {}
    for (f, t), m in zip(akeys, amult):
        f, t = int(f) - 1, int(t) - 1  # file ids are 1-based
        if 0 <= f < E and 0 <= t < E:
            raw[(f, t)] = int(m)
    for (f, t), m in raw.items():
        w = m + raw.get((int(twin_arr[t]), int(twin_arr[f])), 0)
        arcs[f][t] = w
        arcs[int(twin_arr[t])][int(twin_arr[f])] = w
    marker = None
    try:
        with open(prefix + ".markOnEdge") as fh:
            marker = np.array([int(x) for x in fh], np.int32)
    except FileNotFoundError:
        pass
    return cm.ContigGraph(
        k=k,
        seqs=seqs,
        cvg10=np.asarray(cvg10, np.int32),
        twin=twin_arr,
        deleted=np.zeros((E,), bool),
        arcs=arcs,
        marker=marker,
    )


def write_contigs(prefix: str, g: cm.ContigGraph) -> int:
    records = cm.contig_records(g)
    # *.contig / *.ContigIndex / *.updated.edge / *.Arc all live in the
    # reference's DIRECTED id space (output_contig.c:292/333/398): twin
    # pairs occupy adjacent ids, palindromes one, and the *.contig FASTA
    # headers carry the rep's directed id (prlContig2nodes keys the map
    # stage's contig_array off getID(header), prlHashCtg.c:392) — so the
    # reference binaries' map/scaff stages can consume our contig stage
    # output and vice versa.
    lengths = [len(s) for _, s, _, _ in records]
    pal = [int(g.twin[fwd]) == fwd for _, _, _, fwd in records]
    d2r = fio.dir_to_ref_ids(pal)
    contigs = [(int(d2r[2 * i]), s, v)
               for i, (_, s, v, _) in enumerate(records)]
    n = fio.write_contigs(prefix, contigs)
    fio.write_contig_index(prefix, lengths, pal)
    fio.write_updated_edges(
        prefix,
        [(len(s), p, cvg) for (_, s, cvg, _), p in zip(records, pal)],
    )
    dcid = {}  # directed edge -> our directed contig id 2*(cid-1)+dir
    for cid, seq, cvg, fwd in records:
        t = int(g.twin[fwd])
        dcid[fwd] = 2 * (cid - 1)
        if t != fwd:
            dcid[t] = 2 * (cid - 1) + 1
    arc_lines = []
    for e, d in sorted(dcid.items(), key=lambda kv: kv[1]):
        outs = [
            (dcid[to], m) for to, m in g.live_arcs(e) if to in dcid
        ]
        arc_lines.append((d, outs))
    fio.write_heavy_arcs(prefix, arc_lines, dir2ref=fio.dir_to_ref_ids(pal))
    return n


def load_contigs(prefix: str) -> List[str]:
    return [s for _, s in fio.read_contigs(prefix + ".contig")]
