"""Fusion mode: scaffold externally assembled contigs.

Counterpart of the reference's standalone SOAPdenovo-fusion binary
(fusion/main.c:18): import foreign contigs (e.g. MEGAHIT output) into the
stage file protocol, then reuse the map + scaff stages unchanged.

  -D data prepare (fusion/prepare.c ``data_prepare:35``): FASTA contigs ->
     *.contig with a name map (*.conver) and a synthesized
     *.preGraphBasic so downstream stages see a normal assembly prefix.
  -M / -S map / scaffold: the shared map and scaff stages (the reference
     fusion tree is a ~90% clone of standardPregraph's map+scaff layers —
     here they are literally the same modules).

  -B PE bundling (fusion/bundle.c ``call_bundle:323``): overlap-bundle
     report over the same link accumulation (``call_bundle`` below).
  -O potential analysis (fusion/potential.c).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Tuple

from ..io import files as fio

log = logging.getLogger("soapdenovo2_tpu.fusion")


def potential(prefix: str, weight_cutoff: int = 3) -> List[int]:
    """-O potential-analysis mode (fusion/potential.c ``potential:20``).

    Estimates the scaffold lengths achievable from the current *.links
    connection graph before actually scaffolding: for each unvisited
    contig, walk the downward connections (links with weight >= 3,
    potential.c:110) depth-first, accumulating gap + contig length, and
    record the farthest cumulative span downstream plus upstream (via the
    twin's downward connections; the reference's second loop re-walks the
    already-marked forward side — a no-op — so the upstream walk here is
    the evident intent; the seed contig's own length is also counted,
    which the reference omits).  Prints the predicted length
    distribution, its N50 and the used-contig count, and writes them to
    ``prefix.potential``.
    """
    lengths = [int(v) for v in fio.read_contig_index(prefix).lengths]
    n_dir = 2 * len(lengths)

    # downward adjacency over directed contig ids (2*ctg + strand)
    down: Dict[int, List[Tuple[int, int]]] = {}
    for c1, c2, w, gap in fio.read_links(prefix):
        for i in range(c1.shape[0]):
            if int(w[i]) < weight_cutoff:
                continue
            down.setdefault(int(c1[i]), []).append((int(c2[i]), int(gap[i])))

    in_subgraph = [False] * n_dir

    def _mark(c: int) -> None:
        in_subgraph[c] = True
        in_subgraph[c ^ 1] = True

    def _walk(start: int) -> int:
        """Farthest cumulative (gap + length) span reachable from start."""
        max_dist = 0
        stack = [(start, 0)]
        while stack:
            node, base = stack.pop()
            for nxt, gap in down.get(node, ()):
                if in_subgraph[nxt]:
                    continue
                _mark(nxt)
                d = base + gap + lengths[nxt >> 1]
                if d > max_dist:
                    max_dist = d
                stack.append((nxt, d))
        return max_dist

    predict: List[int] = []
    used = 0
    for i in range(n_dir):
        if in_subgraph[i]:
            continue
        _mark(i)
        used += 1
        if not down.get(i) and not down.get(i ^ 1):
            predict.append(lengths[i >> 1])
            continue
        span = _walk(i) + _walk(i ^ 1)
        if span:
            predict.append(span + lengths[i >> 1])

    predict.sort(reverse=True)
    total = sum(predict)
    half = total // 2
    acc = 0
    n50 = 0
    for v in predict:
        acc += v
        if acc >= half:
            n50 = v
            break
    with open(prefix + ".potential", "w") as fh:
        fh.write(f"#sum {total} half {half} N50 {n50} used_contigs {used}\n")
        for v in predict:
            fh.write(f"len:\t{v}\n")
    print(f"sum {total} , half  {half}.")
    print(f"N50 {n50} , half {half}.")
    print(f"used contig {used}")
    log.info("fusion -O: %d predicted scaffolds, N50 %d, sum %d",
             len(predict), n50, total)
    return predict


def call_bundle(prefix: str, weight_threshold: int = 3) -> int:
    """-B PE bundling (fusion/bundle.c ``call_bundle:323``): aggregate
    the mapped PE pairs into contig-overlap bundles.

    The reference accumulates CONNECTs per gradation and
    ``outputBundle:418`` emits ``from to gapLen`` lines for connections
    with weight > -u (default 3) and NEGATIVE gap — i.e. contig pairs the
    PE evidence says overlap.  (Its output stream is opened on a stale
    name buffer — the sprintf is commented out at bundle.c:333 — so the
    on-disk name is undefined there; we write ``prefix.bundle`` and add a
    weight column.)  Requires the map stage's readOnContig/peGrads.
    """
    import numpy as np

    from ..io import files as fio
    from . import scaffold as sf

    try:
        ref2dir = fio.read_contig_index(prefix).ref2dir
    except FileNotFoundError:
        ref2dir = None
    rid, ctg, pos = fio.read_read_on_contig(prefix, ref2dir=ref2dir)
    grads, _ = fio.read_pe_grads(prefix)
    lengths = fio.read_contig_index(prefix).lengths
    ctg_len = np.repeat(lengths, 2).astype(np.int64)
    n = 0
    with open(prefix + ".bundle", "w") as fh:
        lo = 0
        for g in grads:
            links, _ = sf.build_links_for_grad(
                rid, ctg, pos, ctg_len, g.insert_size, lo, g.end_read_id
            )
            lo = g.end_read_id
            for i in range(links.c1.shape[0]):
                w = int(links.weight[i])
                gap = int(links.gap[i])
                if w > weight_threshold and gap < 0:
                    fh.write(f"{int(links.c1[i]) + 1}\t"
                             f"{int(links.c2[i]) + 1}\t{gap}\t{w}\n")
                    n += 1
    log.info("fusion -B: %d overlap bundles (> weight %d)", n,
             weight_threshold)
    return n


def data_prepare(contig_fasta: str, prefix: str, k: int) -> int:
    """-D: import contigs and synthesize the assembly prefix files."""
    records = fio.read_fasta(contig_fasta)
    kept = [(name, seq.upper()) for name, seq in records
            if len(seq) >= k + 2]
    pal = [fio.is_palindrome(s) for _, s in kept]
    d2r = fio.dir_to_ref_ids(pal)
    contigs: List[Tuple[int, str, float]] = [
        (int(d2r[2 * i]), s, 0.0) for i, (_, s) in enumerate(kept)
    ]
    with open(prefix + ".conver", "w") as conv:
        for (name, _), (cid, _, _) in zip(kept, contigs):
            conv.write(f"{name}\t{cid}\n")
    fio.write_contigs(prefix, contigs)
    fio.write_contig_index(prefix, [len(s) for _, s, _ in contigs], pal)
    fio.write_updated_edges(
        prefix, [(len(s), p, c) for (_, s, c), p in zip(contigs, pal)])
    fio.write_pre_graph_basic(prefix, 0, k, 2 * len(contigs), 0)
    log.info("fusion -D: imported %d contigs (>= k+2) from %s",
             len(contigs), contig_fasta)
    return len(contigs)
