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

The PE bundling mode (fusion/bundle.c ``call_bundle:323``) is subsumed by
the scaffolder's link accumulation, which aggregates pairs into weighted
contig links directly (scaffold.build_links_for_grad).
"""

from __future__ import annotations

import logging
from typing import List, Tuple

from ..io import files as fio

log = logging.getLogger("soapdenovo2_tpu.fusion")


def data_prepare(contig_fasta: str, prefix: str, k: int) -> int:
    """-D: import contigs and synthesize the assembly prefix files."""
    records = fio.read_fasta(contig_fasta)
    contigs: List[Tuple[int, str, float]] = []
    with open(prefix + ".conver", "w") as conv:
        cid = 0
        for name, seq in records:
            seq = seq.upper()
            if len(seq) < k + 2:
                continue
            cid += 1
            contigs.append((cid, seq, 0.0))
            conv.write(f"{name}\t{cid}\n")
    fio.write_contigs(prefix, contigs)
    with open(prefix + ".ContigIndex", "w") as fh:
        fh.write(f"Edge_num {len(contigs)}\n")
        for cid, seq, cvg in contigs:
            fh.write(f"{cid}\t{len(seq)}\t{cvg:.1f}\n")
    fio.write_pre_graph_basic(prefix, 0, k, 2 * len(contigs), 0)
    log.info("fusion -D: imported %d contigs (>= k+2) from %s",
             len(contigs), contig_fasta)
    return len(contigs)
