"""Multi-k iteration (-m): assemble at k, rebuild at larger k.

Counterpart of standardPregraph/iterate.c ``Iterate:2640``: small k gives
connectivity through low-coverage regions, large k gives specificity
through repeats; the reference rebuilds the graph at k+1..maxk by hashing
the current EDGES plus re-streamed reads (buildGraphHash:720 + Read2edge).

TPU-native formulation: at each k-level the previous level's contigs are
re-injected as pseudo-reads (chopped into overlapping windows so every
(k'+1)-adjacency survives) alongside the original reads, and the standard
pregraph+contig passes run at k'.  Contig k-mers carry the connectivity
that single reads lose at large k — the same effect as the reference's
edge re-hashing, expressed as data instead of a special code path.
"""

from __future__ import annotations

import logging
from typing import Iterator, List, Optional

import numpy as np

from ..config import AssemblyConfig
from ..io import native_reads, reads as rio
from ..ops import kmer as kops
from . import contig as cm
from . import pregraph as pg

log = logging.getLogger("soapdenovo2_tpu.iterate")

WINDOW = 512  # contig pseudo-read window
OVERLAP = 160  # > max k (127) + headroom so adjacencies survive chopping


def _contig_windows(contigs: List[str]) -> Iterator[bytes]:
    for s in contigs:
        if len(s) <= WINDOW:
            yield s.encode()
            continue
        step = WINDOW - OVERLAP
        for off in range(0, len(s) - OVERLAP, step):
            yield s[off : off + WINDOW].encode()


def run_iterate(
    cfg: AssemblyConfig,
    kmin: int,
    kmax: int,
    d_cutoff: int = 1,
    record_paths: bool = False,
    batch_size: int = 4096,
    step: int = 0,
    progress: bool = True,
) -> cm.ContigResult:
    """Assemble at kmin, then re-assemble at increasing k up to kmax."""
    kops.validate_k(kmin)
    kops.validate_k(kmax)
    if kmax <= kmin:
        raise ValueError("maxk must exceed K")
    if not step:
        # default = the reference's every-odd-k sweep (Iterate:2640 runs
        # k+1..maxk with only odd k doing real work); pass --iter-step 4+
        # for the cheaper ~4-level sweep when wall-clock matters
        step = 2
    ks = list(range(kmin, kmax + 1, step))
    if ks[-1] != kmax:
        ks.append(kmax)

    contigs: Optional[List[str]] = None
    result: Optional[cm.ContigResult] = None
    for k in ks:
        def read_batches():
            for lib in cfg.libs_for_contig():
                yield from native_reads.batch_reads_lib(
                    lib, batch_size, cfg.max_rd_len
                )
            if contigs:
                yield from rio.batch_reads(
                    _contig_windows(contigs), max(64, batch_size // 8), WINDOW
                )

        table, n_reads = pg.count_reads_to_table(read_batches(), k, cfg.max_rd_len)
        table = pg.shrink_table(table, k)
        from . import edges as edge_mod
        from . import kmer_graph as kg
        import jax.numpy as jnp
        from ..ops import sortcount as sc

        g = kg.from_table(table)
        if d_cutoff > 0 and contigs is None:
            # only the first level sees raw-read noise; later levels carry
            # cleaned contigs whose coverage-1 k-mers are real
            g = kg.de_low_cov(g, jnp.int32(d_cutoff))
        g = kg.mark_linear(g)
        g, _ = kg.remove_single_tips(g, k)
        g, _ = kg.remove_minor_tips(g, k)
        eg = edge_mod.build_edges(g, k)
        arcs, marker, paths = pg.build_arcs(
            read_batches(), eg,
            sc.KmerTable(keys=g.keys, covs=g.covs, n=g.n), k,
            record_paths=record_paths,
        )
        pre = pg.PregraphResult(
            k=k, table=table, graph=g, edges=eg, arcs=arcs,
            marker_on_edge=marker, paths=paths,
            kmer_freq=np.asarray(kg.kmer_freq_hist(g)), n_reads=n_reads,
            max_read_len=cfg.max_rd_len,
        )
        result = cm.run_contig(pre, progress=progress)
        contigs = [s for _, s, _ in cm.contig_sequences(result.graph)]
        if progress:
            log.info("iterate k=%d: %s", k, result.stats)
    assert result is not None
    return result
