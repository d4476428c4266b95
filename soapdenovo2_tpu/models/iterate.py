"""Multi-k iteration (-m): assemble at k, rebuild at larger k.

Counterpart of standardPregraph/iterate.c ``Iterate:2640``: small k gives
connectivity through low-coverage regions, large k gives specificity
through repeats.  The reference's per-level body re-hashes the current
edges into a (k')-mer set (``buildGraphHash:720`` -> kmerhash.c
KmerSet2), re-streams all reads once (``addArc`` -> read2edge.c
``Read2edge:787``), refreshes arcs (``freshArc:2442``), prunes
(``removeWeakEdges2``/``removeLowCovEdges2``, cutlen = 2*mink), and then
extends/clones edges at junction vertices (``fresh:2257`` ->
``freshEdge``/``checkindegree``) — the step that actually re-resolves
repeats shorter than k'.

TPU-native formulation: each level REBUILDS the k'-graph with the
standard sharded pipeline — but from a reduced stream that carries the
same information at a fraction of the volume:

  * the previous level's contigs, chopped into overlapping pseudo-read
    windows (every (k'+1)-adjacency survives): these carry all interior
    sequence, collapsing to ~genome-size k-mers instead of
    coverage-times-genome;
  * the JUNCTION-CROSSING reads only — reads whose edge path at the base
    k touches >= 2 edges, collected once after level 0.  Only these can
    contribute cross-junction (k')-mers that the contigs lack, and
    junctions never appear as k grows (merges/deletions only remove
    them), so the subset stays sufficient across levels.

Versus the reference this trades ``fresh``'s in-place edge surgery for a
rebuild over ~genome-size + junction-read input — a fraction of a full
level (the round-3 design re-counted the ENTIRE read set per level), in
exchange for the same repeat-resolution outcome (golden-tested).
"""

from __future__ import annotations

import functools
import logging
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AssemblyConfig
from ..io import native_reads, reads as rio
from ..ops import kmer as kops
from ..ops import sortcount as sc
from . import contig as cm
from . import mapping as mp
from . import pregraph as pg

log = logging.getLogger("soapdenovo2_tpu.iterate")

WINDOW = 512  # contig pseudo-read window
OVERLAP = 160  # > max k (127) + headroom so adjacencies survive chopping


def _contig_windows(contigs: List[str]) -> Iterator[bytes]:
    # each window emitted TWICE: every contig k-mer then has cov >= 2,
    # so the per-level -d 1 prune (below) kills junction-READ error
    # k-mers (cov 1) without touching contig sequence — at 1 Mb scale
    # unpruned read errors at k'=43 turned 80% of the rebuilt assembly
    # chimeric
    for s in contigs:
        if len(s) <= WINDOW:
            yield s.encode()
            yield s.encode()
            continue
        step = WINDOW - OVERLAP
        for off in range(0, len(s) - OVERLAP, step):
            yield s[off : off + WINDOW].encode()
            yield s[off : off + WINDOW].encode()


@functools.partial(jax.jit, static_argnames=("k", "psteps", "pshift"))
def _crossing_batch(codes, lengths, k, keys, cid, pdir,
                    psteps: int, pshift: int):
    """Which reads of the batch touch >= 2 distinct contigs (their edge
    path crosses a junction)?"""
    out = kops.extract_kmers(codes, lengths, k)
    idx = sc.lookup_kmers_dir(keys, out["words"], pdir, psteps, pshift)
    ok = (idx >= 0) & out["valid"]
    hit = jnp.where(ok, cid[jnp.maximum(idx, 0)], -1)
    prev = pg._last_seen_scan(hit)
    is_arc = (hit >= 0) & (prev >= 0) & (hit != prev)
    return jnp.any(is_arc, axis=1)


def collect_junction_reads(
    cfg: AssemblyConfig, g: cm.ContigGraph, k: int, batch_size: int,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """One map-style pass over all reads: keep (codes, lengths) of reads
    whose k-mer path touches >= 2 contigs of ``g``."""
    recs = cm.contig_records(g)
    seqs = [s for _, s, _, _ in recs]
    if not seqs:
        return []
    index = mp.build_contig_index(seqs, k)
    keys = jnp.asarray(index.keys)
    cid = jnp.asarray(index.cid)
    pdir = jnp.asarray(index.pdir)
    kept: List[Tuple[np.ndarray, np.ndarray]] = []
    for lib in cfg.libs_for_contig():
        for batch in native_reads.batch_reads_lib(lib, batch_size,
                                                  cfg.max_rd_len):
            batch = batch.trimmed()
            cr = np.asarray(_crossing_batch(
                jnp.asarray(batch.codes), jnp.asarray(batch.lengths), k,
                keys, cid, pdir, index.pdir_steps, index.pdir_shift,
            ))[: batch.n]
            if cr.any():
                kept.append((batch.codes[: batch.n][cr],
                             batch.lengths[: batch.n][cr]))
    return kept


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
        # for a coarser sweep when wall-clock matters
        step = 2
    ks = list(range(kmin + step, kmax + 1, step))
    if not ks or ks[-1] != kmax:
        ks.append(kmax)

    # level 0: the full standard pipeline at kmin
    pre = pg.run_pregraph(
        cfg, kmin, d_cutoff=d_cutoff, record_paths=record_paths,
        batch_size=batch_size, progress=progress,
    )
    result = cm.run_contig(pre, de_low_edge=d_cutoff, progress=progress)
    contigs = [s for _, s, _ in cm.contig_sequences(result.graph)]
    junction_reads = collect_junction_reads(
        cfg, result.graph, kmin, batch_size)
    if progress:
        n_jr = sum(c.shape[0] for c, _ in junction_reads)
        log.info("iterate: %d junction-crossing reads cached", n_jr)

    max_len = max(cfg.max_rd_len, WINDOW)
    for i, k2 in enumerate(ks):
        last = i == len(ks) - 1

        def read_batches():
            yield from rio.batch_reads(
                _contig_windows(contigs), max(64, batch_size // 8), WINDOW
            )
            for c, ln in junction_reads:
                yield rio.ReadBatch(codes=c, lengths=ln, n=c.shape[0],
                                    start_id=0)

        table, n_reads = pg.count_reads_to_table(
            read_batches(), k2, max_len)
        table = pg.shrink_table(table, k2)
        from . import edges as edge_mod
        from . import kmer_graph as kg

        g = kg.from_table(table)
        if d_cutoff > 0:
            # junction reads are RAW reads: their error k-mers (cov 1)
            # must not become nodes at k'.  Contig windows are emitted
            # twice, so real sequence always has cov >= 2.
            g = kg.de_low_cov(g, jnp.int32(min(d_cutoff, 1)))
            g = kg.compact_graph(g)
        g = kg.mark_linear(g)
        g, _ = kg.remove_single_tips(g, k2)
        g, _ = kg.remove_minor_tips(g, k2)
        eg = edge_mod.build_edges(g, k2)
        arcs, marker, paths = pg.build_arcs(
            read_batches(), eg,
            sc.KmerTable(keys=g.keys, covs=g.covs, n=g.n), k2,
            record_paths=record_paths and last,
        )
        pre = pg.PregraphResult(
            k=k2, table=table, graph=g, edges=eg, arcs=arcs,
            marker_on_edge=marker, paths=paths,
            kmer_freq=np.asarray(kg.kmer_freq_hist(g)), n_reads=n_reads,
            max_read_len=max_len,
        )
        result = cm.run_contig(pre, progress=progress)
        contigs = [s for _, s, _ in cm.contig_sequences(result.graph)]
        if progress:
            log.info("iterate k=%d: %s", k2, result.stats)
    return result
