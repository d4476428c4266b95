"""Gap filling: local assembly of scaffold gaps from PE-anchored reads.

Counterpart of standardPregraph/prlReadFillGap.c (``prlReadsCloseGap:1697``)
+ localAsm.c: reads whose mates map near a gap are pooled per gap
(loadReads4gap:206 / attach1read2contig:59 semantics via PE position
inference), a small de Bruijn table is built per gap, and a
flank-to-flank walk bridges the gap (localGraph/searchFgap:792); a direct
flank-overlap check handles negative gaps (the readsCrossGap:2092 case).

The reference pops scaffolds off a mutex-guarded task queue, one thread
per gap (prlReadFillGap.c:37-46).  Here the read-based gaps are batched
and assembled in LOCKSTEP on the device (ops/localasm.py): vmapped
sort/segment-reduce builds every gap's k-mer table at once and a single
``lax.scan`` advances all walks one base per step.  A pure-host walk with
identical semantics remains for parity testing and as a fallback for
oversized read pools.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..ops import kmer as kops
from . import mapping as mp
from . import scaffold as sf

log = logging.getLogger("soapdenovo2_tpu.gapfill")

_CODE2CHAR = "ACGTN"
_RC = bytes.maketrans(b"ACGTN", b"TGCAN")

# device batching caps: pools larger than R_MAX reads fall back to the
# host walk (rare: gaps are short, local coverage is bounded)
R_MAX = 256


def _codes_to_str(b: bytes) -> str:
    return "".join(_CODE2CHAR[min(c, 4)] for c in b)


def _revcomp(s: str) -> str:
    return s.encode().translate(_RC)[::-1].decode()


@dataclasses.dataclass
class GapFillStats:
    n_gaps: int = 0
    filled: int = 0
    overlap_merged: int = 0
    partial: int = 0


def _next_pow2(x: int, lo: int = 8) -> int:
    return max(lo, 1 << (max(x, 1) - 1).bit_length())


def fill_gaps(
    scaffolds: List[sf.Scaffold],
    contig_seqs: List[str],
    gap_reads: mp.GapReads,
    k: int = 17,
    flank: int = 100,
    min_cov: int = 2,
    progress: bool = True,
    use_device: bool = True,
) -> Tuple[List[str], List[str], GapFillStats]:
    """Fill N-gaps in scaffolds.

    Returns (scaffold_seqs, gap_seqs, stats); ``gap_seqs`` holds the
    assembled bridge sequences (the *.gapSeq payload).
    """
    stats = GapFillStats()
    # scaffold coordinates of every directed contig
    ctg_coord: Dict[int, Tuple[int, int, bool]] = {}  # ctg -> (scaf, off, flipped)
    scaf_layout = []
    for si, sc in enumerate(scaffolds):
        offs = []
        acc = 0
        for j, c in enumerate(sc.ctgs):
            cl = len(contig_seqs[c >> 1])
            offs.append(acc)
            ctg_coord[c] = (si, acc, False)
            ctg_coord[c ^ 1] = (si, acc, True)
            acc += cl + (sf.gap_span(sc.gaps[j]) if j < len(sc.gaps) else 0)
        scaf_layout.append((offs, acc))

    # place gap reads into per-(scaffold, gap index) pools
    pools: Dict[Tuple[int, int], List[str]] = {}
    gapspans: Dict[Tuple[int, int], Tuple[int, int]] = {}
    for si, sc in enumerate(scaffolds):
        offs, total = scaf_layout[si]
        for j in range(len(sc.gaps)):
            left_c = sc.ctgs[j]
            gap_start = offs[j] + len(contig_seqs[left_c >> 1])
            gap_end = offs[j + 1] if j + 1 < len(offs) else total
            gapspans[(si, j)] = (gap_start, gap_end)

    for i in range(len(gap_reads)):
        c = gap_reads.anchor_ctg[i]
        if c not in ctg_coord:
            continue
        si, off, flipped = ctg_coord[c]
        p = gap_reads.anchor_pos[i]
        ins = gap_reads.insert_size[i]
        clen = len(contig_seqs[c >> 1])
        seq = _codes_to_str(gap_reads.seqs[i])
        rl = len(seq)
        if not flipped:
            # mate reads forward along scaffold; this read sits ~ins ahead
            lo = off + p + max(ins - 3 * rl, 0)
            hi = off + p + ins + rl
        else:
            coord = off + clen - p  # mate start in scaffold coords (approx)
            hi = coord - max(ins - 3 * rl, 0)
            lo = coord - ins - rl
        for (sj, gj), (gs, ge) in gapspans.items():
            if sj == si and lo <= ge and hi >= gs:
                pools.setdefault((sj, gj), []).append(seq)

    # ---- pass A: decide every gap (overlap check, then batched assembly) --
    bridges: Dict[Tuple[int, int], Optional[Tuple[str, object]]] = {}
    jobs: List[Tuple[Tuple[int, int], str, str, List[str], int]] = []
    for si, sc in enumerate(scaffolds):
        for j in range(len(sc.gaps)):
            if sf.is_splice(sc.gaps[j]):
                continue
            stats.n_gaps += 1
            left = sf._dir_ctg_seq(int(sc.ctgs[j]), contig_seqs)
            right = sf._dir_ctg_seq(int(sc.ctgs[j + 1]), contig_seqs)
            gap_est = max(int(sc.gaps[j]), 1)
            olap = _flank_overlap(left, right, gap_est, k)
            if olap is not None:
                stats.overlap_merged += 1
                bridges[(si, j)] = ("overlap", olap)
                continue
            reads = pools.get((si, j), [])
            if not reads:
                bridges[(si, j)] = None
                continue
            jobs.append(((si, j), left[-flank:], right[:flank],
                         reads, gap_est))

    if jobs:
        if use_device:
            _fill_jobs_device(jobs, bridges, k, flank, min_cov, stats)
        else:
            for key, lf, rf, reads, gap_est in jobs:
                res = _walk_host(lf, rf, reads, gap_est, k, min_cov)
                if res is None:
                    res = _dfs_host(lf, rf, reads, gap_est, k, min_cov)
                if res is not None:
                    stats.filled += 1
                bridges[key] = res

    # ---- pass B: emit scaffold sequences -----------------------------------
    out_seqs: List[str] = []
    gap_seqs: List[str] = []
    for si, sc in enumerate(scaffolds):
        parts: List[str] = []
        for j, c in enumerate(sc.ctgs):
            parts.append(sf._dir_ctg_seq(int(c), contig_seqs))
            if j < len(sc.gaps):
                if sf.is_splice(sc.gaps[j]):
                    # arc-spliced junction: exact k-base overlap, no gap
                    # here; verify the claimed junction before splicing
                    right = sf._dir_ctg_seq(int(sc.ctgs[j + 1]), contig_seqs)
                    ov = sf.splice_overlap(sc.gaps[j])
                    if ov <= len(right) and parts[-1].endswith(right[:ov]):
                        parts.append(right[ov:])
                    else:
                        parts.append("N" + right)
                    parts.append("\0")  # marker: skip next piece
                    continue
                gap_est = max(int(sc.gaps[j]), 1)
                bridge = bridges.get((si, j))
                if bridge is None:
                    parts.append("N" * gap_est)
                else:
                    kind, val = bridge
                    if kind == "overlap":
                        # flanks overlap by `val` bases: emit the right
                        # contig trimmed, and mark its normal emission
                        # (next outer iteration) for removal
                        right = sf._dir_ctg_seq(int(sc.ctgs[j + 1]),
                                                contig_seqs)
                        parts.append(right[val:])
                        parts.append("\0")  # marker: skip next piece
                    else:
                        gap_seqs.append(val)
                        parts.append(val)
        # resolve overlap markers: "\0" means the following contig was
        # already emitted
        final: List[str] = []
        skip_next = False
        for piece in parts:
            if piece == "\0":
                skip_next = True
                continue
            if skip_next:
                skip_next = False
                continue
            final.append(piece)
        out_seqs.append("".join(final))
    if progress:
        log.info(
            "gapfill: %d/%d gaps closed (%d by overlap, %d partial)",
            stats.filled + stats.overlap_merged, stats.n_gaps,
            stats.overlap_merged, stats.partial,
        )
    return out_seqs, gap_seqs, stats


def _flank_overlap(left: str, right: str, gap_est: int, k: int
                   ) -> Optional[int]:
    """Negative/tiny gap: direct overlap of flanks.  Exact match first,
    then a mismatch-tolerant scan at >=90% identity — the readsCrossGap
    banded-DP consensus cutoff (localAsm.c compareSequences:1727 accepts
    alignments with similarity >= 0.9), so a SNP/error in the overlap no
    longer kills closures the reference makes."""
    max_olap = min(len(left), len(right), max(gap_est, 0) + 3 * k + 50)
    if max_olap < k:
        return None
    lb = np.frombuffer(left[-max_olap:].encode(), np.uint8)
    rb = np.frombuffer(right[:max_olap].encode(), np.uint8)
    best_tolerant = None
    for n in range(max_olap, k - 1, -1):
        mism = int((lb[max_olap - n:] != rb[:n]).sum())
        if mism == 0:
            return n
        if best_tolerant is None and mism <= max(1, n // 10):
            # don't early-return: a longer overlap with <=10% mismatches
            # must not shadow a shorter EXACT one (checked first above in
            # descending order, exact wins at the same n)
            best_tolerant = n
    return best_tolerant


def _fill_jobs_device(
    jobs, bridges, k: int, flank: int, min_cov: int, stats: GapFillStats
) -> None:
    """Run read-based gap jobs through the lockstep device assembler,
    bucketed by (pool-size, read-length, walk-length) shape."""
    from ..ops import localasm

    import jax.numpy as jnp

    host_jobs = [jb for jb in jobs if len(jb[3]) > R_MAX]
    dev_jobs = [jb for jb in jobs if len(jb[3]) <= R_MAX]
    for key, lf, rf, reads, gap_est in host_jobs:
        res = _walk_host(lf, rf, reads, gap_est, k, min_cov)
        if res is None:
            res = _dfs_host(lf, rf, reads, gap_est, k, min_cov)
        if res is not None:
            stats.filled += 1
        bridges[key] = res
    if not dev_jobs:
        return

    R = _next_pow2(max(len(jb[3]) for jb in dev_jobs))
    LR = max(max(len(r) for r in jb[3]) for jb in dev_jobs)
    LR = max(LR, k + 1)
    F = max(flank, k + 1)
    limits = [jb[4] + 4 * k + 200 for jb in dev_jobs]
    max_walk = -(-max(limits) // 64) * 64
    G = _next_pow2(len(dev_jobs), lo=4)

    reads_arr = np.full((G, R, LR), kops.BASE_N, np.uint8)
    lf_arr = np.full((G, F), kops.BASE_N, np.uint8)
    rf_arr = np.full((G, F), kops.BASE_N, np.uint8)
    limit_arr = np.zeros((G,), np.int32)
    live_arr = np.zeros((G,), bool)
    for g, (key, lf, rf, reads, gap_est) in enumerate(dev_jobs):
        for ri, r in enumerate(reads):
            codes = kops.codes_from_ascii(
                np.frombuffer(r.encode(), np.uint8)
            )
            reads_arr[g, ri, : len(codes)] = codes
        lfc = kops.codes_from_ascii(np.frombuffer(lf.encode(), np.uint8))
        rfc = kops.codes_from_ascii(np.frombuffer(rf.encode(), np.uint8))
        lf_arr[g, F - len(lfc):] = lfc  # right-aligned: seed = last k codes
        rf_arr[g, : len(rfc)] = rfc
        limit_arr[g] = limits[g]
        live_arr[g] = True

    batch = localasm.GapBatch(
        reads=jnp.asarray(reads_arr),
        lflank=jnp.asarray(lf_arr),
        rflank=jnp.asarray(rf_arr),
        limit=jnp.asarray(limit_arr),
        live=jnp.asarray(live_arr),
    )
    res = localasm.fill_gap_batch(batch, k=k, min_cov=min_cov,
                                  max_walk=max_walk)
    success = np.asarray(res.success)
    fill_len = np.asarray(res.fill_len)
    bases = np.asarray(res.bases)
    branched = np.asarray(res.branched)
    for g, (key, lf, rf, reads, gap_est) in enumerate(dev_jobs):
        if branched[g]:
            # the lockstep walk hit a real branch: greedy may have taken
            # the wrong arm — re-run this gap through the bounded branch
            # DFS (searchFgap:792 explores every arm).  A greedy SUCCESS
            # stays the fallback: the DFS's tighter length window /
            # trace budget must not discard a closure the walk made
            r = _dfs_host(lf, rf, reads, gap_est, k, min_cov)
            if r is None and success[g]:
                seq = "".join(_CODE2CHAR[b] for b in bases[g, : fill_len[g]])
                r = ("fill", seq)
            if r is not None:
                stats.filled += 1
            bridges[key] = r
        elif success[g]:
            seq = "".join(_CODE2CHAR[b] for b in bases[g, : fill_len[g]])
            bridges[key] = ("fill", seq)
            stats.filled += 1
        else:
            bridges[key] = None


def _build_walk_tables(
    lf: str, rf: str, reads: List[str], k: int, min_cov: int
) -> Tuple[Dict[str, Dict[str, int]], Dict[str, int]]:
    """k-mer extension table from the gap reads (both strands) + flanks,
    and the right-flank landing positions (localAsm.c putKmer2DBgraph)."""
    nxt: Dict[str, Dict[str, int]] = {}

    def add_seq(s: str, w: int = 1):
        for i in range(len(s) - k):
            km = s[i : i + k]
            if "N" in km:
                continue
            b = s[i + k]
            if b == "N":
                continue
            d = nxt.setdefault(km, {})
            d[b] = d.get(b, 0) + w

    for r in reads:
        add_seq(r)
        add_seq(_revcomp(r))
    add_seq(lf, w=min_cov)  # flanks always trusted
    add_seq(rf, w=min_cov)

    landing: Dict[str, int] = {}
    for i in range(len(rf) - k + 1):
        km = rf[i : i + k]
        if "N" not in km and km not in landing:
            landing[km] = i
    return nxt, landing


def _walk_host(
    lf: str, rf: str, reads: List[str], gap_est: int, k: int, min_cov: int
) -> Optional[Tuple[str, str]]:
    """Host greedy walk (identical semantics to the device kernel; kept
    for parity tests and as the first, cheap attempt)."""
    nxt, landing = _build_walk_tables(lf, rf, reads, k, min_cov)
    max_len = gap_est + 4 * k + 200
    bridge: List[str] = []
    km = lf[-k:]
    for _ in range(max_len):
        if km in landing and len(bridge) >= k + landing[km]:
            # lf+bridge ends with rf[land:land+k], so the right contig's
            # base 0 aligns at len(bridge) - k - land past the left end
            fill_len = len(bridge) - k - landing[km]
            return ("fill", "".join(bridge)[:fill_len])
        d = nxt.get(km)
        if not d:
            return None
        b, c = max(d.items(), key=lambda kv: (kv[1], kv[0]))
        if c < min_cov:
            return None
        bridge.append(b)
        km = km[1:] + b
    return None


MAX_ROUTES = 10  # localAsm.c MaxRouteNum
TRACE_LIMIT = 4000  # the UPlimit trace-counter bound (localAsm.c)


def _dfs_host(
    lf: str, rf: str, reads: List[str], gap_est: int, k: int, min_cov: int,
    gl_diff: int = 50,
) -> Optional[Tuple[str, str]]:
    """Bounded branch DFS over the gap's mini de Bruijn graph — the
    searchFgap path search (localAsm.c traceAlongDBgraph:614): explore
    EVERY extension with coverage >= min_cov depth-first (not just the
    greedy max), bounded by a trace counter and the [gap-GLDiff,
    gap+GLDiff] length window, collect up to MaxRouteNum flank-to-flank
    routes, and pick the one with the highest average link weight
    (searchFgap:869's maxLink choice)."""
    nxt, landing = _build_walk_tables(lf, rf, reads, k, min_cov)
    max_len = max(gap_est + gl_diff + 2 * k, 10)
    routes: List[Tuple[float, int, str]] = []  # (avg_links, land, bridge)
    counter = [0]

    def dfs(km: str, bridge: List[str], links: int):
        counter[0] += 1
        if counter[0] > TRACE_LIMIT or len(routes) >= MAX_ROUTES:
            return
        if len(bridge) > max_len:
            return
        land = landing.get(km)
        if land is not None and len(bridge) >= k + land:
            fill_len = len(bridge) - k - land
            avg = links / max(len(bridge), 1)
            routes.append((avg, land, "".join(bridge)[:fill_len]))
            return
        d = nxt.get(km)
        if not d:
            return
        # high-coverage extensions first: best routes surface before the
        # trace budget runs out
        for b, c in sorted(d.items(), key=lambda kv: -kv[1]):
            if c < min_cov:
                continue
            bridge.append(b)
            dfs(km[1:] + b, bridge, links + c)
            bridge.pop()

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, max_len + 500))
    try:
        dfs(lf[-k:], [], 0)
    finally:
        sys.setrecursionlimit(old_limit)
    if not routes:
        return None
    # earliest landing on ctg2 first (searchFgap's minEnd), then max
    # average links
    min_land = min(r[1] for r in routes)
    cands = [r for r in routes if r[1] == min_land]
    best = max(cands, key=lambda r: r[0])
    return ("fill", best[2])
