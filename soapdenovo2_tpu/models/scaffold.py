"""Scaff stage: PE links -> contig ordering -> scaffolds.

Host-side counterpart of the reference scaffolder
(standardPregraph/scaffold.c ``call_scaffold:59``, attachPEinfo.c
``connectByPE_grad:384``/``attach1PE:317``, orderContig.c ``Links2Scaf:5766``)
over device-produced bulk data, per the design split of SURVEY.md section 7:
link accumulation is a vectorized segment-reduction; the (small)
chain-ordering decision logic runs host-side rank by rank.

Implemented reference semantics:
  * pairs are consecutive read ids (2i, 2i+1) within a library gradation
  * gap estimate  g = ins - (len1 - pos1) - (len2 - pos2), rejected when
    g < -ins/10 or g > ins  (attach1PE:317)
  * link weights accumulate per (c1, c2) with mirrored twin links
    (add1Connect:198 + cntLookupTable)
  * insert-size re-estimation from same-contig pairs (calcuIS)
  * per-rank pipeline: weak-link deletion -> transitive reduction ->
    repeat masking -> unique-successor linearization -> chain freezing
    (ordering:2351 simplified; the full heap-based general_linearization
    is a later-round item)
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..io import reads as rio
from ..utils import simulate as sim_utils
from . import mapping as mp

log = logging.getLogger("soapdenovo2_tpu.scaff")


def twin_ctg(c: np.ndarray):
    return c ^ 1


@dataclasses.dataclass
class LinkTable:
    """Directed contig links for one gradation (CONNECT analog)."""

    c1: np.ndarray  # (L,) int32 directed contig id
    c2: np.ndarray  # (L,) int32
    weight: np.ndarray  # (L,) int32
    gap: np.ndarray  # (L,) int32 mean gap estimate


def build_links_for_grad(
    read_id: np.ndarray,
    ctg: np.ndarray,
    pos: np.ndarray,
    ctg_len: np.ndarray,
    insert_size: int,
    id_lo: int,
    id_hi: int,
) -> Tuple[LinkTable, Optional[int]]:
    """PE pairs -> weighted links, plus re-estimated insert size.

    Mirrors connectByPE_grad: consecutive (even, odd) read ids where both
    ends mapped.
    """
    sel = (read_id >= id_lo) & (read_id < id_hi)
    rid = read_id[sel]
    c = ctg[sel]
    p = pos[sel]
    order = np.argsort(rid, kind="stable")
    rid, c, p = rid[order], c[order], p[order]
    # find consecutive (2i, 2i+1) pairs
    is_pair = np.zeros(rid.shape, bool)
    if rid.size >= 2:
        first = (rid[:-1] % 2 == 0) & (rid[1:] == rid[:-1] + 1)
        is_pair[:-1] = first
    i1 = np.nonzero(is_pair)[0]
    i2 = i1 + 1
    c1, p1 = c[i1], p[i1]
    c2, p2 = c[i2], p[i2]
    len1 = ctg_len[c1]
    len2 = ctg_len[c2]

    # same-contig pairs re-estimate the insert size (calcuIS)
    same = c2 == twin_ctg(c1)
    obs = (len1[same] - p2[same]) - p1[same]
    new_ins = int(np.median(obs)) if obs.size >= 100 else None

    # cross-contig pairs -> links  c1 -> twin(c2)
    cross = ~same & (c1 != c2)
    g = insert_size - (len1 - p1) - (len2 - p2)
    ok = cross & (g >= -insert_size // 10) & (g <= insert_size)
    a = c1[ok]
    b = twin_ctg(c2[ok])
    gg = g[ok]

    # mirror: link (a -> b) implies (twin(b) -> twin(a)) with same gap
    a_all = np.concatenate([a, twin_ctg(b)])
    b_all = np.concatenate([b, twin_ctg(a)])
    g_all = np.concatenate([gg, gg])

    if a_all.size == 0:
        return (
            LinkTable(*(np.zeros((0,), np.int32) for _ in range(4))),
            new_ins,
        )
    key = a_all.astype(np.int64) << 32 | b_all.astype(np.int64)
    order2 = np.argsort(key, kind="stable")
    key, g_all = key[order2], g_all[order2]
    new = np.ones(key.shape, bool)
    new[1:] = key[1:] != key[:-1]
    grp = np.cumsum(new) - 1
    w = np.bincount(grp)
    gsum = np.bincount(grp, weights=g_all.astype(np.float64))
    uk = key[new]
    return (
        LinkTable(
            c1=(uk >> 32).astype(np.int32),
            c2=(uk & 0xFFFFFFFF).astype(np.int32),
            weight=w.astype(np.int32),
            gap=(gsum / np.maximum(w, 1)).astype(np.int32),
        ),
        new_ins,
    )


# ---------------------------------------------------------------------------
# per-rank ordering
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Scaffold:
    """An ordered chain of directed contigs with gaps between them."""

    ctgs: List[int]
    gaps: List[int]  # len == len(ctgs) - 1


class Scaffolder:
    """Rank-by-rank scaffold builder over directed contigs.

    State: each undirected contig starts as a singleton chain; each rank
    merges chains via filtered PE links (Links2Scaf's ordering loop,
    simplified to unique-successor linearization)."""

    def __init__(self, ctg_len: np.ndarray, cvg: Optional[np.ndarray] = None,
                 min_ctg_len: int = 0):
        self.n_dir = ctg_len.shape[0]
        self.ctg_len = ctg_len
        self.chains: List[Scaffold] = []
        self.mask = np.zeros((self.n_dir,), bool)
        if cvg is not None and cvg.size and (cvg > 0).any():
            # maskRepeatByArc/cvg analog: contigs with > 2x mean coverage
            # are repeat-masked for ordering (loadGraph.c:269 cvg_high)
            mean_cvg = float(np.median(cvg[cvg > 0]))
            self.mask |= cvg > 2.0 * mean_cvg
        if min_ctg_len:
            self.mask |= ctg_len < min_ctg_len
        for t in range(self.n_dir // 2):
            self.chains.append(Scaffold([2 * t], []))

    # -- chain coordinate helpers ------------------------------------------
    def _chain_maps(self):
        """Per directed contig: chain id, orientation within chain,
        distance from chain start to contig start, distance to chain end."""
        cid = np.full((self.n_dir,), -1, np.int64)
        off = np.zeros((self.n_dir,), np.int64)  # dist from chain head
        tail = np.zeros((self.n_dir,), np.int64)  # dist to chain tail
        flip = np.zeros((self.n_dir,), bool)
        for si, sc in enumerate(self.chains):
            total = sum(self.ctg_len[c] for c in sc.ctgs) + sum(
                max(g, 1) for g in sc.gaps
            )
            acc = 0
            for j, c in enumerate(sc.ctgs):
                cl = int(self.ctg_len[c])
                for cc, fl in ((c, False), (twin_ctg(np.int64(c)), True)):
                    cid[cc] = si
                    flip[cc] = fl
                    if not fl:
                        off[cc] = acc
                        tail[cc] = total - acc - cl
                    else:
                        off[cc] = total - acc - cl
                        tail[cc] = acc
                acc += cl + (max(sc.gaps[j], 1) if j < len(sc.gaps) else 0)
        return cid, off, tail, flip

    def add_rank(self, links: LinkTable, pair_cutoff: int,
                 insert_size: int) -> None:
        """One ordering round (ordering:2351, simplified)."""
        if links.c1.size == 0:
            return
        w_ok = links.weight >= pair_cutoff  # deleteWeakCnt:1356
        masked = self.mask[links.c1] | self.mask[links.c2]
        keep = w_ok & ~masked
        c1, c2 = links.c1[keep], links.c2[keep]
        w, gap = links.weight[keep], links.gap[keep]

        cid, off, tail, flip = self._chain_maps()
        # lift links to chain level: (chain1 oriented) -> (chain2 oriented)
        ch1 = cid[c1]
        ch2 = cid[c2]
        ok = (ch1 >= 0) & (ch2 >= 0) & (ch1 != ch2)
        ch1, ch2 = ch1[ok], ch2[ok]
        o1 = flip[c1[ok]]
        o2 = flip[c2[ok]]
        # adjusted gap between chain ends
        g_adj = gap[ok] - tail[c1[ok]] - off[c2[ok]]
        w2 = w[ok]

        # accumulate per (chain1, o1, chain2, o2)
        key = (
            (ch1.astype(np.int64) * 2 + o1) << 32
        ) | (ch2.astype(np.int64) * 2 + o2)
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        w_s = w2[order]
        g_s = g_adj[order]
        new = np.ones(key_s.shape, bool)
        new[1:] = key_s[1:] != key_s[:-1]
        grp = np.cumsum(new) - 1
        wsum = np.bincount(grp, weights=w_s.astype(np.float64))
        gavg = np.bincount(grp, weights=(g_s * w_s).astype(np.float64)) / np.maximum(
            wsum, 1
        )
        uk = key_s[new]
        A = (uk >> 32).astype(np.int64)  # chain1 * 2 + o1
        B = (uk & 0xFFFFFFFF).astype(np.int64)
        W = wsum
        G = gavg.astype(np.int64)

        # transitive reduction (removeTransitive:1765, simplified): drop
        # A->C if A->B and B->C exist with gap(A,B)+len(B)+gap(B,C) ~ gap(A,C)
        linkset: Dict[Tuple[int, int], Tuple[float, int]] = {}
        for a, b, ww, gg in zip(A, B, W, G):
            linkset[(int(a), int(b))] = (float(ww), int(gg))
        chain_total = np.array(
            [
                sum(self.ctg_len[c] for c in sc.ctgs)
                + sum(max(g, 1) for g in sc.gaps)
                for sc in self.chains
            ],
            np.int64,
        )

        def chain_len_of(x):
            return int(chain_total[x >> 1])

        drop = set()
        out_links: Dict[int, List[int]] = {}
        for (a, b) in linkset:
            out_links.setdefault(a, []).append(b)
        tol = max(insert_size // 5, 100)
        for a, outs in out_links.items():
            if len(outs) < 2:
                continue
            for b in outs:
                for cnode in outs:
                    if cnode == b:
                        continue
                    ab = linkset[(a, b)][1]
                    if (b, cnode) in linkset:
                        expect = ab + chain_len_of(b) + linkset[(b, cnode)][1]
                        if abs(expect - linkset[(a, cnode)][1]) < tol:
                            drop.add((a, cnode))
        for d in drop:
            linkset.pop(d, None)

        # unique-successor linearization (linearC2C / freezing, simplified):
        succ: Dict[int, Tuple[int, int]] = {}
        pred_count: Dict[int, int] = {}
        outs_by_a: Dict[int, List[Tuple[int, float, int]]] = {}
        for (a, b), (ww, gg) in linkset.items():
            outs_by_a.setdefault(a, []).append((b, ww, gg))
        for a, cand in outs_by_a.items():
            if len(cand) == 1:
                b, ww, gg = cand[0]
                succ[a] = (b, gg)
                pred_count[b] = pred_count.get(b, 0) + 1
        # drop ambiguous predecessors
        succ = {
            a: (b, gg)
            for a, (b, gg) in succ.items()
            if pred_count.get(b, 0) == 1
        }
        # drop mutual conflicts via twin symmetry: succ on (chain,o) implies
        # the mirrored pred on (chain,1-o); keep consistent ones only
        merged: List[Scaffold] = []
        used = np.zeros((len(self.chains),), bool)
        # build next-chain mapping on oriented chains
        nxt = dict(succ)
        has_pred = {b for (b, _) in nxt.values()}
        for start in list(nxt.keys()) + [
            i for i in range(2 * len(self.chains))
        ]:
            ch = start >> 1
            if used[ch]:
                continue
            if start in has_pred:
                continue
            # walk
            path = [start]
            gaps = []
            used[ch] = True
            cur = start
            while cur in nxt:
                b, gg = nxt[cur]
                if used[b >> 1]:
                    break
                path.append(b)
                gaps.append(int(gg))
                used[b >> 1] = True
                cur = b
            merged.append(self._stitch(path, gaps))
        self.chains = merged

    def _stitch(self, oriented_chains: List[int], gaps: List[int]) -> Scaffold:
        ctgs: List[int] = []
        out_gaps: List[int] = []
        for idx, oc in enumerate(oriented_chains):
            ch, o = oc >> 1, oc & 1
            sc = self.chains[ch]
            cl = sc.ctgs if not o else [
                int(twin_ctg(np.int64(c))) for c in reversed(sc.ctgs)
            ]
            gl = sc.gaps if not o else list(reversed(sc.gaps))
            if idx > 0:
                out_gaps.append(gaps[idx - 1])
            ctgs.extend(cl)
            out_gaps.extend(gl)
        return Scaffold(ctgs=ctgs, gaps=out_gaps)

    def result(self) -> List[Scaffold]:
        return [c for c in self.chains if c.ctgs]


# ---------------------------------------------------------------------------
# stage driver + output
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ScaffResult:
    scaffolds: List[Scaffold]
    seqs: List[str]
    stats: dict
    gap_seqs: List[str] = dataclasses.field(default_factory=list)
    grads_links: List[LinkTable] = dataclasses.field(default_factory=list)


def run_scaff(
    map_result: mp.MapResult,
    contig_seqs: List[str],
    min_ctg_len: int = 0,
    contig_cvg: Optional[np.ndarray] = None,
    fill: bool = False,
    progress: bool = True,
) -> ScaffResult:
    n = len(contig_seqs)
    ctg_len = np.zeros((2 * n,), np.int64)
    for t, s in enumerate(contig_seqs):
        ctg_len[2 * t] = ctg_len[2 * t + 1] = len(s)
    cvg_dir = None
    if contig_cvg is not None:
        cvg_dir = np.repeat(np.asarray(contig_cvg, np.float64), 2)
    sc = Scaffolder(ctg_len, cvg=cvg_dir, min_ctg_len=min_ctg_len)

    id_lo = 0
    # grads sorted by insert size; group equal ranks together like
    # Links2Scaf's rank loop
    grads = map_result.pe_grads
    grads_links: List[LinkTable] = []
    for g in grads:
        links, new_ins = build_links_for_grad(
            map_result.read_id, map_result.ctg, map_result.pos,
            ctg_len, g.insert_size, id_lo, g.end_read_id,
        )
        grads_links.append(links)
        ins = new_ins if new_ins else g.insert_size
        if new_ins and progress:
            log.info("grad ins %d re-estimated to %d", g.insert_size, ins)
        sc.add_rank(links, g.pair_num_cutoff or 3, ins)
        id_lo = g.end_read_id

    scaffolds = sc.result()
    gap_seqs: List[str] = []
    if fill and len(map_result.gap_reads):
        from . import gapfill

        seqs, gap_seqs, fstats = gapfill.fill_gaps(
            scaffolds, contig_seqs, map_result.gap_reads, progress=progress,
        )
    else:
        seqs = [scaffold_sequence(s, contig_seqs) for s in scaffolds]
    stats = sim_utils.assembly_stats(seqs)
    if progress:
        log.info("scaff: %s", stats)
    return ScaffResult(
        scaffolds=scaffolds, seqs=seqs, stats=stats, gap_seqs=gap_seqs,
        grads_links=grads_links,
    )


_RC = bytes.maketrans(b"ACGTN", b"TGCAN")


def _dir_ctg_seq(c: int, contig_seqs: List[str]) -> str:
    s = contig_seqs[c >> 1]
    if c & 1:
        return s.encode().translate(_RC)[::-1].decode()
    return s


def scaffold_sequence(sc: Scaffold, contig_seqs: List[str]) -> str:
    parts = []
    for j, c in enumerate(sc.ctgs):
        parts.append(_dir_ctg_seq(int(c), contig_seqs))
        if j < len(sc.gaps):
            parts.append("N" * max(int(sc.gaps[j]), 1))
    return "".join(parts)
