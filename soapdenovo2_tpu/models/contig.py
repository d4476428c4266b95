"""Contig stage: edge-graph cleaning, bubble popping, linearization.

Host-side counterpart of standardPregraph/contig.c ``call_heavygraph:61``
over the (small) edge graph, per the design split: device kernels produce
the k-mer graph and bulk link data; the contig-graph decision passes run
host-side (SURVEY.md section 7, translation principle 3).

Reference semantics implemented:
  removeWeakEdges   (cutTip_graph.c:140)  short inner edges, single weak
                                          arc on both sides, to fixpoint
  removeLowCovEdges (cutTip_graph.c:222)  short low-cvg inner edges
  cutTipsInGraph    (cutTip_graph.c:526)  unreliable-tip walk, fixpoint
  linearConcatenate (concatenateEdge.c:264) 1-in/1-out chain merge
  bubblePinch       (bubble.c:2389)       simplified tour-bus: parallel
                                          single-edge paths merged when
                                          sequences align >= 0.9
The directed-edge + twin representation matches the reference's in-memory
edge_array/bal_edge model after loadEdge (loadPreGraph.c:448).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils import simulate as sim_utils
from . import edges as edge_mod
from . import pregraph as pg

log = logging.getLogger("soapdenovo2_tpu.contig")

_BASE_CHARS = np.frombuffer(b"ACGT", np.uint8)


@dataclasses.dataclass
class ContigGraph:
    """Directed edges with twins + arcs (host representation)."""

    k: int
    seqs: List[np.ndarray]  # per-edge full base codes (uint8, len >= k)
    cvg10: np.ndarray  # (E,) int32
    twin: np.ndarray  # (E,) int32
    deleted: np.ndarray  # (E,) bool
    # arcs in dict-of-dicts: arcs[e] = {to: mult}
    arcs: List[Dict[int, int]]
    marker: Optional[np.ndarray] = None  # markOnEdge counts
    # (keep, deleted, similarity, snp_positions) from bubble merges
    bubbles: List[tuple] = dataclasses.field(default_factory=list)

    @property
    def n_edges(self) -> int:
        return len(self.seqs)

    def edge_len(self, e: int) -> int:
        """Reference edge->length: bases beyond the first (k-1)... the
        reference counts bases beyond the first k-mer; full seq = len+k."""
        return len(self.seqs[e]) - self.k

    def seq_str(self, e: int) -> str:
        return self.seqs[e].tobytes().translate(
            bytes.maketrans(bytes(range(4)), b"ACGT")
        ).decode()

    def in_arcs(self, e: int) -> Dict[int, int]:
        """Incoming arcs of e = arcs of twin(e), mirrored."""
        return self.arcs[self.twin[e]]

    def live_arcs(self, e: int) -> List[Tuple[int, int]]:
        return [
            (t, m) for t, m in self.arcs[e].items() if not self.deleted[t]
        ]

    def destroy_edge(self, e: int) -> None:
        """destroyEdge (cutTip_graph.c:43): delete an edge and its twin."""
        self.deleted[e] = True
        self.deleted[self.twin[e]] = True


def from_pregraph(pre: pg.PregraphResult) -> ContigGraph:
    eg = pre.edges
    seqs = []
    for e in range(eg.n_edges):
        head = _kmer_codes(eg.first_kmer[e], eg.k)
        tail = eg.seq_bases[eg.seq_off[e] : eg.seq_off[e + 1]]
        seqs.append(np.concatenate([head, tail]).astype(np.uint8))
    arcs: List[Dict[int, int]] = [dict() for _ in range(eg.n_edges)]
    n = int(pre.arcs.n)
    keys = np.asarray(pre.arcs.keys)[:n].astype(np.int64)
    mult = np.asarray(pre.arcs.mult)[:n]
    raw: Dict[Tuple[int, int], int] = {}
    for (f, t), m in zip(keys, mult):
        if f < eg.n_edges and t < eg.n_edges:
            raw[(int(f), int(t))] = int(m)
    twin = eg.twin
    for (f, t), m in raw.items():
        # loadPreGraph.c add1Arc:581 — drop inconsistent joins (edges that
        # do not share a junction k-mer) and give an arc and its
        # reverse-complement mirror one shared multiplicity.
        if not (
            eg.to_node[f] == eg.from_node[t]
            and eg.to_orient[f] == eg.from_orient[t]
        ):
            continue
        w = m + raw.get((int(twin[t]), int(twin[f])), 0)
        arcs[f][t] = w
        arcs[int(twin[t])][int(twin[f])] = w
    return ContigGraph(
        k=eg.k,
        seqs=seqs,
        cvg10=eg.cvg10.copy(),
        twin=eg.twin.copy(),
        deleted=np.zeros((eg.n_edges,), bool),
        arcs=arcs,
        marker=pre.marker_on_edge.copy() if pre.marker_on_edge is not None else None,
    )


def _kmer_codes(words: np.ndarray, k: int) -> np.ndarray:
    from ..ops import kmer as kops

    s = kops.kmer_to_string(words, k)
    return kops.codes_from_ascii(np.frombuffer(s.encode(), np.uint8))


# ---------------------------------------------------------------------------
# cleaning passes
# ---------------------------------------------------------------------------


def remove_weak_edges(g: ContigGraph, len_cutoff: int, multi_cutoff: int = 1) -> int:
    """cutTip_graph.c:140 — to fixpoint."""
    total = 0
    changed = True
    while changed:
        changed = False
        for e in range(g.n_edges):
            if g.deleted[e] or g.edge_len(e) == 0 or g.edge_len(e) > len_cutoff:
                continue
            if g.twin[e] == e:
                continue
            right = g.live_arcs(e)
            if len(right) != 1 or right[0][1] > multi_cutoff:
                continue
            left = g.live_arcs(g.twin[e])
            if len(left) != 1 or left[0][1] > multi_cutoff:
                continue
            g.destroy_edge(e)
            total += 1
            changed = True
    return total


def remove_low_cov_edges(g: ContigGraph, len_cutoff: int, cov_cutoff: int) -> int:
    """cutTip_graph.c:222 — single pass over short low-coverage inner edges."""
    n = 0
    for e in range(g.n_edges):
        if (
            g.deleted[e]
            or g.cvg10[e] == 0
            or g.cvg10[e] > cov_cutoff * 10
            or g.edge_len(e) >= len_cutoff
            or g.twin[e] == e
            or g.edge_len(e) == 0
        ):
            continue
        if not g.live_arcs(e) or not g.live_arcs(g.twin[e]):
            continue
        g.destroy_edge(e)
        n += 1
    return n


def _is_unreliable_tip(g: ContigGraph, e: int, cut_len: int) -> bool:
    """isUnreliableTip (cutTip_graph.c:280), non-strict variant."""
    if g.deleted[e] or g.twin[e] == e:
        return False
    if g.live_arcs(g.twin[e]):
        return False  # has incoming arcs: not a dangling start
    cur = e
    length = 0
    active_mult = 0
    left_n = 0
    guard = 0
    while cur >= 0:
        guard += 1
        if guard > g.n_edges + 2:
            return False
        left = g.live_arcs(g.twin[cur])
        right = g.live_arcs(cur)
        left_n = len(left)
        if left_n > 1 or len(right) > 1:
            break
        length += g.edge_len(cur)
        if right:
            active_mult = right[0][1]
            cur = right[0][0]
        else:
            cur = -1
    if length >= cut_len:
        return False
    if cur < 0:
        return True  # dangling chain shorter than cut_len
    # non-strict: attachment edge's length may absorb the tip
    if left_n < 2:
        length += g.edge_len(cur)
        return length < cut_len
    if active_mult == 1:
        return True
    max_mult = max((m for _, m in g.live_arcs(g.twin[cur])), default=0)
    return max_mult > active_mult


def cut_tips_in_graph(g: ContigGraph, cut_len: int = 0) -> int:
    """cutTipsInGraph (cutTip_graph.c:526) to fixpoint."""
    if not cut_len:
        cut_len = 2 * g.k
    total = 0
    changed = True
    while changed:
        changed = False
        for e in range(g.n_edges):
            if g.deleted[e]:
                continue
            if _is_unreliable_tip(g, e, cut_len):
                g.destroy_edge(e)
                total += 1
                changed = True
    return total


# ---------------------------------------------------------------------------
# repeat resolution by read paths (-R)
# ---------------------------------------------------------------------------


def solve_reps(g: ContigGraph, paths: List[np.ndarray],
               max_branch: int = 20) -> int:
    """splitReps.c ``solveReps:591``: split repeat edges whose in/out
    pairings are resolved by read paths.

    A repeat edge e with in-degree == out-degree >= 2 is solvable when
    every upstream edge has out-degree 1 and every downstream edge has
    in-degree 1 (``solvable:237``), and the involved edge set has no
    duplicates or twin collisions (``interferingCheck``).  Where the
    reference checks read-id membership on all three edges
    (``cntByReads:172``), we count ordered (left, e, right) triples in the
    recorded read paths — strictly stronger evidence.
    """
    # triple support counts from read paths
    support: Dict[Tuple[int, int, int], int] = {}
    for path in paths:
        for t in range(len(path) - 2):
            key = (int(path[t]), int(path[t + 1]), int(path[t + 2]))
            support[key] = support.get(key, 0) + 1

    n_split = 0
    n_orig = g.n_edges
    for e in range(n_orig):
        if g.deleted[e] or g.twin[e] == e:
            continue
        rights = [t for t, _ in g.live_arcs(e)]
        lefts = [int(g.twin[t]) for t, _ in g.live_arcs(int(g.twin[e]))]
        d = len(lefts)
        if d < 2 or len(rights) != d or d > max_branch:
            continue
        ok = True
        for r in rights:
            if g.twin[r] == r or len(g.live_arcs(int(g.twin[r]))) != 1:
                ok = False
                break
        for l in lefts:
            if not ok or g.twin[l] == l or len(g.live_arcs(l)) != 1:
                ok = False
                break
        if not ok:
            continue
        involved = [e] + lefts + rights
        if len(set(involved)) != len(involved):
            continue
        if any(int(g.twin[x]) in involved for x in involved):
            continue
        # pair lefts with rights by read support (first supported right);
        # a read may traverse the triple in either strand direction
        go = [
            [
                support.get((l, e, r), 0)
                + support.get(
                    (int(g.twin[r]), int(g.twin[e]), int(g.twin[l])), 0
                )
                for r in rights
            ]
            for l in lefts
        ]
        used_r = set()
        pairs = []
        for i in range(1, d):
            j = next(
                (j for j in range(d) if go[i][j] > 0 and j not in used_r),
                None,
            )
            if j is None:
                pairs = None
                break
            used_r.add(j)
            pairs.append((i, j))
        if pairs is None:
            continue
        for i, j in pairs:
            _split_copy(g, e, lefts[i], rights[j])
        n_split += 1
    return n_split


def _split_copy(g: ContigGraph, e: int, left: int, right: int) -> None:
    """Copy edge e to a new edge serving only the (left -> right) route
    (split1edge/cp1edge/moveArc2cp)."""
    t = int(g.twin[e])
    new_e = g.n_edges
    new_t = new_e + 1
    g.seqs.append(g.seqs[e].copy())
    g.seqs.append(g.seqs[t].copy())
    g.cvg10 = np.append(g.cvg10, [g.cvg10[e], g.cvg10[t]])
    g.twin = np.append(g.twin, [new_t, new_e]).astype(g.twin.dtype)
    g.deleted = np.append(g.deleted, [False, False])
    g.arcs.append({})
    g.arcs.append({})
    if g.marker is not None:
        g.marker = np.append(g.marker, [g.marker[e], g.marker[t]])

    tl, tr = int(g.twin[left]), int(g.twin[right])
    # move left->e to left->new_e (mirror: t->tl becomes new_t->tl)
    w1 = g.arcs[left].pop(e, 1)
    g.arcs[t].pop(tl, None)
    g.arcs[left][new_e] = w1
    g.arcs[new_t][tl] = w1
    # move e->right to new_e->right (mirror: tr->t becomes tr->new_t)
    w2 = g.arcs[e].pop(right, 1)
    g.arcs[tr].pop(t, None)
    g.arcs[new_e][right] = w2
    g.arcs[tr][new_t] = w2


# ---------------------------------------------------------------------------
# bubble popping (simplified tour-bus)
# ---------------------------------------------------------------------------


def _seq_similarity(a: np.ndarray, b: np.ndarray, band: int = 16) -> float:
    """Banded edit-distance similarity (bubble.c compareSequences:509)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > band:
        return 0.0
    big = 1 << 20
    prev = np.full((lb + 1,), big, np.int32)
    width = band
    prev[: width + 1] = np.arange(min(width + 1, lb + 1))
    for i in range(1, la + 1):
        cur = np.full((lb + 1,), big, np.int32)
        j_lo = max(1, i - width)
        j_hi = min(lb, i + width)
        if i <= width:
            cur[0] = i
        sub = prev[j_lo - 1 : j_hi] + (a[i - 1] != b[j_lo - 1 : j_hi])
        dele = prev[j_lo : j_hi + 1] + 1
        cur[j_lo : j_hi + 1] = np.minimum(sub, dele)
        # insertion needs a serial scan within the band
        for j in range(j_lo, j_hi + 1):
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    d = int(prev[lb])
    return 1.0 - d / max(la, lb)


def _batched_similarity(g: ContigGraph, pairs: List[Tuple[int, int]]):
    """Score candidate bubble pairs with the batched banded-DP kernel
    (ops/align.py); python fallback for overlong sequences."""
    if not pairs:
        return []
    from ..ops import align

    maxlen = max(
        max(len(g.seqs[a]), len(g.seqs[b])) for a, b in pairs
    )
    if maxlen > 2048:
        return [
            _seq_similarity(g.seqs[a], g.seqs[b]) for a, b in pairs
        ]
    n = len(pairs)
    a_arr = np.zeros((n, maxlen), np.uint8)
    b_arr = np.zeros((n, maxlen), np.uint8)
    a_len = np.zeros((n,), np.int32)
    b_len = np.zeros((n,), np.int32)
    for i, (a, b) in enumerate(pairs):
        sa, sb = g.seqs[a], g.seqs[b]
        a_arr[i, : len(sa)] = sa
        b_arr[i, : len(sb)] = sb
        a_len[i], b_len[i] = len(sa), len(sb)
    return align.banded_similarity(a_arr, b_arr, a_len, b_len)


def bubble_pinch(g: ContigGraph, similarity: float = 0.90,
                 max_node_len: Optional[int] = None) -> int:
    """Merge simple 2-path bubbles: pairs of parallel edges with the same
    predecessor and successor whose sequences align above ``similarity``.
    The lower-coverage path is deleted and its weight folded into the
    survivor (simplified bubble.c tour-bus; full path-bubbles in a later
    iteration)."""
    if max_node_len is None:
        max_node_len = 6 * g.k
    merged = 0
    # group edges by (pred, succ)
    groups: Dict[Tuple[int, int], List[int]] = {}
    for e in range(g.n_edges):
        if g.deleted[e] or g.twin[e] == e:
            continue
        right = g.live_arcs(e)
        left = g.live_arcs(g.twin[e])
        if len(right) != 1 or len(left) != 1:
            continue
        if g.edge_len(e) > max_node_len:
            continue
        pred = g.twin[left[0][0]]  # actual predecessor edge
        succ = right[0][0]
        groups.setdefault((int(pred), int(succ)), []).append(e)

    # phase 1: collect candidate pairs, score them in one batched device
    # call (Pallas banded-DP kernel; bubble.c compareSequences:509)
    cand: List[Tuple[int, int]] = []
    for (pred, succ), members in groups.items():
        if len(members) < 2:
            continue
        members.sort(key=lambda e: (-int(g.cvg10[e]), e))
        keep = members[0]
        for e in members[1:]:
            if e != g.twin[keep]:
                cand.append((keep, e))
    sims = _batched_similarity(g, cand)

    for (keep, e), sim in zip(cand, sims):
        if g.deleted[e] or g.deleted[keep]:
            continue
        if sim >= similarity:
            # record the merged variant (SNP sites when lengths match) —
            # feeds *.bubbleInScaff (the reference calls SNPs from bubble
            # contigs during scaffolding, orderContig.c removeBubbleCtg)
            if len(g.seqs[keep]) == len(g.seqs[e]):
                snps = np.nonzero(g.seqs[keep] != g.seqs[e])[0].tolist()
            else:
                snps = []
            g.bubbles.append((int(keep), int(e), float(sim), snps))
            # fold coverage into the survivor (cleanUpRedundancy merges
            # read intervals; we approximate by coverage addition)
            lk, le = len(g.seqs[keep]), len(g.seqs[e])
            g.cvg10[keep] = min(
                16000,
                int((g.cvg10[keep] * lk + g.cvg10[e] * le) / max(lk, 1)),
            )
            g.cvg10[g.twin[keep]] = g.cvg10[keep]
            g.destroy_edge(e)
            merged += 1
    return merged


def bubble_pinch_paths(g: ContigGraph, similarity: float = 0.90,
                       max_depth: int = 4,
                       max_len: Optional[int] = None,
                       max_paths: int = 24) -> int:
    """Multi-edge path bubbles (the tour-bus case, bubble.c tourBus:2347).

    For every edge with >=2 outgoing arcs, enumerate bounded simple arc
    paths; two paths sharing source and terminal edges but no interior
    edges form a bubble.  Interior sequences are scored with the batched
    banded-DP kernel; the lower-coverage path's private edges are deleted
    (the merge direction of comparePaths/cleanUpRedundancy, with coverage
    folded instead of read-interval remapping).
    """
    if max_len is None:
        max_len = 8 * g.k
    cand_pairs: List[Tuple[Tuple[int, ...], Tuple[int, ...]]] = []

    def paths_from(src: int) -> List[Tuple[int, ...]]:
        out: List[Tuple[int, ...]] = []

        def dfs(cur: int, path: Tuple[int, ...], blen: int):
            if len(out) >= max_paths:
                return
            for t, _m in g.live_arcs(cur):
                if t in path or t == int(g.twin[cur]):
                    continue
                nb = blen + g.edge_len(t)
                if len(path) >= 1:  # t could terminate a bubble
                    out.append(path + (t,))
                if nb <= max_len and len(path) < max_depth:
                    dfs(t, path + (t,), nb)

        dfs(src, (src,), 0)
        return out

    for src in range(g.n_edges):
        if g.deleted[src]:
            continue
        if len(g.live_arcs(src)) < 2:
            continue
        paths = paths_from(src)
        # group by terminal edge; paths = (src, interior..., terminal)
        by_term: Dict[int, List[Tuple[int, ...]]] = {}
        for p in paths:
            if len(p) >= 3:  # need at least one interior edge
                by_term.setdefault(p[-1], []).append(p)
        for term, group in by_term.items():
            if len(group) < 2:
                continue
            for i in range(len(group)):
                for j in range(i + 1, len(group)):
                    a, b = group[i], group[j]
                    ia, ib = set(a[1:-1]), set(b[1:-1])
                    if ia & ib:
                        continue
                    if any(int(g.twin[x]) in ib for x in ia):
                        continue
                    cand_pairs.append((a, b))

    if not cand_pairs:
        return 0

    def interior_seq(p: Tuple[int, ...]) -> Optional[np.ndarray]:
        segs = []
        for idx, e in enumerate(p[1:-1]):
            s = g.seqs[e]
            segs.append(s if idx == 0 else s[g.k :])
        if not segs:
            return None
        return np.concatenate(segs)

    # batched scoring
    seqs_a, seqs_b, keep_meta = [], [], []
    for a, b in cand_pairs:
        sa, sb = interior_seq(a), interior_seq(b)
        if sa is None or sb is None or max(len(sa), len(sb)) > 2048:
            continue
        seqs_a.append(sa)
        seqs_b.append(sb)
        keep_meta.append((a, b))
    if not seqs_a:
        return 0
    from ..ops import align

    L = max(max(len(s) for s in seqs_a), max(len(s) for s in seqs_b))
    n = len(seqs_a)
    a_arr = np.zeros((n, L), np.uint8)
    b_arr = np.zeros((n, L), np.uint8)
    a_len = np.zeros((n,), np.int32)
    b_len = np.zeros((n,), np.int32)
    for i in range(n):
        a_arr[i, : len(seqs_a[i])] = seqs_a[i]
        b_arr[i, : len(seqs_b[i])] = seqs_b[i]
        a_len[i], b_len[i] = len(seqs_a[i]), len(seqs_b[i])
    sims = align.banded_similarity(a_arr, b_arr, a_len, b_len)

    def path_private(path: Tuple[int, ...]) -> bool:
        """Loser edges may only be deleted if they have no connections
        outside the path (a shared repeat edge must survive — the
        reference remaps read intervals instead of deleting)."""
        for idx in range(1, len(path) - 1):
            e = path[idx]
            outs = {t for t, _ in g.live_arcs(e)}
            ins = {int(g.twin[t]) for t, _ in g.live_arcs(int(g.twin[e]))}
            if outs != {path[idx + 1]} or ins != {path[idx - 1]}:
                return False
        return True

    merged = 0
    for (a, b), sim in zip(keep_meta, sims):
        if sim < similarity:
            continue
        ia = [e for e in a[1:-1] if not g.deleted[e]]
        ib = [e for e in b[1:-1] if not g.deleted[e]]
        if len(ia) != len(a) - 2 or len(ib) != len(b) - 2:
            continue  # partially consumed by an earlier merge
        cov_a = min((int(g.cvg10[e]) for e in ia), default=0)
        cov_b = min((int(g.cvg10[e]) for e in ib), default=0)
        loser_path = b if cov_b <= cov_a else a
        if not path_private(loser_path):
            continue
        for e in loser_path[1:-1]:
            g.destroy_edge(e)
        merged += 1
    return merged


# ---------------------------------------------------------------------------
# linearization
# ---------------------------------------------------------------------------


def linear_concatenate(g: ContigGraph) -> int:
    """concatenateEdge.c linearConcatenate:264 — merge unique-successor
    chains.  Returns number of merges."""
    merged = 0
    changed = True
    while changed:
        changed = False
        for e in range(g.n_edges):
            if g.deleted[e]:
                continue
            right = g.live_arcs(e)
            if len(right) != 1:
                continue
            nxt = right[0][0]
            if nxt == e or nxt == g.twin[e] or g.deleted[nxt]:
                continue
            left_of_next = g.live_arcs(g.twin[nxt])
            if len(left_of_next) != 1:
                continue
            # sanity: sequences must overlap by k (shared junction k-mer)
            if not np.array_equal(g.seqs[e][-g.k :], g.seqs[nxt][: g.k]):
                continue
            _merge_pair(g, e, nxt)
            merged += 1
            changed = True
    return merged


def _merge_pair(g: ContigGraph, e1: int, e2: int) -> None:
    """Merge e2 into e1 (and mirror on twins)."""
    t1, t2 = int(g.twin[e1]), int(g.twin[e2])
    l1, l2 = g.edge_len(e1), g.edge_len(e2)
    new_seq = np.concatenate([g.seqs[e1], g.seqs[e2][g.k :]])
    if l1 + l2 > 0:
        cvg = (g.cvg10[e1] * l1 + g.cvg10[e2] * l2) // max(l1 + l2, 1)
    else:
        cvg = g.cvg10[e1]
    g.seqs[e1] = new_seq
    g.seqs[t1] = np.concatenate([g.seqs[t2], g.seqs[t1][g.k :]])
    g.cvg10[e1] = g.cvg10[t1] = cvg
    # outgoing arcs of the merged edge = e2's; e1's old arc to e2 is dropped.
    g.arcs[e1] = g.arcs[e2]
    g.arcs[e2] = {}
    g.arcs[t2] = {}
    # mirrored arcs of e2's successors pointed at t2; retarget them to t1
    # (concatenateEdge.c: parc->bal_arc->to_ed = bal_ed)
    for s in list(g.arcs[e1].keys()):
        d = g.arcs[int(g.twin[s])]
        if t2 in d:
            d[t1] = d.get(t1, 0) + d.pop(t2)
    g.deleted[e2] = True
    g.deleted[t2] = True
    if g.marker is not None:
        g.marker[e1] = min(255, int(g.marker[e1]) + int(g.marker[e2]))
        g.marker[t1] = g.marker[e1]


# ---------------------------------------------------------------------------
# stage driver + output
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ContigResult:
    graph: ContigGraph
    stats: dict


def run_contig(
    pre: pg.PregraphResult,
    merge_bubbles: bool = True,
    de_low_edge: int = 1,
    progress: bool = True,
) -> ContigResult:
    return run_contig_graph(
        from_pregraph(pre), merge_bubbles=merge_bubbles,
        de_low_edge=de_low_edge, paths=pre.paths, progress=progress,
    )


def run_contig_graph(
    g: ContigGraph,
    merge_bubbles: bool = True,
    de_low_edge: int = 1,
    paths: Optional[List[np.ndarray]] = None,
    progress: bool = True,
) -> ContigResult:
    """contig.c call_heavygraph:61 pipeline over a loaded edge graph."""
    k = g.k
    n_reps = solve_reps(g, paths) if paths else 0
    if progress and paths:
        log.info("solveReps: %d repeat(s) split", n_reps)
    n_weak = remove_weak_edges(g, 2 * k, 1)
    n_low = remove_low_cov_edges(g, 2 * k, de_low_edge) if de_low_edge else 0
    linear_concatenate(g)
    n_bub = 0
    if merge_bubbles:
        # iterate pinch+linearize: cascaded/nested bubbles collapse into
        # simple ones after each linearization (tour-bus convergence)
        for _ in range(5):
            n = bubble_pinch(g)
            linear_concatenate(g)
            n += bubble_pinch_paths(g)
            linear_concatenate(g)
            n_bub += n
            if n == 0:
                break
    n_tip = cut_tips_in_graph(g)
    linear_concatenate(g)
    contigs = contig_sequences(g)
    stats = sim_utils.assembly_stats([s for _, s, _ in contigs])
    stats.update(
        weak_removed=n_weak, lowcov_removed=n_low, bubbles=n_bub, tips=n_tip
    )
    if progress:
        log.info("contig: %s", stats)
    return ContigResult(graph=g, stats=stats)


def contig_records(
    g: ContigGraph, min_len: int = 0
) -> List[Tuple[int, str, float, int]]:
    """One record per undirected live edge: (id, seq, cvg, fwd_edge).
    Of each twin pair, the direction with the lexicographically smaller
    sequence is emitted (deterministic tiebreak; the reference's choice is
    thread-order dependent).  ``fwd_edge`` is the directed edge whose
    orientation matches the emitted sequence (its twin is the contig's
    reverse complement)."""
    out = []
    cid = 0
    for e in range(g.n_edges):
        if g.deleted[e]:
            continue
        t = int(g.twin[e])
        if t < e and not g.deleted[t]:
            continue  # emitted via its twin
        s = g.seq_str(e)
        fwd = e
        if t != e and not g.deleted[t]:
            s2 = g.seq_str(t)
            if s2 < s:
                s = s2
                fwd = t
        if len(s) < min_len:
            continue
        cid += 1
        out.append((cid, s, g.cvg10[e] / 10.0, fwd))
    return out


def contig_sequences(g: ContigGraph, min_len: int = 0) -> List[Tuple[int, str, float]]:
    """One record per undirected live edge: (id, seq, cvg) — see
    contig_records."""
    return [(c, s, v) for c, s, v, _ in contig_records(g, min_len)]
