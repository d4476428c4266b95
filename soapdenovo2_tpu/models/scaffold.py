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
  * per-rank pipeline (ordering:2351): weak-link deletion (deleteWeakCnt,
    weakPE policy of Links2Scaf:5865-5905) -> transitive reduction
    (removeTransitive:1765) -> subgraph linearization
    (general_linearization:8123, strict then non-strict on the last rank)
    -> puzzle masking (maskPuzzle:1291) -> chain freezing (freezing:3083
    as unique-successor merging)
  * long-insert ranks: junction-support scaffold breaking
    (detectBreakScaff:9141) before ordering
  * final rank: masked-contig recovery into gaps (recoverMask:2682,
    bounded route search like traceAlongConnect searchPath.c:109)
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..io import reads as rio
from ..io.files import gap_span, is_splice, splice_gap, splice_overlap
from ..utils import simulate as sim_utils
from . import mapping as mp

log = logging.getLogger("soapdenovo2_tpu.scaff")


def twin_ctg(c: np.ndarray):
    return c ^ 1


def _fnv1a(s: str) -> int:
    """64-bit FNV-1a of a sequence string (never returns 0)."""
    h = 0xCBF29CE484222325
    for ch in s.encode():
        h ^= ch
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h or 1


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

    # same-contig pairs re-estimate the insert size: calcuIS
    # (attachPEinfo.c) = mean, then mean over observations within 3*SD
    # of it (sample SD, C integer division semantics)
    same = c2 == twin_ctg(c1)
    obs = ((len1[same] - p2[same]) - p1[same]).astype(np.int64)
    new_ins = None
    if obs.size >= 100:
        avg = int(obs.sum() // obs.size)
        sd = int(np.sqrt(((obs - avg) ** 2).sum() // (obs.size - 1)))
        if sd == 0:
            new_ins = avg
        else:
            keep = np.abs(obs - avg) < 3 * sd
            new_ins = (
                int(obs[keep].sum() // keep.sum()) if keep.any() else None
            )

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


# ------------------------------------------------------------------
# device PE2Links (attachPEinfo.c:317-384 semantics on device): the
# host numpy segment-reduce above is exact but single-threaded — fine
# to ~10M links, after which the reference streams it over threads.
# This kernel keeps everything int32 (no x64 on device): composite
# keys sort via two stable passes, and per-link gap sums split into
# 8-bit-low/high int32 accumulators so the host reconstructs the exact
# integer mean the numpy path computes.
# ------------------------------------------------------------------

def _links_device_kernel():
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=(
        "insert_size", "link_cap", "obs_cap"))
    def kernel(read_id, c, p, ctg_len, id_lo, id_hi, insert_size: int,
               link_cap: int, obs_cap: int):
        n = read_id.shape[0]
        big = jnp.int32(2**31 - 1)
        rid = jnp.where((read_id >= id_lo) & (read_id < id_hi),
                        read_id.astype(jnp.int32), big)
        # fused multi-operand sorts (lax.sort carries the payload through
        # the network — cheaper than argsort + three 24M-row gathers);
        # rid is unique so stability is unnecessary
        rid, c, p = jax.lax.sort((rid, c, p), num_keys=1,
                                 is_stable=False)
        nxt_rid = jnp.roll(rid, -1)
        c2 = jnp.roll(c, -1)
        p2 = jnp.roll(p, -1)
        first = (rid % 2 == 0) & (nxt_rid == rid + 1) & (rid < big)
        first = first.at[-1].set(False)
        len1 = ctg_len[jnp.maximum(c, 0)]
        len2 = ctg_len[jnp.maximum(c2, 0)]
        same = first & (c2 == (c ^ 1))
        cross = first & ~same & (c != c2)
        g = insert_size - (len1 - p) - (len2 - p2)
        ok = cross & (g >= -(insert_size // 10)) & (g <= insert_size)
        a = jnp.where(ok, c, big)
        b = jnp.where(ok, c2 ^ 1, big)
        # mirrored twins in one 2n buffer
        a_all = jnp.concatenate([a, jnp.where(ok, b ^ 1, big)])
        b_all = jnp.concatenate([b, jnp.where(ok, a ^ 1, big)])
        g_all = jnp.concatenate([g, g])
        # lexicographic (a, b): unstable b-pass, then a stable a-pass
        # preserving the b order within equal a
        b_s, a_s, g_s = jax.lax.sort((b_all, a_all, g_all), num_keys=1,
                                     is_stable=False)
        a_s, b_s, g_s = jax.lax.sort((a_s, b_s, g_s), num_keys=1,
                                     is_stable=True)
        newg = jnp.ones((2 * n,), bool)
        newg = newg.at[1:].set(
            (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1]))
        live = a_s < big
        grp = jnp.cumsum(newg.astype(jnp.int32)) - 1
        gp = insert_size + g_s  # >= 0 within the +-ins/10 accept window
        w = jax.ops.segment_sum(live.astype(jnp.int32), grp,
                                num_segments=2 * n)
        lo = jax.ops.segment_sum(
            jnp.where(live, gp & 0xFF, 0), grp, num_segments=2 * n)
        hi = jax.ops.segment_sum(
            jnp.where(live, gp >> 8, 0), grp, num_segments=2 * n)
        # device-side COMPACTION to static caps: the tunnel charges
        # ~30 MB/s, so downloading the full 2n-sized arrays cost more
        # than the host path computed in total.  Callers retry with
        # doubled caps on overflow (same protocol as the native CSR).
        is_start = newg & live
        n_links = jnp.sum(is_start)
        starts = jnp.nonzero(is_start, size=link_cap, fill_value=0)[0]
        gi = jnp.arange(link_cap)  # live group ids are 0..n_links-1
        ok = gi < n_links
        big = jnp.int32(2**31 - 1)
        # same-contig insert observations for host calcuIS
        n_same = jnp.sum(same)
        oidx = jnp.nonzero(same, size=obs_cap, fill_value=0)[0]
        obs_all = (len1 - p2) - p
        obs_ok = jnp.arange(obs_cap) < n_same
        return (jnp.where(ok, a_s[starts], big),
                jnp.where(ok, b_s[starts], big),
                jnp.where(ok, w[gi], 0),
                jnp.where(ok, lo[gi], 0),
                jnp.where(ok, hi[gi], 0),
                n_links,
                jnp.where(obs_ok, obs_all[oidx], 0), n_same)

    return kernel


_links_kernel_cache = []


def build_links_for_grad_device(
    read_id: np.ndarray,
    ctg: np.ndarray,
    pos: np.ndarray,
    ctg_len: np.ndarray,
    insert_size: int,
    id_lo: int,
    id_hi: int,
) -> Tuple[LinkTable, Optional[int]]:
    """Device counterpart of build_links_for_grad — exact same outputs
    (parity-tested), with the sort + pair-detect + segment-reduce on
    the accelerator.  Accepts device or host arrays."""
    import jax.numpy as jnp

    if not _links_kernel_cache:
        _links_kernel_cache.append(_links_device_kernel())
    kernel = _links_kernel_cache[0]
    args = (jnp.asarray(read_id, jnp.int32), jnp.asarray(ctg, jnp.int32),
            jnp.asarray(pos, jnp.int32), jnp.asarray(ctg_len, jnp.int32),
            int(id_lo), int(id_hi), int(insert_size))
    link_cap, obs_cap = 1 << 20, 1 << 20
    while True:
        a, b, w, lo, hi, n_links, obs, n_same = kernel(
            *args, link_cap=link_cap, obs_cap=obs_cap)
        nl = int(n_links)
        ns = int(n_same)
        if nl <= link_cap and ns <= obs_cap:
            break
        while nl > link_cap:
            link_cap *= 2
        while ns > obs_cap:
            obs_cap *= 2
    a = np.asarray(a)[:nl]
    b = np.asarray(b)[:nl]
    w_np = np.asarray(w)[:nl].astype(np.int64)
    tot = (np.asarray(hi)[:nl].astype(np.int64) << 8) \
        + np.asarray(lo)[:nl].astype(np.int64) \
        - w_np * insert_size
    # numpy-path semantics: float mean truncated toward zero by astype
    gap = (tot / np.maximum(w_np, 1)).astype(np.int32) if nl \
        else np.zeros((0,), np.int32)
    obs_np = np.asarray(obs)[:ns]
    new_ins = _calcu_is(obs_np.astype(np.int64))
    return (
        LinkTable(c1=a.astype(np.int32), c2=b.astype(np.int32),
                  weight=w_np.astype(np.int32), gap=gap),
        new_ins,
    )


def _calcu_is(obs: np.ndarray) -> Optional[int]:
    """calcuIS (attachPEinfo.c): mean, then mean of observations within
    3*SD (sample SD, C integer division)."""
    if obs.size < 100:
        return None
    avg = int(obs.sum() // obs.size)
    sd = int(np.sqrt(((obs - avg) ** 2).sum() // (obs.size - 1)))
    if sd == 0:
        return avg
    keep = np.abs(obs - avg) < 3 * sd
    return int(obs[keep].sum() // keep.sum()) if keep.any() else None


# ---------------------------------------------------------------------------
# per-rank ordering
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Scaffold:
    """An ordered chain of directed contigs with gaps between them.

    ``jweight``/``jsmall`` carry per-junction bind metadata (the CONNECT
    maxGap/bySmall flags of freezing, orderContig.c:3083/8225): the PE
    weight that created each junction and whether a short-insert
    (<=1000) rank created it.  Optional — chains rebuilt from stage
    files carry none."""

    ctgs: List[int]
    gaps: List[int]  # len == len(ctgs) - 1
    jweight: List[int] = dataclasses.field(default_factory=list)
    jsmall: List[bool] = dataclasses.field(default_factory=list)


class Scaffolder:
    """Rank-by-rank scaffold builder over directed contigs.

    State: each undirected contig starts as a singleton chain; each rank
    merges chains via filtered PE links (Links2Scaf's ordering loop,
    simplified to unique-successor linearization)."""

    def __init__(self, ctg_len: np.ndarray, cvg: Optional[np.ndarray] = None,
                 min_ctg_len: int = 0, mask_high_cvg: bool = True,
                 cvg4snp: float = 0.0,
                 contig_seqs: Optional[List[str]] = None, k: int = 0,
                 use_native: Optional[bool] = None,
                 cvg_low: float = 0.1, cvg_high: float = 2.0,
                 ins_var_idx: float = 1.5, score_mask: bool = True):
        self.n_dir = ctg_len.shape[0]
        self.ctg_len = ctg_len
        self.chains: List[Scaffold] = []
        self.mask = np.zeros((self.n_dir,), bool)
        self.cvg_dir = (
            np.asarray(cvg, np.float64) if cvg is not None else None
        )
        self.ins_var_idx = ins_var_idx
        self.score_mask = score_mask
        mean_cvg = 0.0
        if self.cvg_dir is not None and self.cvg_dir.size and (
            self.cvg_dir > 0
        ).any():
            mean_cvg = float(np.median(self.cvg_dir[self.cvg_dir > 0]))
            if mask_high_cvg:
                # exact reference coverage masking (loadGraph.c:390-460):
                # cvgAvg is LENGTH-WEIGHTED over contigs >100 bp
                # (cvgSum += cvg*(len-k) at :393, len>100 gate at :390) —
                # an unweighted mean lets short error-contig noise drag
                # the average down until every real contig trips the
                # high-coverage repeat mask (the sparse-golden split);
                # -c/-C set the low/high factors
                cv = self.cvg_dir
                counted = cv > 0
                w = np.maximum(ctg_len - k, 1).astype(np.float64)
                wc = counted & (ctg_len > 100)
                if wc.any():
                    cvg_avg = float((cv[wc] * w[wc]).sum() / w[wc].sum())
                elif counted.any():
                    cvg_avg = float(cv[counted].mean())
                else:
                    cvg_avg = 0.0
                cvg_avg = max(cvg_avg, 3.0)
                high1 = cvg_high * cvg_avg
                high2 = 0.8 * high1
                low = cvg_low * cvg_avg
                short_cut = 100 if (2 * k + 2) < 100 else 0
                twin = np.arange(self.n_dir) ^ 1
                cvt = cv[twin]
                m = (cv + cvt) > 2 * high1
                if short_cut:
                    short = ctg_len < short_cut
                    m |= short & (
                        (cv > high2) | (cvt > high2)
                        | ((cv < low) & (cvt < low))
                    )
                # 6-bit saturation guard (loadGraph.c:447): at low genome
                # coverage a cvg pegged at 63 means a saturated repeat
                if cvg_avg < 50:
                    m |= (cv >= 63) | (cvt >= 63)
                self.mask |= m | m[twin]
        if min_ctg_len:
            self.mask |= ctg_len < min_ctg_len
        # scaff -B: SNP-bubble coverage cutoff, relative to the average
        # contig coverage (scaffold.c:203, orderContig.c:5780)
        self.cvg4snp = cvg4snp * mean_cvg
        self.contig_seqs = contig_seqs
        self.k = k
        self.snp_pairs: List[Tuple[int, int]] = []  # (kept, removed) dir ctg
        self.bubble_flag = np.zeros((self.n_dir,), bool)
        for t in range(self.n_dir // 2):
            self.chains.append(Scaffold([2 * t], []))
        # accumulated contig-level links (weight, gap) across all ranks —
        # feeds detectBreakScaff junction support and recoverMask routes
        self.ctg_links: Dict[Tuple[int, int], Tuple[int, int]] = {}
        self.n_breaks = 0
        self.n_recovered = 0
        # native (C++) ordering core: identical decision logic compiled
        # for human-genome link-graph scale (the reference's orderContig.c
        # is native C for the same reason); None = auto (use if it builds)
        if use_native is None:
            use_native = os.environ.get(
                "SOAPDENOVO2_TPU_NATIVE_SCAFFOLD", "1"
            ) != "0"
        self.use_native = use_native
        self._sigs: Optional[Tuple[np.ndarray, np.ndarray]] = None

    def _seq_sigs(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per directed contig: FNV-1a signatures of the first and last k
        bases (0 = unavailable) — the native core's stand-in for the
        removeBubbleCtg end-kmer string equality test."""
        if self._sigs is not None:
            return self._sigs
        head = np.zeros((self.n_dir,), np.uint64)
        tail = np.zeros((self.n_dir,), np.uint64)
        if self.contig_seqs is not None and self.k > 0:
            for c in range(self.n_dir):
                s = _dir_ctg_seq(c, self.contig_seqs)
                if len(s) >= self.k:
                    head[c] = _fnv1a(s[: self.k])
                    tail[c] = _fnv1a(s[-self.k:])
        self._sigs = (head, tail)
        return self._sigs

    def _remember_links(self, links: LinkTable,
                        by_small: bool = False) -> None:
        for a, b, w, g in zip(links.c1, links.c2, links.weight, links.gap):
            key = (int(a), int(b))
            old = self.ctg_links.get(key)
            if old is None:
                self.ctg_links[key] = (int(w), int(g), by_small)
            elif w > old[0]:
                osm = len(old) > 2 and old[2]
                self.ctg_links[key] = (int(w), int(g), by_small or osm)
            elif by_small and not (len(old) > 2 and old[2]):
                self.ctg_links[key] = (old[0], old[1], True)

    def _rev_small(self, y: int, x: int) -> bool:
        """Did a SHORT-insert rank link the facing contig ends of chain
        nodes y -> x?  The dh_cnt->bySmall/smallIns consult of the
        :7074 arbitration — our CONNECTs don't persist across ranks, so
        the history lives in ctg_links (contig-level, small-rank flag)."""
        cy = self._node_tail_ctg(y)
        cx = self._node_head_ctg(x)
        if cy is None or cx is None:
            return False
        rec = self.ctg_links.get((cy, cx))
        return bool(rec is not None and len(rec) > 2 and rec[2])

    def _node_head_ctg(self, node: int) -> Optional[int]:
        sc = self.chains[node >> 1]
        if not sc.ctgs:
            return None
        if node & 1:
            return int(twin_ctg(np.int64(sc.ctgs[-1])))
        return int(sc.ctgs[0])

    def _node_tail_ctg(self, node: int) -> Optional[int]:
        sc = self.chains[node >> 1]
        if not sc.ctgs:
            return None
        if node & 1:
            return int(twin_ctg(np.int64(sc.ctgs[0])))
        return int(sc.ctgs[-1])

    # -- chain coordinate helpers ------------------------------------------
    def _chain_maps(self):
        """Per directed contig: chain id, orientation within chain,
        distance from chain start to contig start, distance to chain end.

        Vectorized over ONE flattened member array — this runs once per
        rank over every chained contig, and per-chain Python loops were
        the scaling wall at millions of chains."""
        cid = np.full((self.n_dir,), -1, np.int64)
        off = np.zeros((self.n_dir,), np.int64)  # dist from chain head
        tail = np.zeros((self.n_dir,), np.int64)  # dist to chain tail
        flip = np.zeros((self.n_dir,), bool)
        chains = self.chains
        n_ch = len(chains)
        if not n_ch:
            return cid, off, tail, flip
        counts = np.fromiter((len(sc.ctgs) for sc in chains), np.int64,
                             count=n_ch)
        # the vectorization below relies on every chain being non-empty with
        # exactly len(ctgs)-1 gaps; fail loudly on producer violations rather
        # than silently misaligning every later chain's offsets
        assert counts.min(initial=1) >= 1, "empty scaffold chain"
        n_gaps = sum(len(sc.gaps) for sc in chains)
        total_m = int(counts.sum())
        assert n_gaps == total_m - n_ch, (
            f"gaps/ctgs invariant violated: {n_gaps} gaps for "
            f"{total_m} members in {n_ch} chains")
        if not total_m:
            return cid, off, tail, flip
        flat = np.fromiter(
            (c for sc in chains for c in sc.ctgs), np.int64, count=total_m
        )
        # per-member advance: len + following gap (0 for chain tails)
        step = self.ctg_len[flat].astype(np.int64).copy()
        gaps = np.fromiter(
            (gap_span(g) for sc in chains for g in sc.gaps), np.int64,
            count=total_m - n_ch,
        )
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        is_tail_m = np.zeros((total_m,), bool)
        is_tail_m[np.cumsum(counts) - 1] = True
        step[~is_tail_m] += gaps
        acc = np.cumsum(step) - step  # start offset within the stream
        chain_of = np.repeat(np.arange(n_ch, dtype=np.int64), counts)
        safe_starts = np.minimum(starts, max(total_m - 1, 0))
        chain_base = acc[safe_starts][chain_of]
        off_f = acc - chain_base
        cs = np.concatenate([[0], np.cumsum(step)])
        totals = cs[starts + counts] - cs[starts]  # robust to empty chains
        tail_f = totals[chain_of] - off_f - self.ctg_len[flat]
        twin_f = flat ^ 1
        cid[flat] = chain_of
        cid[twin_f] = chain_of
        flip[twin_f] = True
        flip[flat] = False
        off[flat] = off_f
        tail[flat] = tail_f
        off[twin_f] = tail_f
        tail[twin_f] = off_f
        return cid, off, tail, flip

    def add_rank(self, links: LinkTable, pair_cutoff: int,
                 insert_size: int, last_rank: bool = False) -> None:
        """One ordering round (ordering:2351)."""
        if links.c1.size == 0:
            return
        by_small_rank = insert_size <= 1000  # smallScaf/bySmall regime
        self._remember_links(links, by_small=by_small_rank)
        if by_small_rank:
            self._had_small_rank = True
        if self.use_native:
            from .. import native as native_mod

            lib = native_mod.get_scaffolder_lib()
            if lib is not None and self._add_rank_native(
                lib, links, pair_cutoff, insert_size, last_rank
            ):
                return
        w_ok = links.weight >= pair_cutoff  # deleteWeakCnt:1356
        masked = self.mask[links.c1] | self.mask[links.c2]
        keep = w_ok & ~masked
        c1, c2 = links.c1[keep], links.c2[keep]
        w, gap = links.weight[keep], links.gap[keep]

        cid, off, tail, flip = self._chain_maps()
        # lift links to chain level: (chain1 oriented) -> (chain2 oriented).
        # This plays downSlide's role (orderContig.c:393): a link landing on
        # an interior contig of a bound chain is slid to the chain end.
        ch1 = cid[c1]
        ch2 = cid[c2]
        ok = (ch1 >= 0) & (ch2 >= 0) & (ch1 != ch2)
        if insert_size > 1000 and self.ins_var_idx > 0:
            # -b: a slide farther than ins_var_idx * insert is unreliable
            # (downSlide, orderContig.c:477/568)
            slide = tail[c1] + off[c2]
            ok &= slide <= self.ins_var_idx * insert_size
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

        linkset: Dict[Tuple[int, int], Tuple[float, int]] = {}
        for a, b, ww, gg in zip(A, B, W, G):
            linkset[(int(a), int(b))] = (float(ww), int(gg))
        chain_total = np.array(
            [
                sum(self.ctg_len[c] for c in sc.ctgs)
                + sum(gap_span(g) for g in sc.gaps)
                for sc in self.chains
            ],
            np.int64,
        )

        def chain_len_of(x):
            return int(chain_total[x >> 1])

        ins_var = 50 if insert_size >= 1000 else (
            30 if insert_size >= 300 else 20
        )
        self._remove_transitive(linkset, chain_len_of, ins_var)
        log.debug("rank ins=%d: %d chain links after transitive reduction",
                  insert_size, len(linkset))

        # subgraph linearization (general_linearization:8123): strict pass
        # always (simplifyCnt:2013), non-strict pass on the last rank
        # (ordering:2385)
        # removeBubbleCtg runs inside linearization for short-insert ranks
        # only (orderContig.c:8159: Insert_size < 1000 && cvg4SNP > 0.001)
        snp = (
            insert_size < 1000
            and self.cvg4snp > 1e-3
            and self.contig_seqs is not None
            and self.cvg_dir is not None
            and self.k > 0
        )
        window = insert_size + 3 * ins_var
        self._general_linearization(linkset, chain_len_of, ins_var,
                                    overlap_tol=0.05, confl_tol=0.05,
                                    snp=snp, window=window,
                                    by_small_rank=by_small_rank)
        # maskRepeat (orderContig.c:2222) between the two simplifyCnt
        # passes of the reference's ordering(): branching nodes whose
        # direct-connection subgraph fails the distance/overlap test (or
        # whose coverage exceeds 1.4x average) are repeats -- mask them
        self._mask_repeat(linkset, chain_len_of, tolerance=0.05)
        self._remove_transitive(linkset, chain_len_of, ins_var)
        if last_rank:
            self._general_linearization(linkset, chain_len_of, ins_var,
                                        overlap_tol=0.10, confl_tol=0.10,
                                        snp=snp, window=window,
                                        by_small_rank=by_small_rank)

        log.debug("rank ins=%d: %d links after linearization", insert_size,
                  len(linkset))
        if log.isEnabledFor(logging.DEBUG):
            outs_dbg: Dict[int, list] = {}
            for (a, b), (ww, gg) in linkset.items():
                outs_dbg.setdefault(a, []).append((b, ww, gg))
            nmul = 0
            for a, cand in outs_dbg.items():
                if len(cand) > 1:
                    nmul += 1
                    if nmul <= 6:
                        def _len(x):
                            c0 = self._single_ctg(x)
                            return (int(self.ctg_len[c0])
                                    if c0 is not None else -1)
                        log.debug("branch a=%d len=%d -> %s", a, _len(a),
                                  [(b, round(w, 1), g, _len(b))
                                   for b, w, g in cand])
            log.debug("pre-maskPuzzle: %d multi-out nodes", nmul)
        # maskPuzzle (orderContig.c:1291): singleton chains that still
        # branch are repeat puzzles — mask them out of ordering (they come
        # back via recoverMask / gap placement)
        self._mask_puzzle(linkset)

        # unique-successor linearization (linearC2C / freezing):
        succ: Dict[int, Tuple[int, int, float]] = {}
        pred_count: Dict[int, int] = {}
        outs_by_a: Dict[int, List[Tuple[int, float, int]]] = {}
        for (a, b), (ww, gg) in linkset.items():
            outs_by_a.setdefault(a, []).append((b, ww, gg))
        for a, cand in outs_by_a.items():
            if len(cand) == 1:
                b, ww, gg = cand[0]
                succ[a] = (b, gg, ww)
                pred_count[b] = pred_count.get(b, 0) + 1
        # drop ambiguous predecessors
        if log.isEnabledFor(logging.DEBUG):
            for a, (b, gg, _ww) in succ.items():
                if pred_count.get(b, 0) > 1:
                    others = [x for x, (y, *_r) in succ.items() if y == b]
                    log.debug("multi-pred b=%d preds=%s lens=%s masked=%s",
                              b, others,
                              [int(self.ctg_len[self._single_ctg(x)])
                               if self._single_ctg(x) is not None else -1
                               for x in others],
                              [bool(self.mask[self._single_ctg(x)])
                               if self._single_ctg(x) is not None else None
                               for x in others])
        succ = {
            a: (b, gg, ww)
            for a, (b, gg, ww) in succ.items()
            if pred_count.get(b, 0) == 1
        }
        # drop mutual conflicts via twin symmetry: succ on (chain,o) implies
        # the mirrored pred on (chain,1-o); keep consistent ones only
        merged: List[Scaffold] = []
        used = np.zeros((len(self.chains),), bool)
        # build next-chain mapping on oriented chains
        nxt = dict(succ)
        has_pred = {b for (b, *_r) in nxt.values()}

        # sorted start order: deterministic and port-stable (cycle chains,
        # which have no head, break at their smallest member)
        for start in sorted(nxt.keys()) + [
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
            metas = []
            used[ch] = True
            cur = start
            while cur in nxt:
                b, gg, ww = nxt[cur]
                if used[b >> 1]:
                    break
                path.append(b)
                gaps.append(int(gg))
                metas.append((int(ww), by_small_rank))
                used[b >> 1] = True
                cur = b
            merged.append(self._stitch(path, gaps, metas))
        n_multi_out = sum(1 for c in outs_by_a.values() if len(c) > 1)
        log.debug(
            "rank ins=%d: %d unique-succ merges, %d multi-out endpoints, "
            "%d chains", insert_size, len(succ), n_multi_out, len(merged),
        )
        self.chains = merged

    def _add_rank_native(self, lib, links: LinkTable, pair_cutoff: int,
                         insert_size: int, last_rank: bool) -> bool:
        """Run one ordering rank through the C++ core (native/scaffolder.cpp
        — statement-for-statement the same pipeline as the Python code
        below; parity-tested in tests/test_scaffolder_native.py)."""
        import ctypes

        i64p = ctypes.POINTER(ctypes.c_int64)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f64p = ctypes.POINTER(ctypes.c_double)

        n_dir = self.n_dir
        ctg_len = np.ascontiguousarray(self.ctg_len, dtype=np.int64)
        mask = np.ascontiguousarray(self.mask, dtype=np.uint8)
        bub = np.ascontiguousarray(self.bubble_flag, dtype=np.uint8)
        snp_possible = (
            insert_size < 1000 and self.cvg4snp > 1e-3
            and self.contig_seqs is not None
            and self.cvg_dir is not None and self.k > 0
        )
        if snp_possible:
            head, tail = self._seq_sigs()
        else:
            head = np.zeros((n_dir,), np.uint64)
            tail = head
        if self.cvg_dir is not None:
            cvg = np.ascontiguousarray(self.cvg_dir, dtype=np.float64)
            cvg_p = cvg.ctypes.data_as(f64p)
        else:
            cvg_p = f64p()
        n_ch = len(self.chains)
        ptr = np.zeros((n_ch + 1,), np.int64)
        for i, sc in enumerate(self.chains):
            ptr[i + 1] = ptr[i] + len(sc.ctgs)
        total_ctgs = int(ptr[-1])
        ctgs = np.zeros((max(total_ctgs, 1),), np.int64)
        gaps = np.zeros((max(total_ctgs, 1),), np.int64)
        gi = 0
        for i, sc in enumerate(self.chains):
            ctgs[int(ptr[i]): int(ptr[i + 1])] = sc.ctgs
            for g in sc.gaps:
                gaps[gi] = g
                gi += 1
        m = int(links.c1.size)
        c1 = np.ascontiguousarray(links.c1, np.int64)
        c2 = np.ascontiguousarray(links.c2, np.int64)
        lw = np.ascontiguousarray(links.weight, np.int64)
        lg = np.ascontiguousarray(links.gap, np.int64)
        # small-insert link history for the :7074 dh_cnt->bySmall consult
        # (only long ranks after a short rank can hit it, but passing it
        # unconditionally keeps one code path)
        skeys = [
            (a << 32) | b
            for (a, b), rec in self.ctg_links.items()
            if len(rec) > 2 and rec[2] and 0 <= a < (1 << 31)
            and 0 <= b < (1 << 32)
        ]
        small_keys = np.asarray(sorted(skeys), np.uint64) \
            if skeys else np.zeros((1,), np.uint64)
        small_n = len(skeys)
        out_ptr = np.zeros((n_ch + 2,), np.int64)
        out_ctgs = np.zeros((max(total_ctgs, 1),), np.int64)
        out_gaps = np.zeros((max(total_ctgs, 1),), np.int64)
        out_snp = np.zeros((2 * n_dir + 2,), np.int64)
        out_counts = np.zeros((5,), np.int64)

        def P(a, t=i64p):
            return a.ctypes.data_as(t)

        rc = lib.scaff_ordering_rank(
            n_dir, P(ctg_len), P(mask, u8p), cvg_p, P(bub, u8p),
            n_ch, P(ptr), P(ctgs), P(gaps),
            m, P(c1), P(c2), P(lw), P(lg),
            int(pair_cutoff), int(insert_size), int(bool(last_rank)),
            int(max(self.k, 0)),
            float(self.cvg4snp), int(snp_possible),
            P(head, u64p), P(tail, u64p),
            small_n, P(small_keys, u64p),
            P(out_ptr), P(out_ctgs), P(out_gaps), P(out_snp), P(out_counts),
        )
        if rc != 0:
            return False
        n_out = int(out_counts[0])
        new_chains: List[Scaffold] = []
        gpos = 0
        for i in range(n_out):
            b, e = int(out_ptr[i]), int(out_ptr[i + 1])
            cl = [int(x) for x in out_ctgs[b:e]]
            ng = e - b - 1
            gl = [int(x) for x in out_gaps[gpos: gpos + ng]]
            gpos += ng
            # junction bind metadata (freezing/smallScaf): the native ABI
            # returns flat chains, so rebuild (weight, by_small) from the
            # contig-level link history; junctions with no direct record
            # default to this rank's regime
            by_small_rank = insert_size <= 1000
            jw: List[int] = []
            js: List[bool] = []
            for a_c, b_c in zip(cl, cl[1:]):
                rec = self.ctg_links.get((a_c, b_c))
                if rec is None:
                    jw.append(0)
                    js.append(by_small_rank)
                else:
                    jw.append(int(rec[0]))
                    js.append(bool(rec[2]) or by_small_rank)
            new_chains.append(Scaffold(cl, gl, jw, js))
        self.chains = new_chains
        self.mask = mask.astype(bool)
        self.bubble_flag = bub.astype(bool)
        for i in range(int(out_counts[2])):
            self.snp_pairs.append(
                (int(out_snp[2 * i]), int(out_snp[2 * i + 1]))
            )
        return True

    # -- general_linearization (orderContig.c:8123) -------------------------
    def _general_linearization(
        self,
        linkset: Dict[Tuple[int, int], Tuple[float, int]],
        chain_len_of,
        ins_var: int,
        overlap_tol: float,
        confl_tol: float,
        max_nodes: int = 32,
        snp: bool = False,
        window: int = 0,
        by_small_rank: bool = True,
    ) -> int:
        """Order bounded link subgraphs by estimated position and replace
        their links with a consistent linear chain.

        The reference gathers the subgraph with twin Fib heaps
        (pickUpGeneralSubgraph:6464), sorts members by distance (cmp_ctg),
        rejects on orientation conflicts (checkEligible), significant
        overlap (checkOverlapInBetween_general:7495) or conflicting link
        weight (checkConflictCnt_general), then commits the order
        (arrangeNodes_general:6939).  Here nodes are oriented chains; a
        node's reverse complement is ``node ^ 1``.
        """
        outs: Dict[int, List[Tuple[int, float, int]]] = {}
        ins: Dict[int, List[Tuple[int, float, int]]] = {}
        for (a, b), (w, g) in linkset.items():
            outs.setdefault(a, []).append((b, w, g))
            ins.setdefault(b, []).append((a, w, g))
        consumed: set = set()
        n_linearized = 0
        stats = {"picked": 0, "bfs_fail": 0, "small": 0, "twin": 0,
                 "overlap": 0, "conflict": 0, "committed": 0}
        for a in sorted(outs.keys()):
            if a in consumed or len(outs.get(a, ())) < 2:
                continue
            stats["picked"] += 1
            # gather positions by relaxation BFS in both directions,
            # bounded by insert-size DISTANCE from a's ends like the
            # reference's pickUpGeneralSubgraph (orderContig.c:6464):
            # out-of-window neighbours are SKIPPED, not failures, so the
            # subgraph stays local instead of swallowing the whole chain
            # graph and tripping max_nodes
            a_len = chain_len_of(a)
            pos: Dict[int, int] = {a: 0}
            queue = [a]
            ok = True
            while queue and ok:
                cur = queue.pop()
                for b, w, g in outs.get(cur, ()):  # downstream
                    p = pos[cur] + chain_len_of(cur) + g
                    if b in pos:
                        if abs(pos[b] - p) > 3 * ins_var + 0.1 * abs(p):
                            ok = False
                            break
                    else:
                        if window and p - a_len > window:
                            continue  # beyond the insert window
                        if len(pos) >= max_nodes:
                            ok = False
                            break
                        pos[b] = p
                        queue.append(b)
                if not ok:
                    break
                for pn, w, g in ins.get(cur, ()):  # upstream
                    p = pos[cur] - g - chain_len_of(pn)
                    if pn in pos:
                        if abs(pos[pn] - p) > 3 * ins_var + 0.1 * abs(p):
                            ok = False
                            break
                    else:
                        if window and -(p + chain_len_of(pn)) > window:
                            continue  # beyond the insert window
                        if len(pos) >= max_nodes:
                            ok = False
                            break
                        pos[pn] = p
                        queue.append(pn)
            if not ok or len(pos) < 3:
                stats["bfs_fail" if not ok else "small"] += 1
                continue
            # checkEligible: no member together with its reverse complement
            if any((x ^ 1) in pos for x in pos):
                stats["twin"] += 1
                continue
            order = sorted(pos.items(), key=lambda kv: (kv[1], kv[0]))
            # SNP-bubble collapse over the ordered subgraph (-B,
            # removeBubbleCtg orderContig.c:7986)
            if snp and len(order) >= 2:
                order = self._remove_bubble_ctg(order, linkset, chain_len_of)
            # checkOverlapInBetween_general (orderContig.c:7495):
            # AGGREGATE overlap budget, not per-pair — an adjacent pair's
            # overlap is excused when a direct connection predicted it
            # (cnt->gapLen > gap) or it is below one k-mer; the excess
            # accumulates and the subgraph fails only when it exceeds
            # tolerance x total subgraph length.  (The former per-pair
            # bound rejected 35/51 diploid subgraphs where co-located SNP
            # arms overlap legitimately; the reference rejects 4.)
            # Our coordinates use FULL contig lengths (reference lengths
            # exclude the k overlap), so the one-k-mer excuse keeps the
            # junction-overlap slack plus estimation noise (ins_var).
            len_sum = sum(chain_len_of(x) for x, _ in order)
            len_olp = 0
            ok = len_sum >= 1
            for (x, px), (y, py) in zip(order, order[1:]):
                overlap = px + chain_len_of(x) - py
                if overlap > 0:
                    direct = linkset.get((x, y)) or linkset.get((y, x))
                    if direct is not None and direct[1] > -overlap:
                        continue
                    if overlap < max(self.k, 0) + ins_var:
                        continue
                    len_olp += overlap
                if len_olp > overlap_tol * len_sum:
                    ok = False
                    break
            if not ok:
                stats["overlap"] += 1
                continue
            # checkConflictCnt_general: links pointing against the order
            rank = {x: i for i, (x, _) in enumerate(order)}
            confl = total = 0.0
            for (x, y), (w, _g) in linkset.items():
                if x in rank and y in rank:
                    total += w
                    if rank[y] <= rank[x]:
                        confl += w
            if total <= 0 or confl > confl_tol * total:
                stats["conflict"] += 1
                continue
            # adjacent-pair arbitration (orderContig.c:7074-7135): when the
            # distance sort put (x, y) adjacent but only the REVERSED link
            # y->x exists, the reference exchanges the pair if small-insert
            # evidence backs the reversed order (bySmall global in short
            # ranks / dh_cnt->bySmall history in long ranks) or the
            # negative gap shows the sort flipped two near-coincident
            # contigs (tmp_dis sanity window :7084)
            changed = True
            guard = 0
            while changed and guard <= len(order):
                changed = False
                guard += 1
                for i in range(len(order) - 1):
                    (x, px), (y, py) = order[i], order[i + 1]
                    if (x, y) in linkset:
                        continue
                    rev = linkset.get((y, x))
                    if rev is None:
                        continue
                    rev_w, rev_g = rev
                    gap_xy = py - (px + chain_len_of(x))
                    tmp_dis = (chain_len_of(x) + chain_len_of(y)
                               + gap_xy + rev_g)
                    small_backed = by_small_rank or self._rev_small(y, x)
                    if small_backed or (
                        (-gap_xy > chain_len_of(x)
                         or -gap_xy > chain_len_of(y))
                        and 0 < tmp_dis < 500 and rev_w > 3
                    ):
                        order[i], order[i + 1] = (y, px), (x, py)
                        changed = True
                        break
            # arrangeNodes_general: replace member links with the chain.
            # The mirror subgraph (every node reverse-complemented) shares
            # one CONNECT set in the reference; rewrite it symmetrically.
            members = set(pos)
            members_m = {x ^ 1 for x in members}
            support: Dict[Tuple[int, int], float] = {}
            for keypair in [
                kp
                for kp in linkset
                if (kp[0] in members and kp[1] in members)
                or (kp[0] in members_m and kp[1] in members_m)
            ]:
                support[keypair] = linkset.pop(keypair)[0]
            for (x, px), (y, py) in zip(order, order[1:]):
                ggap = py - (px + chain_len_of(x))
                wgt = support.get((x, y), 1.0)
                linkset[(x, y)] = (wgt, ggap)
                linkset[(y ^ 1, x ^ 1)] = (wgt, ggap)
            consumed |= members | members_m
            n_linearized += 1
            stats["committed"] += 1
        log.debug("general_linearization: %s", stats)
        return n_linearized

    # -- removeBubbleCtg (orderContig.c:7986) --------------------------------
    def _single_ctg(self, node: int) -> Optional[int]:
        """Directed contig id for an oriented singleton chain, else None."""
        sc = self.chains[node >> 1]
        if len(sc.ctgs) != 1:
            return None
        c = int(sc.ctgs[0])
        return c ^ (node & 1)

    def _transfer_links(self, lose: int, keep: int, linkset) -> None:
        """transferCnt2RemainNode: move every connection of the removed
        node (and its reverse complement) onto the kept node, summing
        weights into existing links (orderContig.c removeBubbleCtg calls
        it for both the node and its twin)."""
        for kp in sorted(k for k in linkset
                         if lose in k or (lose ^ 1) in k):
            w, g = linkset.pop(kp)
            a, b = kp
            na = keep if a == lose else (keep ^ 1 if a == (lose ^ 1) else a)
            nb = keep if b == lose else (keep ^ 1 if b == (lose ^ 1) else b)
            if (na >> 1) == (nb >> 1):
                continue
            old = linkset.get((na, nb))
            linkset[(na, nb)] = (old[0] + w, old[1]) if old else (w, g)

    def _remove_bubble_ctg(self, order, linkset, chain_len_of):
        """Collapse SNP bubbles between position-adjacent subgraph members.

        Reference criteria (removeBubbleCtg, orderContig.c:8006): the two
        contigs overlap in the layout (gap < 0), both coverages are below
        cvg4SNP, there is no direct connection between them, and their
        first and last k-mers are identical.  The lower-coverage contig
        (tie: shorter) is masked and its connections transferred to the
        kept one; both sequences are recorded for *.bubbleInScaff."""
        out = []
        cur, pcur = order[0]
        for nxt, pnxt in order[1:]:
            gap = pnxt - pcur - chain_len_of(cur)
            if (
                gap >= 0
                or (cur, nxt) in linkset
                or (nxt, cur) in linkset
            ):
                out.append((cur, pcur))
                cur, pcur = nxt, pnxt
                continue
            ca = self._single_ctg(cur)
            cb = self._single_ctg(nxt)
            if (
                ca is None
                or cb is None
                or self.cvg_dir[ca] >= self.cvg4snp
                or self.cvg_dir[cb] >= self.cvg4snp
            ):
                out.append((cur, pcur))
                cur, pcur = nxt, pnxt
                continue
            sa = _dir_ctg_seq(ca, self.contig_seqs)
            sb = _dir_ctg_seq(cb, self.contig_seqs)
            kk = self.k
            if (
                len(sa) < kk or len(sb) < kk
                or sa[:kk] != sb[:kk] or sa[-kk:] != sb[-kk:]
            ):
                out.append((cur, pcur))
                cur, pcur = nxt, pnxt
                continue
            # a bubble: keep higher coverage, tie-break on length
            keep_cur = self.cvg_dir[ca] > self.cvg_dir[cb] or (
                self.cvg_dir[ca] == self.cvg_dir[cb] and len(sa) > len(sb)
            )
            keep_n, lose_n = (cur, nxt) if keep_cur else (nxt, cur)
            keep_c, lose_c = (ca, cb) if keep_cur else (cb, ca)
            if not (self.bubble_flag[keep_c] and self.bubble_flag[lose_c]):
                for c in (keep_c, lose_c):
                    self.bubble_flag[c] = self.bubble_flag[c ^ 1] = True
                self.snp_pairs.append((keep_c, lose_c))
            self._transfer_links(lose_n, keep_n, linkset)
            self.mask[lose_c] = self.mask[lose_c ^ 1] = True
            if not keep_cur:
                cur, pcur = nxt, pnxt  # winner continues as the cursor
        out.append((cur, pcur))
        return out

    def _mask_puzzle(
        self, linkset: Dict[Tuple[int, int], Tuple[float, int]]
    ) -> int:
        """maskPuzzle (orderContig.c:1291): contigs whose connections still
        branch after linearization are repeat puzzles; mask them.  Only
        singleton chains are masked — a bound multi-contig chain already
        carries consistent PE evidence (the reference likewise skips
        contigs bound inside scaffolds via validConnect's used flag)."""
        outd: Dict[int, int] = {}
        ind: Dict[int, int] = {}
        for (x, y) in linkset:
            outd[x] = outd.get(x, 0) + 1
            ind[y] = ind.get(y, 0) + 1
        n_masked = 0
        masked_nodes = set()
        for node in set(outd) | set(ind):
            if outd.get(node, 0) <= 1 and ind.get(node, 0) <= 1:
                continue
            sc = self.chains[node >> 1]
            if len(sc.ctgs) != 1:
                continue
            c = sc.ctgs[0]
            if not self.mask[c]:
                self.mask[c] = self.mask[c ^ 1] = True
                masked_nodes.add(node)
                masked_nodes.add(node ^ 1)
                n_masked += 1
        if masked_nodes:
            for kp in [
                kp
                for kp in linkset
                if kp[0] in masked_nodes or kp[1] in masked_nodes
            ]:
                del linkset[kp]
        return n_masked

    # -- removeTransitive (orderContig.c:1765) ------------------------------
    @staticmethod
    def _valid_outs(linkset, out_links, x):
        return [y for y in out_links.get(x, ()) if (x, y) in linkset]

    def _linear_c2c(self, linkset, out_links, b, c, mn, mx,
                    chain_len_of, starter):
        """linearC2C (orderContig.c:1433) on the contracted chain graph:
        walk the unique-successor path down from B (reaching C = linear),
        then the unique-predecessor path up from C; if both dead-end with
        window budget left, link the frontiers (the reference allocates a
        weight-0 CONNECT) and report linear.  Returns None for
        not-linear, else the (new_link or None) to install."""
        length = 0
        cur = b
        hops = 0
        while True:
            outs = self._valid_outs(linkset, out_links, cur)
            if len(outs) != 1:
                break
            nxt = outs[0]
            length += linkset[(cur, nxt)][1] + chain_len_of(nxt)
            if nxt == c:
                return (None, True)
            if length > mx or nxt in (starter, starter ^ 1):
                return (None, False)
            cur = nxt
            hops += 1
            if hops > 64:
                return (None, False)
        if self._valid_outs(linkset, out_links, cur):
            return (None, False)  # new c1 still branches
        c1p = cur
        # most-upstream contig of C: downstream walk of twin(C)
        ctg = c ^ 1
        hops = 0
        while True:
            outs = self._valid_outs(linkset, out_links, ctg)
            if len(outs) != 1:
                break
            nxt = outs[0]
            length += linkset[(ctg, nxt)][1] + chain_len_of(nxt)
            if length > mx or nxt in (starter, starter ^ 1):
                return (None, False)
            ctg = nxt
            hops += 1
            if hops > 64:
                return (None, False)
        if self._valid_outs(linkset, out_links, ctg):
            return (None, False)  # new c2 has incoming links
        c2p = ctg ^ 1
        mn2, mx2 = mn - length, mx - length
        if c1p == c2p or c1p == ctg or mx2 < 0:
            return (None, False)
        if (c1p, c2p) in linkset:
            return (None, True)
        gap_new = max((mn2 + mx2) // 2, 0)
        return ((c1p, c2p, gap_new), True)

    def _remove_transitive(self, linkset, chain_len_of, ins_var,
                           max_rounds: int = 8) -> int:
        """removeTransitive (orderContig.c:1765), faithful semantics:
        only nodes with EXACTLY two valid outgoing connections; cn1 the
        nearer, cn2 the farther.  Guards: twin(C) keeps <= 2 valid outs
        (C's in-degree), twin(B) <= 1; the distance window
        gC - gB - len(B) +- ins_var/2 must reach >= 0; and A->C is
        dropped only when linearC2C confirms B connects to C (walking
        unique-successor paths, installing the reference's weight-0
        frontier link when both walks dead-end inside the window).
        Iterated to fixpoint like the reference's cycle loop."""
        n_dropped = 0
        for _ in range(max_rounds):
            out_links: Dict[int, List[int]] = {}
            for (x, y) in linkset:
                out_links.setdefault(x, []).append(y)
            changed = False
            for a in sorted(out_links):
                outs = self._valid_outs(linkset, out_links, a)
                if len(outs) != 2:
                    continue
                b, c = sorted(outs)
                if linkset[(a, b)][1] > linkset[(a, c)][1]:
                    b, c = c, b
                if len(self._valid_outs(linkset, out_links, c ^ 1)) > 2:
                    continue
                if len(self._valid_outs(linkset, out_links, b ^ 1)) > 1:
                    continue
                gb = linkset[(a, b)][1]
                gc = linkset[(a, c)][1]
                base = gc - gb - chain_len_of(b)
                mn = base - ins_var // 2
                mx = base + ins_var // 2
                if mx < 0:
                    continue
                # temporarily delete A->C like the reference, so the
                # walks don't route through it
                wc, gcv = linkset.pop((a, c))
                mirror = linkset.pop((c ^ 1, a ^ 1), None)
                new_link, linear = self._linear_c2c(
                    linkset, out_links, b, c, mn, mx, chain_len_of, a)
                if not linear:
                    linkset[(a, c)] = (wc, gcv)
                    if mirror is not None:
                        linkset[(c ^ 1, a ^ 1)] = mirror
                    continue
                if new_link is not None:
                    x, y, g_new = new_link
                    linkset[(x, y)] = (0.0, g_new)
                    linkset[(y ^ 1, x ^ 1)] = (0.0, g_new)
                changed = True
                n_dropped += 1
            if not changed:
                break
        return n_dropped

    # -- maskRepeat / checkUnique (orderContig.c:2222/2147) -----------------
    def _check_unique(self, linkset, out_links, node, chain_len_of,
                      tolerance: float) -> bool:
        """checkUnique (orderContig.c:2147): order the node's direct
        connections (and what they bind to) by distance; the node stays
        unique when the ordered members pass the aggregate overlap budget
        (checkOverlapInBetween) — i.e. the branching is explained by
        consistent positions, not a repeat."""
        members = [(0, node)]
        for b in self._valid_outs(linkset, out_links, node):
            d = linkset[(node, b)][1] + chain_len_of(b)
            members.append((d, b))
        if len(members) <= 2:
            return True
        members.sort()
        # positions: start offset of each member
        pos = []
        for d, m in members:
            pos.append((d - chain_len_of(m), m))
        len_sum = sum(chain_len_of(m) for _, m in members)
        if len_sum < 1:
            return True
        len_olp = 0
        for (px, x), (py, y) in zip(pos, pos[1:]):
            overlap = px + chain_len_of(x) - py
            if overlap > 0:
                len_olp += overlap
            if len_olp > tolerance * len_sum:
                return False
        return True

    def _mask_repeat(self, linkset, chain_len_of,
                     tolerance: float = 0.05) -> int:
        """maskRepeat (orderContig.c:2222): a still-branching contig is a
        repeat when its coverage exceeds 1.4x the average or when either
        direction fails checkUnique; masked contigs leave ordering (and
        can return via recoverMask)."""
        out_links: Dict[int, List[int]] = {}
        for (x, y) in linkset:
            out_links.setdefault(x, []).append(y)
        cvg_avg = None
        if self.cvg_dir is not None:
            live = self.cvg_dir[self.cvg_dir > 0]
            if live.size:
                cvg_avg = float(live.mean())
        n_masked = 0
        masked_nodes = set()
        for node in sorted(set(out_links)):
            outn = len(self._valid_outs(linkset, out_links, node))
            inn = len(self._valid_outs(linkset, out_links, node ^ 1))
            if outn <= 1 and inn <= 1:
                continue
            sc = self.chains[node >> 1]
            if len(sc.ctgs) != 1:
                continue  # bound chains carry consistent evidence
            c = sc.ctgs[0]
            if self.mask[c]:
                continue
            is_repeat = False
            if cvg_avg and self.cvg_dir is not None \
                    and self.cvg_dir[c] > 1.4 * cvg_avg:
                is_repeat = True
            else:
                ok_in = (inn <= 1) or self._check_unique(
                    linkset, out_links, node ^ 1, chain_len_of, tolerance)
                ok_out = (outn <= 1) or self._check_unique(
                    linkset, out_links, node, chain_len_of, tolerance)
                is_repeat = not (ok_in and ok_out)
            if is_repeat:
                self.mask[c] = self.mask[c ^ 1] = True
                masked_nodes.add(node)
                masked_nodes.add(node ^ 1)
                n_masked += 1
        if masked_nodes:
            for kp in [kp for kp in linkset
                       if kp[0] in masked_nodes or kp[1] in masked_nodes]:
                del linkset[kp]
        return n_masked

    # -- detectBreakScaff (orderContig.c:9141) ------------------------------
    def detect_break_scaff(self, links: LinkTable, insert_size: int,
                           weak_pe: int) -> int:
        """Break the WEAKEST junction of a chain when long-insert support
        singles it out (detectBreakScaff, orderContig.c:9141-9330):

        A chain qualifies only when it is at least one insert long AND the
        average spanning support over its junctions is >= 10 (avgPE,
        orderContig.c:9216-9220 — low coverage means absence of evidence
        proves nothing).  Among interior junctions (>= one insert of
        sequence on both sides), the one with minimum support breaks iff
        its support <= 2 or <= avgPE/5 (orderContig.c:9284).  At most one
        break per chain per rank, like the reference."""
        span_w: Dict[Tuple[int, int], int] = {}
        for a, b, w in zip(links.c1, links.c2, links.weight):
            span_w[(int(a), int(b))] = span_w.get((int(a), int(b)), 0) + int(w)
        if not span_w:
            return 0
        new_chains: List[Scaffold] = []
        n_broken = 0
        for sc in self.chains:
            m = len(sc.ctgs)
            if m < 2:
                new_chains.append(sc)
                continue
            # chain coordinates
            start = np.zeros((m,), np.int64)
            acc = 0
            for j, c in enumerate(sc.ctgs):
                start[j] = acc
                acc += int(self.ctg_len[c]) + (
                    gap_span(sc.gaps[j]) if j < m - 1 else 0
                )
            total = acc
            if total < insert_size:
                new_chains.append(sc)
                continue
            idx = {c: j for j, c in enumerate(sc.ctgs)}
            support = np.zeros((m - 1,), np.int64)
            for (a, b), w in span_w.items():
                ja = idx.get(a)
                jb = idx.get(b)
                if ja is None or jb is None or ja >= jb:
                    continue
                support[ja:jb] += w
            # junction bind metadata, when the chain carries it: the
            # reference's weakCnt/avgPE use the junction's OWN short-PE
            # support (bindCnt->maxGap, orderContig.c:9000-9040) and only
            # bySmall bind chains are breakable (:8939/:8960); the
            # long-insert spanning support then CONFIRMS the break
            # (checkScafConsist's role)
            have_meta = (len(sc.jweight) == m - 1
                         and any(w_ > 0 for w_ in sc.jweight))
            if have_meta:
                own = np.asarray(sc.jweight, np.int64)
                small = np.asarray(sc.jsmall, bool)
                counted = own > 0
                avg_pe = float(own[counted].mean()) if counted.any() else 0.0
            else:
                own = support
                small = np.ones((m - 1,), bool)
                avg_pe = float(support.mean())
            if avg_pe < 10:
                new_chains.append(sc)
                continue
            # weakest interior junction (one insert of flank on each side)
            weak_j = -1
            weak_w = None
            for j in range(m - 1):
                junction = start[j] + int(self.ctg_len[sc.ctgs[j]])
                if junction < insert_size or total - junction < insert_size:
                    continue
                if have_meta and not small[j]:
                    continue  # long-insert-made junctions don't break
                if weak_w is None or own[j] < weak_w:
                    weak_w = int(own[j])
                    weak_j = j
            if weak_j < 0 or (weak_w > 2 and weak_w > avg_pe / 5):
                new_chains.append(sc)
                continue
            if have_meta and support[weak_j] >= weak_pe:
                # long-insert pairs consistently span the weak junction:
                # the chain is confirmed, don't break (checkScafConsist)
                new_chains.append(sc)
                continue
            n_broken += 1
            jw = sc.jweight if len(sc.jweight) == m - 1 else [0] * (m - 1)
            js = sc.jsmall if len(sc.jsmall) == m - 1 else [False] * (m - 1)
            new_chains.append(
                Scaffold(sc.ctgs[: weak_j + 1], sc.gaps[:weak_j],
                         jw[:weak_j], js[:weak_j])
            )
            new_chains.append(
                Scaffold(sc.ctgs[weak_j + 1 :], sc.gaps[weak_j + 1 :],
                         jw[weak_j + 1 :], js[weak_j + 1 :])
            )
        self.chains = new_chains
        self.n_breaks += n_broken
        return n_broken

    # -- maskRepeatByArc (loadGraph.c:207) -----------------------------------
    def mask_repeat_by_arc(self, arcs: Dict[int, List[Tuple[int, int]]]) -> int:
        """Mask contigs whose strongest in- plus out-arc weight is >= 4x
        the average arc weight (maskRepeatByArc, loadGraph.c:207 — present
        but disabled at its call site loadGraph.c:507; opt-in here).

        ``arcs``: directed contig id -> [(to, weight), ...].  The max
        incoming arc weight of contig c equals the max outgoing weight of
        its twin c^1."""
        weights = [w for outs in arcs.values() for _, w in outs]
        if not weights:
            return 0
        avg = sum(weights) / len(weights)
        n_masked = 0
        for t in range(self.n_dir // 2):
            c = 2 * t
            if self.mask[c]:
                continue
            w_out = max((w for _, w in arcs.get(c, ())), default=0)
            w_in = max((w for _, w in arcs.get(c ^ 1, ())), default=0)
            if w_out + w_in >= 4 * avg:
                self.mask[c] = self.mask[c ^ 1] = True
                n_masked += 1
        return n_masked

    # -- arc-route gap placement (scaffolding, orderContig.c:4972) -----------
    def fill_gaps_by_arc(
        self,
        arcs: Dict[int, List[Tuple[int, int]]],
        k: int,
        gap_len_diff: int = 50,
        max_steps: int = 10,
        max_routes: int = 5,
    ) -> List[Tuple[int, int, List[int]]]:
        """Close scaffold gaps with contig-graph arc routes
        (traceAlongArc, searchPath.c:182, called from scaffolding
        orderContig.c:4972/5067): for each junction (A, B) with estimated
        gap g, search arc paths A -> x1 .. xm -> B through masked or
        unplaced contigs whose realized gap  sum(len(xi)) - (m+1)k
        is within ``gap_len_diff`` of g (the reference's -G).  A unique
        in-window route is committed: intermediates are spliced into the
        chain with exact -k overlaps, giving gap-free sequence.

        Arc-adjacent contigs share a full k-mer junction (the vertex
        between consecutive edges; linear_concatenate merges on the same
        k-base overlap) — k-1 here inserted one extra base per spliced
        junction.

        Returns [(chain_idx, junction_idx, [placed directed contigs])].
        """
        ov = k
        placed_global: set = set()
        in_chain = {c >> 1 for sc in self.chains if len(sc.ctgs) > 1
                    for c in sc.ctgs}
        fills: List[Tuple[int, int, List[int]]] = []
        for si, sc in enumerate(self.chains):
            if len(sc.ctgs) < 2:
                continue
            j = 0
            while j < len(sc.ctgs) - 1:
                a, b = sc.ctgs[j], sc.ctgs[j + 1]
                g_est = int(sc.gaps[j])
                if is_splice(g_est):
                    j += 1
                    continue
                lo, hi = g_est - gap_len_diff, g_est + gap_len_diff
                routes: List[List[int]] = []

                def dfs(cur: int, realized: int, path: List[int]):
                    if len(routes) >= max_routes:
                        return
                    for t, _w in arcs.get(cur, ()):
                        if t == b:
                            if path and lo <= realized - ov <= hi:
                                routes.append(list(path))
                            continue
                        u = t >> 1
                        if (
                            len(path) < max_steps
                            and (self.mask[t] or u not in in_chain)
                            and u not in placed_global
                            and all((p >> 1) != u for p in path)
                        ):
                            nr = realized + int(self.ctg_len[t]) - ov
                            if nr - ov <= hi:
                                dfs(t, nr, path + [t])

                dfs(a, 0, [])
                # drop duplicate routes (same contig set, both orientations)
                uniq = {tuple(r) for r in routes}
                if len(uniq) == 1:
                    path = routes[0]
                    sc.ctgs[j + 1 : j + 1] = path
                    sc.gaps[j : j + 1] = [splice_gap(ov)] * (len(path) + 1)
                    for c in path:
                        self.mask[c] = self.mask[c ^ 1] = False
                        placed_global.add(c >> 1)
                    fills.append((si, j, path))
                    j += len(path) + 1
                else:
                    j += 1
        self.n_recovered += sum(len(p) for _, _, p in fills)
        return fills

    # -- recoverMask (orderContig.c:2682) -----------------------------------
    def recover_mask(self, ins_var: int = 50, max_steps: int = 5) -> int:
        """Place masked contigs back into chain gaps via bounded route
        search over accumulated links (traceAlongConnect, searchPath.c:109):
        for each adjacent chain pair (start, finish), search masked-contig
        routes start -> ... -> finish whose length matches the gap within
        1.5 * ins_var; a unique route is committed into the chain."""
        outs: Dict[int, List[Tuple[int, int, int]]] = {}
        for (a, b), rec in self.ctg_links.items():
            outs.setdefault(a, []).append((b, rec[0], rec[1]))
        recovered = 0
        for sc in self.chains:
            if len(sc.ctgs) < 2:
                continue
            j = 0
            while j < len(sc.ctgs) - 1:
                start, finish = sc.ctgs[j], sc.ctgs[j + 1]
                target = sc.gaps[j] + int(self.ctg_len[finish])
                lo = target - int(1.5 * ins_var)
                hi = target + int(1.5 * ins_var)
                routes: List[Tuple[List[int], List[int]]] = []

                def dfs(cur: int, length: int, path: List[int],
                        gaps: List[int]):
                    if len(routes) > 1:
                        return  # only uniqueness matters
                    for t, w, g in outs.get(cur, ()):
                        if t == finish and path:
                            total = length + g + int(self.ctg_len[finish])
                            if lo <= total <= hi:
                                routes.append((list(path), gaps + [g]))
                            continue
                        if (
                            len(path) < max_steps - 1
                            and self.mask[t]
                            and t not in path
                            and (t ^ 1) not in path
                        ):
                            nl = length + g + int(self.ctg_len[t])
                            if nl <= hi:
                                dfs(t, nl, path + [t], gaps + [g])

                dfs(start, 0, [], [])
                if len(routes) == 1:
                    path, gaps = routes[0]
                    sc.ctgs[j + 1 : j + 1] = path
                    sc.gaps[j : j + 1] = gaps
                    for c in path:
                        self.mask[c] = self.mask[c ^ 1] = False
                    recovered += len(path)
                    j += len(path) + 1
                else:
                    j += 1
        self.n_recovered += recovered
        return recovered

    def _stitch(self, oriented_chains: List[int], gaps: List[int],
                metas: Optional[List[Tuple[int, bool]]] = None) -> Scaffold:
        """Concatenate oriented chains; ``metas`` carries (weight,
        by_small) for each NEW junction (freezing's bind metadata)."""
        ctgs: List[int] = []
        out_gaps: List[int] = []
        out_jw: List[int] = []
        out_js: List[bool] = []
        for idx, oc in enumerate(oriented_chains):
            ch, o = oc >> 1, oc & 1
            sc = self.chains[ch]
            cl = sc.ctgs if not o else [
                int(twin_ctg(np.int64(c))) for c in reversed(sc.ctgs)
            ]
            gl = sc.gaps if not o else list(reversed(sc.gaps))
            m = len(sc.ctgs) - 1
            jw = sc.jweight if len(sc.jweight) == m else [0] * m
            js = sc.jsmall if len(sc.jsmall) == m else [False] * m
            if o:
                jw, js = list(reversed(jw)), list(reversed(js))
            if idx > 0:
                out_gaps.append(gaps[idx - 1])
                w_, s_ = (metas[idx - 1] if metas is not None
                          else (0, False))
                out_jw.append(int(w_))
                out_js.append(bool(s_))
            ctgs.extend(cl)
            out_gaps.extend(gl)
            out_jw.extend(jw)
            out_js.extend(js)
        return Scaffold(ctgs=ctgs, gaps=out_gaps, jweight=out_jw,
                        jsmall=out_js)

    def result(self) -> List[Scaffold]:
        return [c for c in self.chains if c.ctgs]


# ---------------------------------------------------------------------------
# stage driver + output
# ---------------------------------------------------------------------------


def _concat_links(tables: List[LinkTable]) -> LinkTable:
    """Pool link tables of one rank (inputLinks accumulates grads of equal
    rank into the same CONNECT set), merging duplicate (c1, c2) pairs."""
    live = [t for t in tables if t.c1.size]
    if not live:
        return LinkTable(*(np.zeros((0,), np.int32) for _ in range(4)))
    if len(live) == 1:
        return live[0]
    c1 = np.concatenate([t.c1 for t in live])
    c2 = np.concatenate([t.c2 for t in live])
    w = np.concatenate([t.weight for t in live])
    g = np.concatenate([t.gap for t in live])
    key = c1.astype(np.int64) << 32 | c2.astype(np.int64)
    order = np.argsort(key, kind="stable")
    key, w, g = key[order], w[order], g[order]
    new = np.ones(key.shape, bool)
    new[1:] = key[1:] != key[:-1]
    grp = np.cumsum(new) - 1
    wsum = np.bincount(grp, weights=w.astype(np.float64))
    gavg = np.bincount(grp, weights=(g * w).astype(np.float64)) / np.maximum(
        wsum, 1
    )
    uk = key[new]
    return LinkTable(
        c1=(uk >> 32).astype(np.int32),
        c2=(uk & 0xFFFFFFFF).astype(np.int32),
        weight=wsum.astype(np.int32),
        gap=gavg.astype(np.int32),
    )


@dataclasses.dataclass
class ScaffResult:
    scaffolds: List[Scaffold]
    seqs: List[str]
    stats: dict
    gap_seqs: List[str] = dataclasses.field(default_factory=list)
    grads_links: List[LinkTable] = dataclasses.field(default_factory=list)
    # (chain idx, junction idx, placed contigs) from arc-route gap closure
    arc_fills: List[Tuple[int, int, List[int]]] = dataclasses.field(
        default_factory=list
    )
    # (kept, removed) directed contigs from -B SNP-bubble collapse
    snp_pairs: List[Tuple[int, int]] = dataclasses.field(default_factory=list)


def run_scaff(
    map_result: mp.MapResult,
    contig_seqs: List[str],
    min_ctg_len: int = 0,
    contig_cvg: Optional[np.ndarray] = None,
    fill: bool = False,
    progress: bool = True,
    ctg_arcs: Optional[Dict[int, List[Tuple[int, int]]]] = None,
    k: int = 0,
    mask_repeat_arc: bool = False,
    unmask: bool = False,
    gap_len_diff: int = 50,
    cvg4snp: float = 0.0,
    cvg_low: float = 0.1,
    cvg_high: float = 2.0,
    ins_var_idx: float = 1.5,
    score_mask: bool = True,
) -> ScaffResult:
    n = len(contig_seqs)
    ctg_len = np.zeros((2 * n,), np.int64)
    for t, s in enumerate(contig_seqs):
        ctg_len[2 * t] = ctg_len[2 * t + 1] = len(s)
    cvg_dir = None
    if contig_cvg is not None:
        cvg_dir = np.repeat(np.asarray(contig_cvg, np.float64), 2)
    # -L default: the reference masks contigs whose sans-overlap length
    # is < K+2 out of scaffolding (ctg_short = overlaplen + 2,
    # loadGraph.c:302-304, compared against the k-excluded length
    # at :483) — on bubble-dense graphs the short noise otherwise drowns
    # link building.  min_ctg_len is in the same sans-k units as -L.
    eff_l = min_ctg_len if min_ctg_len else (k + 2 if k else 0)
    full_cutoff = eff_l + k if eff_l else 0
    # -u (scaffold.c:149): keep high-coverage contigs unmasked
    sc = Scaffolder(ctg_len, cvg=cvg_dir, min_ctg_len=full_cutoff,
                    mask_high_cvg=not unmask, cvg4snp=cvg4snp,
                    contig_seqs=contig_seqs, k=k,
                    cvg_low=cvg_low, cvg_high=cvg_high,
                    ins_var_idx=ins_var_idx, score_mask=score_mask)
    if mask_repeat_arc and ctg_arcs:
        n_arc_masked = sc.mask_repeat_by_arc(ctg_arcs)
        if n_arc_masked and progress:
            log.info("maskRepeatByArc: %d contig(s) masked", n_arc_masked)

    id_lo = 0
    # grads sorted by insert size; grads of equal rank pool their links
    # into one ordering call (Links2Scaf:5766 rank loop)
    grads = map_result.pe_grads
    grads_links: List[LinkTable] = []
    pend_links: List[Tuple[LinkTable, int, int]] = []  # (links, ins, cutoff)
    for gi, g in enumerate(grads):
        links, new_ins = build_links_for_grad(
            map_result.read_id, map_result.ctg, map_result.pos,
            ctg_len, g.insert_size, id_lo, g.end_read_id,
        )
        grads_links.append(links)
        ins = new_ins if new_ins else g.insert_size
        if new_ins and progress:
            log.info("grad ins %d re-estimated to %d", g.insert_size, ins)
        pend_links.append((links, ins, g.pair_num_cutoff or 3))
        id_lo = g.end_read_id
        last = gi == len(grads) - 1
        if not last and grads[gi + 1].rank == g.rank:
            continue  # pool with the next grad of the same rank
        # weakPE policy (Links2Scaf:5865-5905): base 3, 5 for long
        # inserts, raised to the mean library cutoff
        ins_max = max(p[1] for p in pend_links)
        weak_pe = 5 if ins_max > 1000 else 3
        weak_pe = max(
            weak_pe,
            int(sum(p[2] for p in pend_links) / len(pend_links)),
        )
        pooled = _concat_links([p[0] for p in pend_links])
        # -w (score_mask=0, scaffold.c:172): keep weakly connected
        # contigs — skip weak-junction breaking
        if ins_max > 1000 and sc.score_mask:
            n_broken = sc.detect_break_scaff(pooled, ins_max, weak_pe)
            if n_broken and progress:
                log.info("detectBreakScaff: %d junction(s) broken", n_broken)
        sc.add_rank(pooled, weak_pe, ins_max, last_rank=last)
        pend_links = []
    n_rec = sc.recover_mask()
    if n_rec and progress:
        log.info("recoverMask: %d masked contig(s) recovered", n_rec)
    arc_fills: List[Tuple[int, int, List[int]]] = []
    if ctg_arcs and k:
        arc_fills = sc.fill_gaps_by_arc(ctg_arcs, k, gap_len_diff)
        if arc_fills and progress:
            log.info(
                "arc-route gap placement: %d gap(s) closed with %d contig(s)",
                len(arc_fills), sum(len(p) for _, _, p in arc_fills),
            )

    scaffolds = sc.result()
    if arc_fills:
        # result() drops empty chains; remap fill indices accordingly
        remap = {}
        for ci, ch in enumerate(sc.chains):
            if ch.ctgs:
                remap[ci] = len(remap)
        arc_fills = [
            (remap[si], j, p) for si, j, p in arc_fills if si in remap
        ]
    gap_seqs: List[str] = []
    all_pool = map_result.all_gap_reads()
    if fill and len(all_pool):
        from . import gapfill

        seqs, gap_seqs, fstats = gapfill.fill_gaps(
            scaffolds, contig_seqs, all_pool, progress=progress,
        )
    else:
        seqs = [scaffold_sequence(s, contig_seqs) for s in scaffolds]
    stats = sim_utils.assembly_stats(seqs)
    if progress:
        if sc.snp_pairs:
            log.info("removeBubbleCtg: %d SNP bubble(s) collapsed",
                     len(sc.snp_pairs))
        log.info("scaff: %s", stats)
    return ScaffResult(
        scaffolds=scaffolds, seqs=seqs, stats=stats, gap_seqs=gap_seqs,
        grads_links=grads_links, arc_fills=arc_fills,
        snp_pairs=sc.snp_pairs,
    )


_RC = bytes.maketrans(b"ACGTN", b"TGCAN")


def _dir_ctg_seq(c: int, contig_seqs: List[str]) -> str:
    s = contig_seqs[c >> 1]
    if c & 1:
        return s.encode().translate(_RC)[::-1].decode()
    return s


def scaffold_sequence(sc: Scaffold, contig_seqs: List[str]) -> str:
    out = _dir_ctg_seq(int(sc.ctgs[0]), contig_seqs) if sc.ctgs else ""
    for j in range(1, len(sc.ctgs)):
        g = int(sc.gaps[j - 1])
        nxt = _dir_ctg_seq(int(sc.ctgs[j]), contig_seqs)
        if is_splice(g):
            ov = splice_overlap(g)
            # splices claim an exact junction — verify it rather than
            # silently emitting chimeric sequence
            if ov <= len(nxt) and out.endswith(nxt[:ov]):
                out += nxt[ov:]
            else:
                out += "N" + nxt
        else:
            out += "N" * max(g, 1) + nxt
    return out
