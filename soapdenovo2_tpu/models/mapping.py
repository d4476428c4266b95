"""Map stage: read -> contig alignment by k-mer voting.

TPU-native counterpart of standardPregraph/map.c ``call_align:96``:

  * contig k-mer index (prlHashCtg.c ``prlContig2nodes:317``): chop every
    contig into canonical k-mers; k-mers seen more than once across all
    contigs are repeat-masked (dropped), survivors store
    (contig id, position, strand) — here as parallel flat arrays beside a
    sorted key table instead of hash-set bitfields.
  * read voting (prlRead2Ctg.c ``parse1read:260``): a read maps to the
    contig with the most k-mer hits, requiring at least
    ``multi = max(2, min(len, 60) - k + 1)`` hits; position/orientation
    from the first hit of the winning contig.  The per-read group-by is
    an O(P^2) masked comparison (P = read positions), fully vectorized.

Directed contig ids follow the reference's twin convention: undirected
contig t yields ids (2t, 2t+1) = (canonical seq, reverse complement).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io import reads as rio
from ..ops import kmer as kops
from ..ops import sortcount as sc

log = logging.getLogger("soapdenovo2_tpu.map")

ALIGN_LEN = 60  # prlRead2Ctg.c ALIGNLEN


@dataclasses.dataclass
class ContigIndex:
    k: int
    keys: np.ndarray  # (C, W) sorted canonical k-mers (unique, repeat-masked)
    cid: np.ndarray  # (C,) int32 — EVEN directed contig id (2t)
    pos: np.ndarray  # (C,) int32 — k-mer start offset within contig 2t
    flip: np.ndarray  # (C,) bool — canonical k-mer is the RC of the contig k-mer
    ctg_len: np.ndarray  # (2N,) int32
    n_contigs: int  # undirected count N
    # prefix directory over keys (sortcount.build_prefix_dir): one gather
    # narrows each streamed lookup to its bucket
    pdir: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((2,), np.int32))
    pdir_steps: int = 1
    pdir_shift: int = 0

    def with_dir(self) -> "ContigIndex":
        d, st, sh = sc.build_prefix_dir(self.keys, self.k)
        self.pdir, self.pdir_steps, self.pdir_shift = d, st, sh
        return self


def build_contig_index(contig_seqs: List[str], k: int,
                       batch_rows: int = 512) -> ContigIndex:
    """Chop contigs >= k+2 long into a repeat-masked k-mer index.

    Fully device-resident: per-batch extraction flattens into (rows, W)
    keys + (cid, pos, flip) payloads ON DEVICE, one device sort dedups
    and repeat-masks, and the arrays never cross the tunnel (the former
    host lexsort + per-batch downloads cost ~17 s at a 5M-kmer index)."""
    import jax

    kops.validate_k(k)
    n = len(contig_seqs)
    ctg_len = np.zeros((2 * n,), np.int32)
    dev_keys = []
    dev_cid = []
    dev_pos = []
    dev_flip = []
    dev_valid = []
    for t in range(n):
        ctg_len[2 * t] = ctg_len[2 * t + 1] = len(contig_seqs[t])
    order = sorted(range(n), key=lambda t: len(contig_seqs[t]))
    POS_BUDGET = 1 << 22
    i0 = 0
    while i0 < n:
        maxlen = k
        rows = []
        while i0 < n and len(rows) < batch_rows:
            ln = max(len(contig_seqs[order[i0]]), k)
            new_max = max(maxlen, ln)
            if rows and new_max * (len(rows) + 1) > POS_BUDGET:
                break
            maxlen = new_max
            rows.append(order[i0])
            i0 += 1
        # pow2-bucketed width: long contigs otherwise give every batch a
        # distinct shape, and each fresh shape is a 10-25 s compile
        # through the remote tunnel (the 50 Mb index build spent 270 s
        # compiling 82 one-contig shapes)
        maxlen = _pow2(maxlen, lo=256)
        codes = np.full((len(rows), maxlen), kops.BASE_N, np.uint8)
        lengths = np.zeros((len(rows),), np.int32)
        for r, t in enumerate(rows):
            seq = contig_seqs[t]
            if len(seq) < k + 2:  # prlContig2nodes skips short contigs
                continue
            lengths[r] = rio.encode_read(seq.encode(), codes[r])
        out = kops.extract_kmers(jnp.asarray(codes), jnp.asarray(lengths), k)
        R, P, W = out["words"].shape
        dev_keys.append(out["words"].reshape(R * P, W))
        dev_valid.append(out["valid"].reshape(R * P))
        dev_flip.append(out["is_rc"].reshape(R * P))
        rows_dev = jnp.asarray(np.asarray(rows, np.int32) * 2)
        dev_cid.append(jnp.repeat(rows_dev, P))
        dev_pos.append(jnp.tile(jnp.arange(P, dtype=jnp.int32), R))
    w = kops.num_words(k)
    if not dev_keys:
        return ContigIndex(k, np.zeros((0, w), np.uint32),
                           np.zeros((0,), np.int32), np.zeros((0,), np.int32),
                           np.zeros((0,), bool), ctg_len, n).with_dir()
    keys = jnp.concatenate(dev_keys)
    valid = jnp.concatenate(dev_valid)
    cid = jnp.concatenate(dev_cid)
    pos = jnp.concatenate(dev_pos)
    flip = jnp.concatenate(dev_flip)
    keys, cid, pos, flip, n_live = _index_sort_dedup(
        keys, valid, cid, pos, flip
    )
    nl = int(n_live)  # one scalar readback
    idx = ContigIndex(
        k=k, keys=keys[:_pow2(nl)], cid=cid[:_pow2(nl)],
        pos=pos[:_pow2(nl)], flip=flip[:_pow2(nl)],
        ctg_len=ctg_len, n_contigs=n,
    )
    # trim to exactly nl live rows (sentinel tail rows keep lookups
    # correct, but the pow2 slice bounds memory)
    idx.keys = idx.keys[:nl] if nl else idx.keys[:0]
    idx.cid = idx.cid[:nl]
    idx.pos = idx.pos[:nl]
    idx.flip = idx.flip[:nl]
    d, st, sh = sc.build_prefix_dir_device(idx.keys, k)
    idx.pdir, idx.pdir_steps, idx.pdir_shift = d, st, sh
    return idx


def _pow2(x: int, lo: int = 1) -> int:
    return max(lo, 1 << max(x - 1, 0).bit_length())


@jax.jit
def _index_sort_dedup(keys, valid, cid, pos, flip):
    """Device sort + repeat-mask: unique k-mers only (singleKmer:129)."""
    W = keys.shape[1]
    keys = jnp.where(valid[:, None], keys, jnp.uint32(0xFFFFFFFF))
    ops = tuple(keys[:, i] for i in range(W)) + (
        cid.astype(jnp.int32), pos.astype(jnp.int32),
        flip.astype(jnp.int32),
    )
    out = jax.lax.sort(ops, num_keys=W)
    sk = jnp.stack(out[:W], axis=-1)
    cid_s, pos_s, flip_s = out[W], out[W + 1], out[W + 2]
    live = ~jnp.all(sk == jnp.uint32(0xFFFFFFFF), axis=-1)
    boundary = jnp.any(sk[1:] != sk[:-1], axis=-1)  # UNMASKED: the
    # last live group's boundary to the sentinel rows must count
    new = jnp.concatenate([jnp.ones((1,), bool), boundary]) & live
    nxt_boundary = jnp.concatenate([boundary, jnp.ones((1,), bool)])
    uniq = new & nxt_boundary & live  # group of size exactly 1
    # compact unique rows to the front (stable sort by ~uniq)
    iota = jnp.arange(sk.shape[0], dtype=jnp.int32)
    _, perm = jax.lax.sort(
        (jnp.where(uniq, 0, 1).astype(jnp.int32), iota),
        num_keys=1, is_stable=True,
    )
    n_live = jnp.sum(uniq.astype(jnp.int32))
    in_range = iota < n_live
    ks2 = jnp.where(in_range[:, None], sk[perm], jnp.uint32(0xFFFFFFFF))
    return (ks2, cid_s[perm], pos_s[perm],
            flip_s[perm].astype(bool), n_live)


@functools.partial(jax.jit, static_argnames=(
    "k", "align_len", "half_rule", "pdir_steps", "pdir_shift", "L"))
def _map_batch_packed(packed, lengths, n_rows, n_cols, L, k,
                      keys, cid, pos, flip, ctg_len,
                      align_len: int = ALIGN_LEN, half_rule: bool = False,
                      pdir=None, pdir_steps: int = 0, pdir_shift: int = 0):
    codes = kops.unpack_codes(packed, lengths, L, n_rows, n_cols)
    ctg, position, mapped, multi = _map_batch.__wrapped__(
        codes, lengths, k, keys, cid, pos, flip, ctg_len,
        align_len=align_len, half_rule=half_rule,
        pdir=pdir, pdir_steps=pdir_steps, pdir_shift=pdir_shift,
    )
    # ONE packed output array: the tunnel charges ~0.1 s latency per
    # device->host transfer; four per batch was ~2.8 s of the 2 Mb map
    return jnp.stack([ctg.astype(jnp.int32), position,
                      mapped.astype(jnp.int32), multi.astype(jnp.int32)])


@functools.partial(jax.jit, static_argnames=(
    "k", "align_len", "half_rule", "pdir_steps", "pdir_shift"))
def _map_batch_stack(codes, lengths, k, keys, cid, pos, flip, ctg_len,
                     align_len: int = ALIGN_LEN, half_rule: bool = False,
                     pdir=None, pdir_steps: int = 0, pdir_shift: int = 0):
    """_map_batch with the four outputs stacked into one (4, B) i32
    array — a single device->host transfer per batch (see
    _map_batch_packed note)."""
    ctg, position, mapped, multi = _map_batch.__wrapped__(
        codes, lengths, k, keys, cid, pos, flip, ctg_len,
        align_len=align_len, half_rule=half_rule,
        pdir=pdir, pdir_steps=pdir_steps, pdir_shift=pdir_shift,
    )
    return jnp.stack([ctg.astype(jnp.int32), position,
                      mapped.astype(jnp.int32), multi.astype(jnp.int32)])


@functools.partial(jax.jit, static_argnames=(
    "k", "align_len", "half_rule", "pdir_steps", "pdir_shift"))
def _map_batch(codes, lengths, k, keys, cid, pos, flip, ctg_len,
               align_len: int = ALIGN_LEN, half_rule: bool = False,
               pdir=None, pdir_steps: int = 0, pdir_shift: int = 0):
    """Vectorized parse1read over a read batch.

    Returns (ctg (B,), position (B,), mapped (B,), multi_ctg (B,)):
    directed contig id, 0-based read-start position on it, mapped flag,
    and the 'hits multiple contigs' flag feeding *.readInGap.

    ``align_len`` is the per-library ALIGNLEN (lib map_len clamped to
    >=35 for long-insert libs / >=32 otherwise, prlRead2Ctg.c:907-916);
    ``half_rule`` applies the long-insert per-read floor
    ``ALIGNLEN >= len/2 + 1`` (prlRead2Ctg.c:925).  Like the reference,
    the threshold counts k-mer hits anywhere in the read — ALIGNLEN only
    sizes the required hit count (parse1read:270-271).
    """
    out = kops.extract_kmers(codes, lengths, k)
    if pdir is not None:
        idx = sc.lookup_kmers_dir(keys, out["words"], pdir,
                                  pdir_steps, pdir_shift)  # (B, P)
    else:
        idx = sc.lookup_kmers(keys, out["words"])  # (B, P)
    ok = (idx >= 0) & out["valid"]
    safe = jnp.maximum(idx, 0)
    hit_cid = jnp.where(ok, cid[safe], -1)  # (B, P)
    hit_pos = jnp.where(ok, pos[safe], 0)
    hit_flip = flip[safe] != 0
    read_flip = out["is_rc"]
    # read aligns forward on contig 2t iff strands agree; else on 2t+1
    fwd = hit_flip == read_flip

    B, P = hit_cid.shape
    # per-read contig vote, SORT-based (O(P log P) per read instead of the
    # former (B, P, P) masked-comparison tensor — 134 MB at 8192x150 bp
    # and quadratic for long reads): sort each row's hits by contig id
    # (stable, so read order is kept within a run), then run-length
    # arithmetic gives every hit its contig's total count and run head.
    iota = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (B, P))
    sort_key = jnp.where(hit_cid >= 0, hit_cid, jnp.int32(2**30))
    key_s, p_s = jax.lax.sort((sort_key, iota), num_keys=1, is_stable=True)
    valid_s = key_s < 2**30
    # run boundaries from the UNMASKED key change: the boundary between
    # the last real contig run and the sentinel run must count, or the
    # trailing invalid slots inflate the last run's length
    boundary = key_s[:, 1:] != key_s[:, :-1]  # (B, P-1)
    new = jnp.concatenate(
        [jnp.ones((B, 1), bool), boundary], axis=1
    ) & valid_s  # run heads (first occurrence in read order per contig)
    pos_idx = jnp.arange(P, dtype=jnp.int32)[None, :]
    # start of each element's run / start of the NEXT run -> run length
    run_start = jax.lax.cummax(jnp.where(new, pos_idx, 0), axis=1)
    next_is_boundary = jnp.concatenate(
        [boundary, jnp.ones((B, 1), bool)], axis=1
    )
    nxt_start = jax.lax.cummin(
        jnp.where(next_is_boundary, pos_idx + 1, P), axis=1, reverse=True
    )
    count_s = jnp.where(valid_s, nxt_start - run_start, 0)  # (B, P)

    # multi threshold from the per-library ALIGNLEN (see docstring)
    if half_rule:
        eff = jnp.maximum(jnp.int32(align_len), lengths // 2 + 1)
    else:
        eff = jnp.int32(align_len)
    alen = jnp.minimum(lengths, eff)
    multi = jnp.maximum(alen - k + 1, 2)  # (B,)
    # winner: max count, ties to the contig whose FIRST hit comes
    # earliest in read order (parse1read scans hits in order and takes a
    # strictly greater count to switch, prlRead2Ctg.c:322)
    elig = new & (count_s >= multi[:, None])
    score = jnp.where(elig, count_s * (P + 1) + (P - p_s), 0)
    best_sp = jnp.argmax(score, axis=1)  # index in SORTED order
    best_score = jnp.take_along_axis(score, best_sp[:, None], axis=1)[:, 0]
    mapped = best_score > 0

    bidx = jnp.arange(B)
    best_p = p_s[bidx, best_sp]  # original read offset of the first hit
    c2t = hit_cid[bidx, best_p]  # even id
    p0 = hit_pos[bidx, best_p]
    i0 = best_p  # read offset of the hit k-mer
    is_fwd = fwd[bidx, best_p]
    clen = ctg_len[jnp.maximum(c2t, 0)]
    ctg = jnp.where(is_fwd, c2t, c2t + 1)
    position = jnp.where(is_fwd, p0 - i0, clen - p0 - k - i0)

    # counter2: distinct contigs with >=2 hits (>=1 for k>32) -> gap read
    thresh = 2 if k < 32 else 1
    n_multi = jnp.sum(new & (count_s >= thresh), axis=1)
    multi_ctg = n_multi > 1
    return (
        jnp.where(mapped, ctg, -1),
        position.astype(jnp.int32),
        mapped,
        multi_ctg,
    )


@dataclasses.dataclass
class GapReads:
    """Unplaced reads anchored by their mapped mates — the gap-filling
    read pool (the role of *.readInGap.gz + *.PEreadOnContig.gz,
    prlRead2Ctg.c:863-880 / prlReadFillGap.c loadReads4gap:206).

    ``anchor_ctg``/``anchor_pos`` locate the MAPPED mate; the read itself
    is expected ~insert_size downstream of the mate's start along the
    anchor contig's direction, on the opposite strand."""

    anchor_ctg: List[int]  # directed contig of the mapped mate
    anchor_pos: List[int]  # mate read-start position on it
    insert_size: List[int]  # library insert size
    seqs: List[bytes]  # 2-bit-coded read bytes (uint8 codes)
    # which mate fell in the gap: 1=read1, 2=read2, 0=unknown/long
    # (the dhflag of output1read_gz, prlRead2Ctg.c:445)
    dh: List[int] = dataclasses.field(default_factory=list)

    @staticmethod
    def empty() -> "GapReads":
        return GapReads([], [], [], [])

    def extend(self, other: "GapReads") -> None:
        self.anchor_ctg.extend(other.anchor_ctg)
        self.anchor_pos.extend(other.anchor_pos)
        self.insert_size.extend(other.insert_size)
        self.seqs.extend(other.seqs)
        self.dh.extend(other.dh)

    def __len__(self) -> int:
        return len(self.seqs)


@dataclasses.dataclass
class MapResult:
    """Read->contig placements for the scaffolder (host arrays)."""

    read_id: np.ndarray  # (M,) int64
    ctg: np.ndarray  # (M,) int32 directed contig id
    pos: np.ndarray  # (M,) int32 read start on contig (0-based, may be <0)
    gap_read_ids: np.ndarray  # reads hitting >1 contig (readInGap candidates)
    n_reads: int
    pe_grads: List[rio.PeGrad]
    gap_reads: "GapReads" = dataclasses.field(default_factory=lambda: GapReads.empty())
    # asm_flags=4 long-read pool, kept apart so it lands in
    # *.longReadInGap while PE entries go to *.readInGap.gz
    long_reads: "GapReads" = dataclasses.field(default_factory=lambda: GapReads.empty())

    def all_gap_reads(self) -> "GapReads":
        if not len(self.long_reads):
            return self.gap_reads
        merged = GapReads.empty()
        merged.extend(self.gap_reads)
        merged.extend(self.long_reads)
        return merged


def map_reads(
    batch_iter: Iterable[rio.ReadBatch],
    index: ContigIndex,
    progress: bool = True,
    gap_pool: Optional[GapReads] = None,
    insert_size: int = 0,
    mapper=None,
    align_len: int = ALIGN_LEN,
    half_rule: bool = False,
    long_pool: Optional[GapReads] = None,
    pe_sink=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Map a read stream; returns (read_id, ctg, pos, gap_read_ids, n).

    When ``gap_pool`` is given, reads that did not place uniquely but
    whose PE mate did are collected (with the mate as anchor) for gap
    filling — pairs are adjacent (even, odd) rows within a batch.

    When ``long_pool`` is given the stream is treated as LONG reads
    (prlLongRead2Ctg, prlRead2Ctg.c:1080): every mapped read that also
    hits a second contig (the reference's ``footprint``,
    parse1read:335-338) joins the gap pool anchored at its OWN placement
    with the token insert 18 (prlRead2Ctg.c:1206) — the read lies across
    a contig boundary, i.e. across a scaffold gap.
    """
    rid_list, ctg_list, pos_list, gap_list = [], [], [], []
    keys = jnp.asarray(index.keys)
    pdir_dev = jnp.asarray(index.pdir)
    cid = jnp.asarray(index.cid)
    pos_a = jnp.asarray(index.pos)
    flip = jnp.asarray(index.flip.astype(np.int8))
    clen = jnp.asarray(index.ctg_len)
    n_reads = 0

    def consume(batch, dev_out):
        nonlocal n_reads
        if isinstance(dev_out, tuple):  # sharded mapper: 4 device arrays
            ctg, position, mapped, multi_ctg = dev_out
            ctg = np.asarray(ctg)[: batch.n]
            position = np.asarray(position)[: batch.n]
            mapped_np = np.asarray(mapped)[: batch.n].astype(bool)
            multi_np = np.asarray(multi_ctg)[: batch.n].astype(bool)
        else:  # single-device: one packed (4, B) i32 download
            out = np.asarray(dev_out)
            ctg = out[0, : batch.n]
            position = out[1, : batch.n]
            mapped_np = out[2, : batch.n].astype(bool)
            multi_np = out[3, : batch.n].astype(bool)
        ids = batch.start_id + np.arange(batch.n, dtype=np.int64)
        sel = mapped_np
        rid_list.append(ids[sel])
        ctg_list.append(ctg[sel])
        pos_list.append(position[sel])
        gap_list.append(ids[multi_np])
        if long_pool is not None:
            for i in np.nonzero(mapped_np & multi_np)[0]:
                long_pool.seqs.append(
                    batch.codes[i, : batch.lengths[i]].tobytes()
                )
                long_pool.anchor_ctg.append(int(ctg[i]))
                long_pool.anchor_pos.append(int(position[i]))
                long_pool.insert_size.append(18)
                long_pool.dh.append(0)
        if gap_pool is not None and batch.start_id % 2 == 0:
            half = batch.n // 2
            m = mapped_np[: 2 * half].reshape(half, 2)
            mc = multi_np[: 2 * half].reshape(half, 2)
            c2 = ctg[: 2 * half].reshape(half, 2)
            p2 = position[: 2 * half].reshape(half, 2)
            for me_col in (0, 1):
                mate_col = 1 - me_col
                take = m[:, mate_col] & (~m[:, me_col] | mc[:, me_col])
                for p in np.nonzero(take)[0]:
                    i = 2 * p + me_col
                    gap_pool.seqs.append(
                        batch.codes[i, : batch.lengths[i]].tobytes()
                    )
                    gap_pool.anchor_ctg.append(int(c2[p, mate_col]))
                    gap_pool.anchor_pos.append(int(p2[p, mate_col]))
                    gap_pool.insert_size.append(insert_size)
                    gap_pool.dh.append(me_col + 1)
            if pe_sink is not None:
                # -f: both mates mapped -> *.PEreadOnContig.gz
                # (getPEreadOnContig, prlRead2Ctg.c:499)
                both = m[:, 0] & m[:, 1]
                for p in np.nonzero(both)[0]:
                    i1, i2 = 2 * p, 2 * p + 1
                    pe_sink(
                        int(batch.lengths[i1]), int(c2[p, 0]),
                        int(p2[p, 0]),
                        batch.codes[i1, : batch.lengths[i1]],
                        int(batch.lengths[i2]), int(c2[p, 1]),
                        int(p2[p, 1]),
                        batch.codes[i2, : batch.lengths[i2]],
                        insert_size,
                    )
        n_reads += batch.n

    # ship the next batch to the device before draining the current one
    # (the reference's AIO double buffering, prlRead2Ctg.c batch loop)
    in_flight = None
    for batch in batch_iter:
        batch = batch.trimmed()
        if mapper is not None:
            # multi-chip: batch sharded over the mesh, index replicated
            # (parallel/shard_streams.ShardedMapper)
            dev = mapper.map_batch(batch.codes, batch.lengths,
                                   align_len=align_len, half_rule=half_rule)
        else:
            pi = kops.pack_codes_host(batch.codes, batch.lengths)
            if pi is None:
                dev = _map_batch_stack(
                    jnp.asarray(batch.codes), jnp.asarray(batch.lengths),
                    index.k, keys, cid, pos_a, flip, clen,
                    align_len=align_len, half_rule=half_rule,
                    pdir=pdir_dev, pdir_steps=index.pdir_steps,
                    pdir_shift=index.pdir_shift,
                )
            else:
                packed, nr, nc = pi
                dev = _map_batch_packed(
                    jnp.asarray(packed), jnp.asarray(batch.lengths),
                    jnp.asarray(nr), jnp.asarray(nc),
                    batch.codes.shape[1], index.k,
                    keys, cid, pos_a, flip, clen,
                    align_len=align_len, half_rule=half_rule,
                    pdir=pdir_dev, pdir_steps=index.pdir_steps,
                    pdir_shift=index.pdir_shift,
                )
        # start the device->host copy as soon as compute finishes, so
        # the transfer of batch i overlaps batch i+1's compute
        try:
            for leaf in (dev if isinstance(dev, tuple) else (dev,)):
                leaf.copy_to_host_async()
        except AttributeError:
            pass
        if in_flight is not None:
            consume(*in_flight)
        in_flight = (batch, dev)
    if in_flight is not None:
        consume(*in_flight)
    if rid_list:
        read_id = np.concatenate(rid_list)
        ctg_arr = np.concatenate(ctg_list)
        pos_arr = np.concatenate(pos_list)
        gaps = np.concatenate(gap_list)
    else:
        read_id = np.zeros((0,), np.int64)
        ctg_arr = np.zeros((0,), np.int32)
        pos_arr = np.zeros((0,), np.int32)
        gaps = np.zeros((0,), np.int64)
    if progress:
        log.info("map: %d/%d reads mapped", read_id.size, n_reads)
    return read_id, ctg_arr, pos_arr, gaps, n_reads


def _scan_max_read_len(lib, cap: int = 2048) -> int:
    """Longest read length in a library (the reference's
    getMaxLongReadLen file pre-scan), capped at ``cap``."""
    best = 0
    for seq in rio.iter_lib_reads(lib):
        if len(seq) > best:
            best = min(len(seq), cap)
            if best >= cap:
                break
    return best


def run_map(cfg, contig_seqs: List[str], k: int,
            batch_size: int = 8192, progress: bool = True,
            mesh="auto", pe_sink=None) -> MapResult:
    """map.c call_align:96 — index contigs, stream scaffolding libraries
    in ascending-insert order, record per-library read-id gradations.

    ``mesh``: "auto" data-parallelizes read batches over all visible
    devices with the contig index replicated (prlRead2Ctg.c:779's shared
    read-only index); None runs single-chip."""
    index = build_contig_index(contig_seqs, k)
    if progress:
        log.info("contig index: %d unique kmers over %d contigs",
                 index.keys.shape[0], index.n_contigs)
    # Large-index runs are tunnel-dispatch bound (50 Mb: 305 batches x
    # ~0.54 s/dispatch = most of the 166 s mapping time): 4x the read
    # batch quarters the round trips.  The per-batch kernel working set
    # (~160 MB of extracted words at 196k reads x 100 bp) stays far
    # below HBM.  Small runs keep the bench-warmed 49152 shapes.
    if index.keys.shape[0] >= (16 << 20) and batch_size <= 65536:
        batch_size *= 4
        if progress:
            log.info("map: large index -> batch %d", batch_size)
    if mesh == "auto":
        from ..parallel.shard_streams import default_mesh

        mesh = default_mesh()
    mapper = None
    if mesh is not None and mesh.devices.size > 1:
        from ..parallel.shard_streams import ShardedMapper

        mapper = ShardedMapper(mesh, index)
    grads: List[rio.PeGrad] = []
    all_rid, all_ctg, all_pos, all_gap = [], [], [], []
    gap_pool = GapReads.empty()
    next_id = 0
    from ..io import native_reads

    for lib in sorted(cfg.libs_for_scaff(), key=lambda l: l.avg_ins):
        # per-library ALIGNLEN clamp (prlRead2Ctg.c:907-916,925)
        long_ins = lib.avg_ins > 1000
        align = max(lib.map_len, 35 if long_ins else 32)
        rid, ctg, pos, gaps, n_lib = map_reads(
            native_reads.batch_reads_lib(
                lib, batch_size, cfg.max_rd_len, start_id=next_id,
                paired_only=True,
            ),
            index, progress=progress,
            gap_pool=gap_pool, insert_size=lib.avg_ins,
            mapper=mapper,
            align_len=align, half_rule=long_ins,
            pe_sink=pe_sink,
        )
        next_id += n_lib
        grads.append(
            rio.PeGrad(
                insert_size=lib.avg_ins,
                end_read_id=next_id,
                rank=lib.rank,
                pair_num_cutoff=lib.pair_num_cutoff or 3,
            )
        )
        all_rid.append(rid)
        all_ctg.append(ctg)
        all_pos.append(pos)
        all_gap.append(gaps)
    # long-read libraries (asm_flags=4): gap-closure only — the
    # prlLongRead2Ctg pass (prlRead2Ctg.c:1080).  Mapped reads spanning
    # >=2 contigs enter the gap pool anchored at their own placement.
    long_pool = GapReads.empty()
    for lib in cfg.libs_for_gap():
        long_len = _scan_max_read_len(lib, cap=2048)
        if long_len <= 0:
            continue
        n_before = len(long_pool)
        map_reads(
            native_reads.batch_reads_lib(
                lib, batch_size, max(cfg.max_rd_len, long_len),
            ),
            index, progress=False,
            mapper=None,  # long batches have their own shapes
            align_len=max(lib.map_len, 35),  # prlRead2Ctg.c:1201-1202
            long_pool=long_pool,
        )
        if progress:
            log.info(
                "long reads (asm_flags=4, len<=%d): %d gap reads",
                long_len, len(long_pool) - n_before,
            )
    return MapResult(
        read_id=np.concatenate(all_rid) if all_rid else np.zeros((0,), np.int64),
        ctg=np.concatenate(all_ctg) if all_ctg else np.zeros((0,), np.int32),
        pos=np.concatenate(all_pos) if all_pos else np.zeros((0,), np.int32),
        gap_read_ids=np.concatenate(all_gap) if all_gap else np.zeros((0,), np.int64),
        n_reads=next_id,
        pe_grads=grads,
        gap_reads=gap_pool,
        long_reads=long_pool,
    )
