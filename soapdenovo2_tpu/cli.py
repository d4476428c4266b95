"""Command-line pipeline driver.

Mirrors the reference CLI (standardPregraph/main.c:59-104): subcommands
``pregraph``, ``contig``, ``map``, ``scaff``, ``all`` (plus
``sparse_pregraph`` when the sparse path lands) sharing state through the
``prefix.*`` file protocol, so each stage is independently restartable.

    python -m soapdenovo2_tpu all -s reads.config -K 31 -o out/asm
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from typing import List, Optional

import numpy as np

log = logging.getLogger("soapdenovo2_tpu")


def _common_pregraph_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-s", dest="config", required=True, help="config file")
    p.add_argument("-K", dest="kmer", type=int, default=23,
                   help="k-mer size, odd, 13..127 (default 23)")
    p.add_argument("-o", dest="prefix", required=True, help="output prefix")
    p.add_argument("-d", dest="kmer_freq_cutoff", type=int, default=0,
                   help="delete k-mers with frequency <= this (default 0)")
    p.add_argument("-R", dest="resolve_repeats", action="store_true",
                   help="record read paths for repeat resolution")
    p.add_argument("-p", dest="ncpu", type=int, default=8,
                   help="accepted for compatibility (device-parallel)")
    p.add_argument("-z", dest="genome_size", type=int, default=0,
                   help="genome size hint: pre-sizes the k-mer table "
                        "(avoids growth recompiles)")
    p.add_argument("--batch", dest="batch_size", type=int, default=49152)


def _contig_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-g", dest="prefix", required=True, help="graph prefix")
    p.add_argument("-M", dest="merge_level", type=int, default=1,
                   help="merge level for bubbles (0 = off)")
    p.add_argument("-D", dest="edge_cov_cutoff", type=int, default=1,
                   help="delete edges with coverage <= this")
    p.add_argument("-e", dest="arc_filter", type=int, default=0,
                   help="do not linearize through arcs with weight <= this"
                        " (concatenateEdge.c arcfilter)")
    p.add_argument("-R", dest="resolve_repeats", action="store_true")
    p.add_argument("-m", dest="max_k", type=int, default=0,
                   help="max k for multi-k iteration (requires -s)")
    p.add_argument("--iter-step", dest="iter_step", type=int, default=0,
                   help="k increment per iteration level (0/2 = the "
                        "reference's every-odd-k sweep; 4+ = cheaper "
                        "coarse sweep)")
    p.add_argument("-s", dest="config", default=None,
                   help="read config (required with -m)")
    p.add_argument("-d", dest="kmer_freq_cutoff", type=int, default=1)
    p.add_argument("-V", dest="visualize", action="store_true",
                   help="emit GraphViz files")


def _map_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-s", dest="config", required=True)
    p.add_argument("-g", dest="prefix", required=True)
    p.add_argument("-f", dest="fill", action="store_true",
                   help="also emit *.shortreadInGap.gz/*.PEreadOnContig.gz "
                        "for SRkgf (prlRead2Ctg.c:868-880)")
    p.add_argument("-k", dest="map_kmer", type=int, default=0,
                   help="smaller k for mapping (default: assembly K)")
    p.add_argument("-p", dest="ncpu", type=int, default=8)
    p.add_argument("--batch", dest="batch_size", type=int, default=49152)


def _scaff_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-g", dest="prefix", required=True)
    p.add_argument("-F", dest="fill_gaps", action="store_true",
                   help="fill gaps in scaffolds")
    p.add_argument("-L", dest="min_ctg_len", type=int, default=0,
                   help="shortest contig used for scaffolding")
    p.add_argument("-V", dest="visualize", action="store_true",
                   help="emit GraphViz/visualization files")
    p.add_argument("-p", dest="ncpu", type=int, default=8)
    p.add_argument("-u", dest="unmask", action="store_true",
                   help="keep high-coverage contigs unmasked "
                        "(scaffold.c -u)")
    p.add_argument("-G", dest="gap_len_diff", type=int, default=50,
                   help="allowed difference between estimated and "
                        "arc-filled gap length (scaffold.c -G)")
    p.add_argument("-z", dest="compat", action="store_true",
                   help="v1.05 COMPATIBLE_MODE (scaffold.c:206-209): read "
                        "uncompressed .readOnContig/.readInGap map files")
    p.add_argument("--arc-mask", dest="arc_mask", action="store_true",
                   help="mask repeats by arc weight (maskRepeatByArc, "
                        "disabled by default like the reference)")
    p.add_argument("-B", dest="snp_cvg", type=float, default=0.6,
                   help="SNP-bubble coverage cutoff relative to the "
                        "average contig coverage (scaffold.c -B, "
                        "removeBubbleCtg; reference default 0.6, "
                        "global.h:104); 0 disables")
    p.add_argument("-S", dest="gapfill_only", action="store_true",
                   help="scaffold structure exists: resume at gap "
                        "filling only, from *.scaf_gap "
                        "(scaffold.c:161-164 -S)")
    p.add_argument("-w", dest="keep_weak", action="store_true",
                   help="keep contigs weakly connected to the scaffold "
                        "(scaffold.c -w, score_mask=0)")
    p.add_argument("-c", dest="cvg_low", type=float, default=0.1,
                   help="minContigCvg factor: short contigs below "
                        "c*avgCvg are masked (scaffold.c -c)")
    p.add_argument("-C", dest="cvg_high", type=float, default=2.0,
                   help="maxContigCvg factor: contigs above C*avgCvg "
                        "are masked (scaffold.c -C)")
    p.add_argument("-b", dest="ins_var_idx", type=float, default=1.5,
                   help="insert-size upper-bound factor for long-insert "
                        "link sliding (scaffold.c -b); <=1 disables")
    p.add_argument("-N", dest="genome_size", type=int, default=0,
                   help="known genome size for statistics "
                        "(scaffold.c -N)")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="soapdenovo2_tpu",
        description="TPU-native de novo genome assembler "
        "(SOAPdenovo2 pipeline, JAX/XLA/Pallas)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)
    _common_pregraph_args(sub.add_parser("pregraph", help="k-mer graph build"))
    _contig_args(sub.add_parser("contig", help="contig assembly"))
    _map_args(sub.add_parser("map", help="map reads to contigs"))
    _scaff_args(sub.add_parser("scaff", help="scaffolding"))
    sp = sub.add_parser(
        "sparse_pregraph", help="sparse k-mer graph build (low-memory)"
    )
    sp.add_argument("-s", dest="config", required=True)
    sp.add_argument("-K", dest="kmer", type=int, default=23)
    sp.add_argument("-o", dest="prefix", required=True)
    sp.add_argument("-g", dest="gap", type=int, default=15,
                    help="sampling gap: keep ~1/g of k-mers (<= 25)")
    sp.add_argument("-z", dest="genome_size", type=int, default=0,
                    help="accepted for compatibility (auto-sized tables)")
    sp.add_argument("-d", dest="kmer_freq_cutoff", type=int, default=1)
    sp.add_argument("-e", dest="edge_cov_cutoff", type=int, default=1)
    sp.add_argument("-r", dest="run_mode", type=int, default=0,
                    choices=range(5),
                    help="runMode (pregraph_sparse.cpp:706): 0 build all, "
                         "1 load *.ht_idx graph & build edges+preArcs, "
                         "2 build+checkpoint graph only, 3 edges only, "
                         "4 preArcs only")
    sp.add_argument("-p", dest="ncpu", type=int, default=8)
    sp.add_argument("--batch", dest="batch_size", type=int, default=49152)
    fus = sub.add_parser(
        "fusion", help="scaffold external contigs (SOAPdenovo-fusion)"
    )
    fus.add_argument("-D", dest="prepare", action="store_true",
                     help="import contigs into the stage file protocol")
    fus.add_argument("-M", dest="do_map", action="store_true",
                     help="map reads onto the imported contigs")
    fus.add_argument("-S", dest="do_scaff", action="store_true",
                     help="scaffold the imported contigs")
    fus.add_argument("-B", dest="do_bundle", action="store_true",
                     help="PE bundling: write prefix.bundle overlap "
                          "links (fusion/bundle.c call_bundle:323)")
    fus.add_argument("-u", dest="bundle_u", type=int, default=3,
                     help="bundle weight threshold (fusion -u)")
    fus.add_argument("-O", dest="do_potential", action="store_true",
                     help="potential-analysis: predicted scaffold N50 from "
                          "the *.links graph (fusion/potential.c)")
    fus.add_argument("-c", dest="contig_fasta", help="contig FASTA (-D)")
    fus.add_argument("-s", dest="config", help="read config (-M/-S)")
    fus.add_argument("-K", dest="kmer", type=int, default=23)
    fus.add_argument("-g", dest="prefix", required=True)
    fus.add_argument("-F", dest="fill_gaps", action="store_true")
    fus.add_argument("-L", dest="min_ctg_len", type=int, default=0)
    fus.add_argument("-p", dest="ncpu", type=int, default=8)
    fus.add_argument("--batch", dest="batch_size", type=int, default=8192)
    allp = sub.add_parser("all", help="full pipeline")
    _common_pregraph_args(allp)
    allp.add_argument("-M", dest="merge_level", type=int, default=1)
    allp.add_argument("-D", dest="edge_cov_cutoff", type=int, default=1)
    allp.add_argument("-e", dest="arc_filter", type=int, default=0)
    allp.add_argument("-m", dest="max_k", type=int, default=0,
                      help="max k for multi-k iteration")
    allp.add_argument("-F", dest="fill_gaps", action="store_true")
    allp.add_argument("-L", dest="min_ctg_len", type=int, default=0)
    allp.add_argument("-k", dest="map_kmer", type=int, default=0)
    allp.add_argument("-B", dest="snp_cvg", type=float, default=0.6,
                      help="SNP-bubble coverage cutoff (scaff -B; "
                           "reference default 0.6)")
    return ap


def cmd_pregraph(args) -> None:
    from .config import parse_config
    from .io import reads as rio
    from .models import checkpoint as ck
    from .models import pregraph as pg

    cfg = parse_config(args.config)
    pre = pg.run_pregraph(
        cfg, args.kmer, d_cutoff=args.kmer_freq_cutoff,
        record_paths=args.resolve_repeats, batch_size=args.batch_size,
        genome_size=getattr(args, "genome_size", 0),
    )
    grads = [
        rio.PeGrad(l.avg_ins, 0, l.rank, l.pair_num_cutoff or 3)
        for l in cfg.sorted_by_insert()
    ]
    ck.write_pregraph(args.prefix, pre, grads=grads)


def cmd_contig(args) -> None:
    from .models import checkpoint as ck
    from .models import contig as cm

    if getattr(args, "max_k", 0):
        if not args.config:
            raise SystemExit("contig -m requires -s <config>")
        from .config import parse_config
        from .io import files as fio
        from .models import iterate

        cfg = parse_config(args.config)
        info = fio.read_pre_graph_basic(args.prefix)
        res = iterate.run_iterate(
            cfg, info["k"], args.max_k,
            d_cutoff=getattr(args, "kmer_freq_cutoff", 1),
            record_paths=args.resolve_repeats,
            step=getattr(args, "iter_step", 0),
        )
        n = ck.write_contigs(args.prefix, res.graph)
        log.info("contig (iterate to k=%d): %d contigs, stats %s",
                 args.max_k, n, res.stats)
        return
    g = ck.load_contig_graph(args.prefix)
    paths = ck.load_paths(args.prefix) if args.resolve_repeats else None
    res = cm.run_contig_graph(
        g, merge_bubbles=args.merge_level > 0,
        de_low_edge=args.edge_cov_cutoff,
        merge_level=args.merge_level,
        arc_filter=getattr(args, "arc_filter", 0), paths=paths,
    )
    n = ck.write_contigs(args.prefix, res.graph)
    with open(args.prefix + ".bubbleSNP", "w") as fh:
        for keep, dele, sim, snps in res.graph.bubbles:
            fh.write(
                f"{keep + 1}\t{dele + 1}\t{sim:.3f}\t"
                + ",".join(str(s) for s in snps) + "\n"
            )
    if getattr(args, "visualize", False):
        from .io import files as fio2

        fio2.write_arc_gvz(args.prefix, res.graph)
    log.info("contig: %d contigs, stats %s", n, res.stats)


def cmd_map(args) -> None:
    from .config import parse_config
    from .io import files as fio
    from .models import checkpoint as ck
    from .models import mapping as mp

    cfg = parse_config(args.config)
    info = fio.read_pre_graph_basic(args.prefix)
    k = args.map_kmer or info["k"]
    contigs = ck.load_contigs(args.prefix)
    try:
        idmap = fio.read_contig_index(args.prefix)
        dir2ref = idmap.dir2ref
    except FileNotFoundError:
        dir2ref = None
    pe_sink = None
    pe_close = None
    if getattr(args, "fill", False):
        # -f (prlRead2Ctg.c:868-880): stream fully-mapped pairs out as we go
        append_pair, pe_close = fio.write_pe_read_on_contig_open(args.prefix)

        def pe_sink(l1, c1, p1, s1, l2, c2, p2, s2, ins):
            r1 = int(dir2ref[c1]) if dir2ref is not None else c1 + 1
            r2 = int(dir2ref[c2]) if dir2ref is not None else c2 + 1
            o1 = "-" if c1 & 1 else "+"
            o2 = "-" if c2 & 1 else "+"
            append_pair(l1, r1, p1, o1, ins, s1[:l1], l2, r2, p2, o2, s2[:l2])

    mres = mp.run_map(cfg, contigs, k, batch_size=args.batch_size,
                      pe_sink=pe_sink)
    if pe_close is not None:
        pe_close()
    fio.write_read_on_contig(args.prefix, mres.read_id, mres.ctg, mres.pos,
                             dir2ref=dir2ref)
    fio.write_read_in_gap(args.prefix, mres.gap_reads, dir2ref=dir2ref)
    fio.write_long_read_in_gap(args.prefix, mres.long_reads,
                               dir2ref=dir2ref)
    if getattr(args, "fill", False):
        fio.write_short_read_in_gap(args.prefix, mres.gap_reads,
                                    dir2ref=dir2ref)
    fio.write_pe_grads(args.prefix, mres.pe_grads, cfg.max_rd_len)


def _check_files_for_scaff(prefix: str, compat: bool = False) -> None:
    """checkFiles4Scaff (orderContig.c:106): name exactly which stage
    files are missing instead of dying on the first open()."""
    import os

    roc = ".readOnContig" if compat else ".readOnContig.gz"
    required = [".contig", ".ContigIndex", roc, ".peGrads"]
    missing = [prefix + s for s in required if not os.path.exists(prefix + s)]
    if missing:
        raise SystemExit(
            "scaff: missing stage file(s): " + ", ".join(missing)
            + " — run the contig and map stages first (or check -g prefix)"
        )


def _cmd_scaff_gapfill_only(args, compat: bool) -> None:
    """scaff -S (scaffold.c:161-164): the scaffold structure already
    exists on disk — skip link building and ordering, reload the layout
    from *.scaf_gap and run ONLY gap filling + statistics."""
    from .io import files as fio
    from .models import checkpoint as ck
    from .models import gapfill
    from .models import scaffold as sf
    from .utils import simulate as sim_utils

    contigs = ck.load_contigs(args.prefix)
    scaffolds = fio.read_scaf_gap(args.prefix)
    try:
        ref2dir = fio.read_contig_index(args.prefix).ref2dir
    except FileNotFoundError:
        ref2dir = None
    gap_reads = fio.read_read_in_gap(args.prefix, compat=compat,
                                     ref2dir=ref2dir)
    if args.fill_gaps and len(gap_reads):
        seqs, gap_seqs, _ = gapfill.fill_gaps(scaffolds, contigs, gap_reads)
    else:
        seqs = [sf.scaffold_sequence(s, contigs) for s in scaffolds]
        gap_seqs = []
    cvg = _load_contig_cvg(args.prefix, len(contigs))
    fio.write_scaf_seq(args.prefix, seqs,
                       names=fio.scaf_seq_names(scaffolds, seqs, cvg))
    fio.write_fasta_generic(
        args.prefix + ".gapSeq",
        ((f"gap{i + 1}", s) for i, s in enumerate(gap_seqs)),
    )
    stats = sim_utils.assembly_stats(seqs)
    fio.write_scaf_statistics(args.prefix,
                              getattr(args, "genome_size", 0))
    log.info("scaff -S (gap fill only): %s", stats)


def cmd_scaff(args) -> None:
    from .io import files as fio
    from .models import checkpoint as ck
    from .models import scaffold as sf
    from .models import mapping as mp
    from .utils import simulate as sim_utils

    compat = getattr(args, "compat", False)
    if getattr(args, "gapfill_only", False):
        _cmd_scaff_gapfill_only(args, compat)
        return
    _check_files_for_scaff(args.prefix, compat)
    contigs = ck.load_contigs(args.prefix)
    try:
        ref2dir = fio.read_contig_index(args.prefix).ref2dir
    except FileNotFoundError:
        ref2dir = None
    rid, ctg, pos = fio.read_read_on_contig(args.prefix, compat=compat,
                                            ref2dir=ref2dir)
    grads, max_rd_len = fio.read_pe_grads(args.prefix)
    cvg = _load_contig_cvg(args.prefix, len(contigs))
    mres = mp.MapResult(
        read_id=rid, ctg=ctg, pos=pos,
        gap_read_ids=np.zeros((0,), np.int64),
        n_reads=int(grads[-1].end_read_id) if grads else 0,
        pe_grads=grads,
        gap_reads=fio.read_read_in_gap(args.prefix, compat=compat,
                                       ref2dir=ref2dir),
    )
    ctg_arcs = fio.read_heavy_arcs(args.prefix, ref2dir=ref2dir)
    try:
        k = fio.read_pre_graph_basic(args.prefix)["k"]
    except (FileNotFoundError, KeyError):
        k = 0
    cvg4snp = getattr(args, "snp_cvg", 0.0)
    sres = sf.run_scaff(
        mres, contigs, min_ctg_len=args.min_ctg_len, contig_cvg=cvg,
        fill=args.fill_gaps, ctg_arcs=ctg_arcs, k=k,
        mask_repeat_arc=getattr(args, "arc_mask", False),
        unmask=getattr(args, "unmask", False),
        gap_len_diff=getattr(args, "gap_len_diff", 50),
        cvg4snp=cvg4snp,
        cvg_low=getattr(args, "cvg_low", 0.1),
        cvg_high=getattr(args, "cvg_high", 2.0),
        ins_var_idx=getattr(args, "ins_var_idx", 1.5),
        score_mask=not getattr(args, "keep_weak", False),
    )
    if cvg4snp > 0:
        # *.bubbleInScaff: FASTA of each collapsed SNP-bubble contig pair
        # (output_ctg, orderContig.c:7944: ">C<id> <cvg>")
        def _snp_records():
            for keep, dele in sres.snp_pairs:
                for c in (keep, dele):
                    hdr = "C%d %4.1f" % (
                        (c >> 1) + 1,
                        float(cvg[c >> 1]) if cvg is not None else 0.0,
                    )
                    yield hdr, contigs[c >> 1]

        fio.write_fasta_generic(
            args.prefix + ".bubbleInScaff", _snp_records()
        )
    ctg_len = np.zeros((2 * len(contigs),), np.int64)
    for t, s in enumerate(contigs):
        ctg_len[2 * t] = ctg_len[2 * t + 1] = len(s)
    fio.write_new_contig_index(args.prefix, ctg_len, cvg)
    fio.write_scaf(args.prefix, sres.scaffolds, ctg_len)
    fio.write_scaf_gap(args.prefix, sres.scaffolds, ctg_len, sres.arc_fills)
    fio.write_scaf_seq(
        args.prefix, sres.seqs,
        names=fio.scaf_seq_names(sres.scaffolds, sres.seqs, cvg))
    fio.write_fasta_generic(
        args.prefix + ".gapSeq",
        ((f"gap{i + 1}", s) for i, s in enumerate(sres.gap_seqs)),
    )
    fio.write_links(args.prefix, sres.grads_links)
    fio.write_contig_pos_in_scaff(args.prefix, sres.scaffolds, ctg_len)
    if getattr(args, "visualize", False):
        fio.write_cnt_gvz(args.prefix, sres.grads_links)
        fio.write_read_on_scaf(
            args.prefix, rid, ctg, pos, sres.scaffolds, ctg_len
        )
        fio.write_amos_asm(
            args.prefix, sres.scaffolds, sres.seqs, contigs, ctg_len
        )
    # -N (scaffold.c -N known_genome_size): drives the NG50/percentage
    # fields in ScafStat
    fio.write_scaf_statistics(args.prefix, getattr(args, "genome_size", 0))
    log.info("scaff: %s", sres.stats)


def _load_contig_cvg(prefix: str, n: int) -> Optional[np.ndarray]:
    try:
        # cvg now lives in *.updated.edge (x10, loadGraph.c:391); fall
        # back to the legacy ContigIndex cvg column for old checkpoints
        from .io import files as fio

        cvg = fio.read_contig_cvg(prefix, n)
        if cvg is not None:
            return cvg
        cvg = np.zeros((n,), np.float64)
        with open(prefix + ".ContigIndex") as fh:
            fh.readline()
            for line in fh:
                t = line.split()
                if len(t) >= 3 and "." in t[2]:
                    cid = int(t[0]) - 1
                    if 0 <= cid < n:
                        cvg[cid] = float(t[2])
        return cvg
    except FileNotFoundError:
        return None


def cmd_sparse_pregraph(args) -> None:
    from .config import parse_config
    from .models import sparse

    cfg = parse_config(args.config)
    sparse.run_sparse_pregraph(
        cfg, args.kmer, args.prefix, gap=args.gap,
        node_cov_cutoff=args.kmer_freq_cutoff,
        edge_cov_cutoff=args.edge_cov_cutoff,
        batch_size=args.batch_size,
        run_mode=getattr(args, "run_mode", 0),
    )


def cmd_fusion(args) -> None:
    from .models import fusion

    did = False
    if args.prepare:
        if not args.contig_fasta:
            raise SystemExit("fusion -D requires -c contigs.fa")
        fusion.data_prepare(args.contig_fasta, args.prefix, args.kmer)
        did = True
    if args.do_map:
        if not args.config:
            raise SystemExit("fusion -M requires -s config")
        args.map_kmer = 0
        cmd_map(args)
        did = True
    if args.do_scaff:
        cmd_scaff(args)
        did = True
    if getattr(args, "do_bundle", False):
        fusion.call_bundle(args.prefix, args.bundle_u)
        did = True
    if args.do_potential:
        fusion.potential(args.prefix)
        did = True
    if not did:
        raise SystemExit(
            "fusion: pass at least one of -D / -M / -B / -O / -S")


def cmd_all(args) -> None:
    t0 = time.time()
    cmd_pregraph(args)
    log.info("[all] pregraph done (%.1fs)", time.time() - t0)
    cmd_contig(args)
    log.info("[all] contig done (%.1fs)", time.time() - t0)
    cmd_map(args)
    log.info("[all] map done (%.1fs)", time.time() - t0)
    cmd_scaff(args)
    log.info("[all] scaff done (%.1fs)", time.time() - t0)


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache (repo-local by default): one program
    compile costs 10-25 s through the remote-device tunnel; the cache
    turns every later process's compile into a ~0.2 s load."""
    import os

    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    try:
        if path is None:
            if jax.default_backend() == "cpu":
                return  # CPU compiles are cheap; don't churn the repo cache
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jaxcache",
            )
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)  # tiny eager ops too: 130 of them cost ~0.4 s EACH to compile over the tunnel
    except Exception:  # cache is an optimization, never a requirement
        pass


def _warmup_key(args) -> str:
    """Manifest key: the params that determine the traced program shapes
    (k, batch width, table pre-size) plus the subcommand and backend."""
    from .utils import warmup

    p = {}
    for name, tag in (("kmer", "K"), ("batch_size", "b"),
                      ("genome_size", "z"), ("map_kmer", "mk")):
        v = getattr(args, name, None)
        if v:
            p[tag] = v
    return warmup.manifest_key(args.cmd, **p)


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s: %(message)s",
        stream=sys.stderr,
    )
    _enable_compile_cache()
    args = build_parser().parse_args(argv)
    from .utils import warmup

    wkey = _warmup_key(args)
    warmup.begin(wkey)
    if args.cmd == "pregraph":
        cmd_pregraph(args)
    elif args.cmd == "contig":
        cmd_contig(args)
    elif args.cmd == "map":
        cmd_map(args)
    elif args.cmd == "scaff":
        cmd_scaff(args)
    elif args.cmd == "sparse_pregraph":
        cmd_sparse_pregraph(args)
    elif args.cmd == "fusion":
        cmd_fusion(args)
    elif args.cmd == "all":
        cmd_all(args)
    warmup.finish(wkey)
    return 0


if __name__ == "__main__":
    sys.exit(main())
