"""Sparse pregraph tests: sampled graph recovers long unitigs."""

import os

import numpy as np
import pytest

from soapdenovo2_tpu import cli
from soapdenovo2_tpu.io import files as fio
from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.models import sparse
from soapdenovo2_tpu.utils import simulate as sim
from soapdenovo2_tpu.config import parse_config

from conftest import revcomp_str

K = 21


def test_sparse_graph_unitigs():
    genome = sim.random_genome(4000, seed=401)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=300,
                                   coverage=30.0, seed=402)
    reads = [x for pair in zip(r1, r2) for x in pair]
    g = sparse.build_sparse_graph(
        rio.batch_reads(iter(reads), 512, 100), K, gap=10
    )
    # ~1/gap of all distinct genome k-mers sampled
    n_nodes = g.node_words.shape[0]
    expect = (4000 - K + 1) / 10
    assert 0.5 * expect < n_nodes < 2.0 * expect
    g = sparse.prune_sparse(g, 1, 1)
    unitigs = sparse.sparse_to_unitigs(g)
    best = max((s for s, _ in unitigs), key=len)
    gstr = genome.decode()
    assert len(best) >= 0.8 * len(gstr)
    assert best in gstr or revcomp_str(best) in gstr


@pytest.mark.slow
def test_sparse_cli_then_map_scaff(tmp_path):
    d = str(tmp_path)
    cfgp, genome = sim.make_test_config(
        d, genome_len=5000, read_len=100, insert_size=350, coverage=30.0,
        seed=403,
    )
    prefix = os.path.join(d, "sp")
    cli.main(["sparse_pregraph", "-s", cfgp, "-K", str(K), "-o", prefix,
              "-g", "10"])
    assert os.path.exists(prefix + ".contig")
    contigs = [s for _, s in fio.read_contigs(prefix + ".contig")]
    best = max(contigs, key=len)
    gstr = genome.decode()
    assert len(best) >= 0.7 * len(gstr)
    assert best in gstr or revcomp_str(best) in gstr
    # downstream stages run on the sparse output
    cli.main(["map", "-s", cfgp, "-g", prefix])
    cli.main(["scaff", "-g", prefix, "-F"])
    scafs = [s for _, s in fio.read_fasta(prefix + ".scafSeq")]
    assert max(len(s) for s in scafs) >= 0.7 * len(gstr)


@pytest.mark.slow
def test_sparse_run_modes_checkpoint(tmp_path):
    """-r 2 checkpoints the graph to *.ht_idx/*.ht_content; -r 1 resumes
    from it and must reproduce the full-run outputs byte-identically
    (pregraph_sparse.cpp:642-672 run modes, build_graph.cpp:645/728)."""
    d = str(tmp_path)
    cfgp, genome = sim.make_test_config(
        d, genome_len=4000, read_len=100, insert_size=350, coverage=25.0,
        seed=407,
    )
    full = os.path.join(d, "full")
    cli.main(["sparse_pregraph", "-s", cfgp, "-K", str(K), "-o", full,
              "-g", "10"])
    # build + checkpoint only
    split = os.path.join(d, "split")
    cli.main(["sparse_pregraph", "-s", cfgp, "-K", str(K), "-o", split,
              "-g", "10", "-r", "2"])
    assert os.path.exists(split + ".ht_idx")
    assert os.path.exists(split + ".ht_content")
    assert not os.path.exists(split + ".contig")
    # resume from the checkpoint (no read stream)
    cli.main(["sparse_pregraph", "-s", cfgp, "-K", str(K), "-o", split,
              "-g", "10", "-r", "1"])
    for suffix in (".contig", ".edge.gz", ".vertex", ".preGraphBasic",
                   ".preArc"):
        assert os.path.exists(split + suffix), suffix
    with open(full + ".contig") as fh:
        a = fh.read()
    with open(split + ".contig") as fh:
        b = fh.read()
    assert a == b
    # -r 3 / -r 4 partial rebuilds from the checkpoint
    part = os.path.join(d, "part")
    cli.main(["sparse_pregraph", "-s", cfgp, "-K", str(K), "-o", part,
              "-g", "10", "-r", "2"])
    cli.main(["sparse_pregraph", "-s", cfgp, "-K", str(K), "-o", part,
              "-g", "10", "-r", "3"])
    assert os.path.exists(part + ".edge.gz")
    assert not os.path.exists(part + ".preArc")
    cli.main(["sparse_pregraph", "-s", cfgp, "-K", str(K), "-o", part,
              "-g", "10", "-r", "4"])
    assert os.path.exists(part + ".preArc")


def test_sparse_pregraph_feeds_standard_contig_stage(tmp_path):
    # reference flow: sparse_pregraph emits *.edge.gz/*.vertex/*.preArc/
    # *.preGraphBasic (convert_soapdenovo.cpp) and the STANDARD contig
    # stage runs on them unchanged
    d = str(tmp_path)
    cfgp, genome = sim.make_test_config(
        d, genome_len=5000, read_len=100, insert_size=350, coverage=30.0,
        seed=404,
    )
    prefix = os.path.join(d, "spc")
    cli.main(["sparse_pregraph", "-s", cfgp, "-K", str(K), "-o", prefix,
              "-g", "10"])
    for suffix in (".edge.gz", ".vertex", ".preArc", ".preGraphBasic"):
        assert os.path.exists(prefix + suffix), suffix
    cli.main(["contig", "-g", prefix])
    contigs = [s for _, s in fio.read_contigs(prefix + ".contig")]
    gstr = genome.decode()
    best = max(contigs, key=len)
    assert len(best) >= 0.7 * len(gstr)
    assert best in gstr or revcomp_str(best) in gstr
    # every contig is genomic sequence
    for s in contigs:
        if len(s) >= 50:
            assert s in gstr or revcomp_str(s) in gstr


@pytest.mark.slow
def test_sparse_tip_clipping():
    # a minority dead-end branch hanging off a well-covered path is clipped
    genome = sim.random_genome(3000, seed=405)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=300,
                                   coverage=30.0, seed=406)
    reads = [x for pair in zip(r1, r2) for x in pair]
    # tip reads: a short chimeric dead end branching mid-genome (the
    # novel tail is < 2k bases, the removeMinorTips length class)
    tip = genome[1480:1540] + sim.random_genome(12, seed=407)
    reads += [tip] * 2  # weak support
    g = sparse.build_sparse_graph(
        rio.batch_reads(iter(reads), 512, 100), K, gap=8
    )
    g = sparse.prune_sparse(g, 1, 1)
    before = [s for s, _ in sparse.sparse_to_unitigs(g)]
    sparse.remove_sparse_tips(g)
    after = [s for s, _ in sparse.sparse_to_unitigs(g)]
    gstr = genome.decode()
    best = max(after, key=len)
    assert len(best) >= 0.8 * len(gstr)
    # no unitig may retain the chimeric junction after clipping
    for s in after:
        if len(s) >= 50:
            assert s in gstr or revcomp_str(s) in gstr, (len(s), len(before))


def test_sparse_prearc_transit_mults(tmp_path):
    """preArc multiplicities are per-pair read TRANSIT counts
    (build_preArc.cpp:1043), not the successor-cov approximation.

    Two chromosomes share an exact repeat X, so the junction entering X
    has two incoming chains; each (in, out) pair's multiplicity must lie
    between the margined and unmargined counts of reads that actually
    contain the junction-crossing substring."""
    gap = 10
    rl = 100
    rep = sim.random_genome(220, seed=410)
    g1 = sim.random_genome(700, seed=411) + rep + sim.random_genome(700, seed=412)
    g2 = sim.random_genome(700, seed=413) + rep + sim.random_genome(700, seed=414)
    reads = []
    for gen, seed in ((g1, 415), (g2, 416)):
        r1, r2 = sim.simulate_pe_reads(gen, read_len=rl, insert_size=300,
                                       coverage=40.0, seed=seed)
        reads += [x for pair in zip(r1, r2) for x in pair]
    g = sparse.build_sparse_graph(
        rio.batch_reads(iter(reads), 512, rl), K, gap=gap
    )
    assert g.transits, "no read transits recorded"
    g = sparse.prune_sparse(g, 1, 1)
    chains = sparse.sparse_chains(g, join_splits=True)

    comp = bytes.maketrans(b"ACGTN", b"TGCAN")

    def rc(s):
        return s.encode().translate(comp)[::-1].decode()

    # twin map (same scheme as write_sparse_pregraph_files)
    def flip(st):
        return (st[0], 1 - st[1])

    key_of = {(ch.seq, ch.start, ch.end): i for i, ch in enumerate(chains)}
    twin = list(range(len(chains)))
    for i, ch in enumerate(chains):
        j = key_of.get((rc(ch.seq), flip(ch.end), flip(ch.start)))
        if j is not None:
            twin[i] = j

    ends = {}
    starts = {}
    for i, ch in enumerate(chains):
        if ch.first_cov:
            ends.setdefault(ch.end, []).append(i)
            starts.setdefault(ch.start, []).append(i)
    # a junction with >= 2 incoming and >= 1 outgoing chain (repeat entry)
    multi = [(S, ins) for S, ins in ends.items()
             if len(ins) >= 2 and starts.get(S)]
    assert multi, "no multi-in junction found"
    checked = 0
    for S, ins in multi:
        for i in ins:
            el_in, mb0, mb1 = sparse._pack_bases(chains[twin[i]].first_bases)
            for j in starts[S]:
                el_out, ob0, ob1 = sparse._pack_bases(chains[j].first_bases)
                t = (
                    g.transits.get((S[0], S[1], el_in, mb0, mb1,
                                    el_out, ob0, ob1), 0)
                    + g.transits.get((S[0], 1 - S[1], el_out, ob0, ob1,
                                      el_in, mb0, mb1), 0)
                )
                # ground truth: reads containing the crossing substring
                s_star = chains[i].seq[-(K + el_in):] + \
                    chains[j].seq[K:K + el_out]
                lo = hi = 0
                for r in reads:
                    s = r.decode()
                    for probe in (s_star, rc(s_star)):
                        off = s.find(probe)
                        while off >= 0:
                            hi += 1
                            if (off >= gap - 1 and
                                    off + len(probe) + gap - 1 <= rl):
                                lo += 1
                            off = s.find(probe, off + 1)
                assert lo <= t <= hi, (S, i, j, lo, t, hi)
                checked += 1
    assert checked >= 4  # 2-in x >=1-out on both repeat flanks (or twins)
