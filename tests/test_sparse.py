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
