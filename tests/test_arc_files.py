"""Contig-arc stage files (.Arc/.updated.edge) and their scaff-stage
consumers: maskRepeatByArc and arc-route gap placement (traceAlongArc
role in scaffolding, orderContig.c:4972)."""

import numpy as np
import pytest

from soapdenovo2_tpu.io import files as fio
from soapdenovo2_tpu.models.scaffold import (Scaffold, Scaffolder,
                                             gap_span, splice_gap)


def test_heavy_arcs_roundtrip(tmp_path):
    prefix = str(tmp_path / "t")
    arcs = [(0, [(2, 5), (4, 1)]), (3, [(1, 7)])]
    fio.write_heavy_arcs(prefix, arcs)
    back = fio.read_heavy_arcs(prefix)
    assert back == {0: [(2, 5), (4, 1)], 3: [(1, 7)]}


def test_read_heavy_arcs_missing_file(tmp_path):
    assert fio.read_heavy_arcs(str(tmp_path / "nope")) == {}


def test_mask_repeat_by_arc():
    ctg_len = np.full((8,), 1000, np.int64)
    sc = Scaffolder(ctg_len)
    # contig 1 (dirs 2,3) has huge in+out arc weight vs avg:
    # out of dir 2 (weight 60) and into dir 2 (= out of twin dir 3, 60)
    arcs = {
        2: [(4, 60)],
        3: [(1, 60)],
        4: [(6, 1)],
        7: [(5, 1)],
        0: [(6, 1)],
        6: [(0, 1)],
    }
    # avg = 124/6 ~ 20.7; contig 1: 60 + 60 >= 4*avg ~ 82.7 -> masked
    n = sc.mask_repeat_by_arc(arcs)
    assert n == 1
    assert sc.mask[2] and sc.mask[3]
    assert not sc.mask[4] and not sc.mask[0]


def test_fill_gaps_by_arc_unique_route():
    k = 31
    ov = k  # arc-adjacent contigs share a full k-mer junction
    # A (dir 0) -> X (dir 4, masked, len 500) -> B (dir 2)
    ctg_len = np.array([2000, 2000, 2000, 2000, 500, 500], np.int64)
    sc = Scaffolder(ctg_len)
    sc.mask[4] = sc.mask[5] = True
    gap = 500 - 2 * ov  # realized gap of the route
    sc.chains = [Scaffold([0, 2], [gap + 10])]  # estimate off by 10
    arcs = {0: [(4, 9)], 4: [(2, 9)]}
    fills = sc.fill_gaps_by_arc(arcs, k, gap_len_diff=50)
    assert fills == [(0, 0, [4])]
    [chain] = [c for c in sc.chains if len(c.ctgs) > 1]
    assert chain.ctgs == [0, 4, 2]
    assert chain.gaps == [splice_gap(ov), splice_gap(ov)]
    assert not sc.mask[4]
    # sequence length: contigs minus the two exact overlaps
    assert sum(int(ctg_len[c]) for c in chain.ctgs) + sum(
        gap_span(g) for g in chain.gaps
    ) == 2000 + 500 + 2000 - 2 * ov


def test_fill_gaps_by_arc_rejects_out_of_window():
    k = 31
    ctg_len = np.array([2000, 2000, 2000, 2000, 500, 500], np.int64)
    sc = Scaffolder(ctg_len)
    sc.mask[4] = sc.mask[5] = True
    sc.chains = [Scaffold([0, 2], [2000])]  # route would realize ~440
    arcs = {0: [(4, 9)], 4: [(2, 9)]}
    assert sc.fill_gaps_by_arc(arcs, k, gap_len_diff=50) == []
    assert sc.chains[0].ctgs == [0, 2]


def test_scaffold_sequence_with_negative_gap():
    from soapdenovo2_tpu.models.scaffold import scaffold_sequence

    seqs = ["ACGTACGTAC", "GTACAAAAAA"]  # overlap 4: ...GTAC / GTAC...
    sc = Scaffold([0, 2], [splice_gap(4)])
    assert scaffold_sequence(sc, seqs) == "ACGTACGTACAAAAAA"


def test_scaf_gap_marks_placed_contigs(tmp_path):
    prefix = str(tmp_path / "t")
    ctg_len = np.array([100, 100, 50, 50, 100, 100], np.int64)
    scaffolds = [Scaffold([0, 2, 4], [splice_gap(30), splice_gap(30)])]
    fio.write_scaf_gap(prefix, scaffolds, ctg_len, [(0, 0, [2])])
    lines = open(prefix + ".scaf_gap").read().splitlines()
    assert lines[0].startswith(">scaffold1 3")
    assert lines[2].endswith("GAP")  # the placed contig
    assert not lines[1].endswith("GAP") and not lines[3].endswith("GAP")


def test_check_files_for_scaff_message(tmp_path):
    from soapdenovo2_tpu.cli import _check_files_for_scaff

    with pytest.raises(SystemExit) as ei:
        _check_files_for_scaff(str(tmp_path / "missing"))
    assert ".contig" in str(ei.value)
    assert "map stages" in str(ei.value)


def test_amos_asm_writer(tmp_path):
    """*.asm/*.contig4asm AMOS dump (prlReadFillGap.c:1745 fo3/foc2)."""
    import numpy as np
    from soapdenovo2_tpu.io import files as fio
    from soapdenovo2_tpu.models.scaffold import Scaffold

    contig_seqs = ["ACGTACGTAA", "TTGGCCAATT"]
    ctg_len = np.array([10, 10, 10, 10], np.int64)
    sc = Scaffold([0, 3], [5])  # fwd contig 1, rev contig 2, 5 N gap
    seq = contig_seqs[0] + "N" * 5 + "AATTGGCCAA"
    p = str(tmp_path / "x")
    fio.write_amos_asm(p, [sc], [seq], contig_seqs, ctg_len)
    asm = open(p + ".asm").read()
    assert asm.count("{AFG") == 2
    assert asm.count("{MPS") == 2
    assert "{CCO" in asm and "{SCF" in asm
    assert "pos:25,15" in asm  # reverse placement swaps coordinates
    c4a = open(p + ".contig4asm").read()
    assert ">1\n" + contig_seqs[0] in c4a
    assert "AATTGGCCAA" in c4a  # revcomp of contig 2
