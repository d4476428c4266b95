"""Full ScafStat output parity (orderContig.c:3429).

The reference reads *.scafSeq and *.contig back, drops records <100 bp,
and reports sizes, the >100..>1M ladder, nucleotide/GC content, and a
banded N10..N90 ladder (each decade printed only when the cumulative sum
first lands inside its band; N50 re-derived if the band was jumped)."""
import os

from soapdenovo2_tpu.io import files as fio


def _write_inputs(prefix):
    with open(prefix + ".scafSeq", "w") as f:
        f.write(">scaffold1 10.0\n" + "ACGT" * 100 + "N" * 50
                + "GGCC" * 50 + "\n")
        f.write(">C2 10.0\n" + "ACGTACGTAC" * 30 + "\n")
        f.write(">C3 10.0\nACG\n")  # <100 bp: dropped (incl. its singleton)
    with open(prefix + ".contig", "w") as f:
        f.write(">1 length 800\n" + "ACGT" * 200 + "\n")
        f.write(">2 length 300\n" + "ACGTACGTAC" * 30 + "\n")
        f.write(">3 length 10\nACGTACGTAC\n")  # dropped


def _fields(text):
    out = {}
    for line in text.splitlines():
        parts = line.split("\t")
        if len(parts) >= 2:
            out[parts[0]] = parts[1:]
    return out


def test_scafstat_sections(tmp_path):
    prefix = str(tmp_path / "g")
    _write_inputs(prefix)
    fio.write_scaf_statistics(prefix, known_genome_size=1000)
    text = open(prefix + ".scafStatistics").read()
    scaf_txt, ctg_txt = text.split("<-- Information for assembly Contig")
    s = _fields(scaf_txt)
    c = _fields(ctg_txt)

    assert s["Size_includeN"][0] == "950"
    assert s["Size_withoutN"][0] == "900"
    assert s["Scaffold_Num"][0] == "2"
    assert s["Mean_Size"][0] == "475"
    assert s["Median_Size"][0] == "300"
    assert s["Longest_Seq"][0] == "650"
    assert s["Shortest_Seq"][0] == "300"
    assert s["Singleton_Num"][0] == "1"  # C3 dropped with its record
    assert s["Average_length_of_break(N)_in_scaffold"][0] == "25"
    assert s["Known_genome_size"][0] == "1000"
    assert s["scaffolds>100 "] == ["2", "100.00%"]
    assert s["scaffolds>500 "] == ["1", "50.00%"]
    assert s["GapContent_N"] == ["50", "5.26%"]
    assert s["GC_Content"][0] == "61.11%"
    # banded ladder quirk: 650/950 = 68% lands in the N60 band; N50 is
    # then re-derived by the fallback scan (orderContig.c:3736-3752)
    assert s["N60"] == ["650", "1"]
    assert s["N90"] == ["300", "2"]
    assert s["N50"] == ["650", "1"]
    assert "N10" not in s
    assert s["NG50"] == ["650", "1"]
    assert s["N50_scaffold-NG50_scaffold_length_difference"][0] == "0"

    assert c["Contig_Num"][0] == "2"
    assert c["Size_includeN"][0] == "1100"
    assert "Singleton_Num" not in c
    assert "Known_genome_size" not in c
    assert c["Contig>500 "] == ["1", "50.00%"]
    assert c["GC_Content"][0] == "50.00%"
    assert c["N50_contig-NG50_contig_length_difference"][0] == "0"


def test_scafstat_no_genome_size(tmp_path):
    prefix = str(tmp_path / "g")
    _write_inputs(prefix)
    fio.write_scaf_statistics(prefix)
    s = _fields(open(prefix + ".scafStatistics").read())
    assert s["Known_genome_size"][0] == "NaN"
    assert s["NG50"] == ["NaN", "NaN"]


def test_scaf_seq_names_reference_style():
    class SC:
        def __init__(self, ctgs):
            self.ctgs = ctgs

    import numpy as np
    cvg = np.array([10.0, 20.0, 30.0])
    scaffolds = [SC([0, 2]), SC([4]), SC([1, 3, 5])]
    seqs = ["A" * 10, "C" * 5, "G" * 20]
    names = fio.scaf_seq_names(scaffolds, seqs, cvg)
    assert names[0].startswith("scaffold1 ")
    assert names[1] == "C3 30.0"
    assert names[2].startswith("scaffold2 ")
