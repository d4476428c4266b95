"""Fusion mode: import external contigs, map reads, scaffold them."""

import os

from soapdenovo2_tpu import cli
from soapdenovo2_tpu.io import files as fio
from soapdenovo2_tpu.utils import simulate as sim

K = 23


def test_fusion_scaffolds_external_contigs(tmp_path):
    d = str(tmp_path)
    # "external assembler" output: two contigs with a gap between them
    A = sim.random_genome(1500, seed=301)
    M = sim.random_genome(180, seed=302)
    B = sim.random_genome(1500, seed=303)
    genome = A + M + B
    fio.write_fasta_generic(
        os.path.join(d, "external.fa"),
        [("ctgA", A.decode()), ("ctgB", B.decode())],
    )
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=500,
                                   coverage=30.0, seed=304)
    sim.write_fastq(os.path.join(d, "f_1.fastq"), r1)
    sim.write_fastq(os.path.join(d, "f_2.fastq"), r2)
    with open(os.path.join(d, "f.config"), "w") as fh:
        fh.write(
            "max_rd_len=100\n[LIB]\navg_ins=500\nreverse_seq=0\n"
            f"asm_flags=3\nrank=1\npair_num_cutoff=3\n"
            f"q1={d}/f_1.fastq\nq2={d}/f_2.fastq\n"
        )
    prefix = os.path.join(d, "fus")
    cli.main(["fusion", "-D", "-c", os.path.join(d, "external.fa"),
              "-K", str(K), "-g", prefix])
    assert os.path.exists(prefix + ".contig")
    assert os.path.exists(prefix + ".conver")
    cli.main(["fusion", "-M", "-s", os.path.join(d, "f.config"),
              "-g", prefix])
    cli.main(["fusion", "-S", "-F", "-g", prefix])
    scafs = [s for _, s in fio.read_fasta(prefix + ".scafSeq")]
    best = max(scafs, key=len)
    # both contigs joined in one scaffold
    assert len(best) >= len(A) + len(B)

    # -O potential analysis (fusion/potential.c): the *.links graph joins
    # the two contigs, so the predicted N50 must span both
    from soapdenovo2_tpu.models import fusion as fus

    predict = fus.potential(prefix)
    assert os.path.exists(prefix + ".potential")
    assert max(predict) >= len(A) + len(B)

    # -z COMPATIBLE_MODE: uncompressed map files must reproduce scafSeq
    import gzip as _gz

    with _gz.open(prefix + ".readOnContig.gz", "rt") as src, \
            open(prefix + ".readOnContig", "w") as dst:
        dst.write(src.read())
    # readInGap is BINARY (reference record layout) — copy raw bytes
    with _gz.open(prefix + ".readInGap.gz", "rb") as src, \
            open(prefix + ".readInGap", "wb") as dst:
        dst.write(src.read())
    os.remove(prefix + ".readOnContig.gz")
    os.remove(prefix + ".readInGap.gz")
    ref_scaf = open(prefix + ".scafSeq").read()
    cli.main(["scaff", "-g", prefix, "-F", "-z"])
    assert open(prefix + ".scafSeq").read() == ref_scaf


def test_fusion_bundle_mode(tmp_path):
    """-B bundling: overlapping external contigs produce negative-gap
    bundle lines (fusion/bundle.c outputBundle:418 emits only gap<0)."""
    d = str(tmp_path)
    A = sim.random_genome(1200, seed=311)
    B = sim.random_genome(1200, seed=312)
    olap = 30  # < ins/10: attach1PE keeps gaps down to -ins/10
    ctg1 = A.decode()
    ctg2 = ctg1[-olap:] + B.decode()  # overlaps ctg1 by 30 bases
    genome = (ctg1 + B.decode()).encode()
    fio.write_fasta_generic(
        os.path.join(d, "ext.fa"), [("c1", ctg1), ("c2", ctg2)]
    )
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=400,
                                   coverage=30.0, seed=313)
    sim.write_fastq(os.path.join(d, "b_1.fastq"), r1)
    sim.write_fastq(os.path.join(d, "b_2.fastq"), r2)
    with open(os.path.join(d, "b.config"), "w") as fh:
        fh.write(
            "max_rd_len=100\n[LIB]\navg_ins=400\nreverse_seq=0\n"
            f"asm_flags=3\nrank=1\npair_num_cutoff=3\n"
            f"q1={d}/b_1.fastq\nq2={d}/b_2.fastq\n"
        )
    prefix = os.path.join(d, "bun")
    cli.main(["fusion", "-D", "-c", os.path.join(d, "ext.fa"),
              "-K", str(K), "-g", prefix])
    cli.main(["fusion", "-M", "-s", os.path.join(d, "b.config"),
              "-g", prefix])
    cli.main(["fusion", "-B", "-g", prefix])
    lines = [l.split("\t") for l in open(prefix + ".bundle")]
    assert lines, "overlapping pair must produce a bundle line"
    assert all(int(t[2]) < 0 for t in lines)  # negative gaps only
    assert all(int(t[3]) > 3 for t in lines)  # above -u threshold
