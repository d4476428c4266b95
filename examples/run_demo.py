"""Demo: simulate a small genome, assemble it end to end, print stats.

    python examples/run_demo.py [outdir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from soapdenovo2_tpu import cli
from soapdenovo2_tpu.io import files as fio
from soapdenovo2_tpu.utils import simulate as sim

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_denovo_demo"
cfg, genome = sim.make_test_config(
    out, genome_len=50_000, read_len=100, insert_size=350,
    coverage=35.0, error_rate=0.005, seed=42,
)
prefix = os.path.join(out, "asm")
cli.main(["all", "-s", cfg, "-K", "31", "-o", prefix, "-d", "1", "-F"])

contigs = [s for _, s in fio.read_contigs(prefix + ".contig")]
scafs = [s for _, s in fio.read_fasta(prefix + ".scafSeq")]
print("genome:", len(genome))
print("contigs:", sim.assembly_stats([c for c in contigs if len(c) >= 100]))
print("scaffolds:", sim.assembly_stats([s for s in scafs if len(s) >= 100]))
print("outputs in:", out)
