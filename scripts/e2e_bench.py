"""End-to-end wall-clock benchmark: 5 Mb genome, 30x PE, K=31, `all`.

The r1 measurement was 708 s warm / 803 s cold on one chip vs reference
pregraph alone = 51 s on this 2-vCPU host (BASELINE.md).  This script
times each stage separately so the expensive phases are attributable.

    python scripts/e2e_bench.py [genome_len] [coverage] [outdir]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from soapdenovo2_tpu import cli
from soapdenovo2_tpu.io import files as fio
from soapdenovo2_tpu.utils import simulate as sim


def main():
    glen = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cov = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/e2e_bench"
    t0 = time.time()
    cfg, genome = sim.make_test_config(
        out, genome_len=glen, read_len=100, insert_size=350,
        coverage=cov, error_rate=0.005, seed=7,
    )
    print(f"[{time.time()-t0:7.1f}s] simulated {glen} bp @ {cov}x",
          flush=True)
    prefix = os.path.join(out, "asm")
    stages = {}
    for stage, args in [
        ("pregraph", ["pregraph", "-s", cfg, "-K", "31", "-o", prefix,
                      "-d", "1", "-z", str(glen)]),
        ("contig", ["contig", "-g", prefix]),
        ("map", ["map", "-s", cfg, "-g", prefix]),
        ("scaff", ["scaff", "-g", prefix, "-F"]),
    ]:
        t1 = time.time()
        cli.main(args)
        stages[stage] = round(time.time() - t1, 1)
        print(f"[{time.time()-t0:7.1f}s] {stage} done ({stages[stage]}s)",
              flush=True)
    total = round(sum(stages.values()), 1)
    scafs = [s for _, s in fio.read_fasta(prefix + ".scafSeq")]
    stats = sim.assembly_stats([s for s in scafs if len(s) >= 100])
    print(json.dumps({"stages_s": stages, "total_s": total,
                      "scaffold_stats": stats}), flush=True)


if __name__ == "__main__":
    main()
