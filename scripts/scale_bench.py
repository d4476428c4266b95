"""Large-genome head-to-head capture: ours vs the reference binary.

Simulates an N-Mb PE dataset once (cached under the workdir), then runs
BOTH assemblers on it in the same capture — our CLI with per-stage
timers, and the reference `all -p 2 -F` — and prints one JSON line.
This is the procedure behind BASELINE.md's 50 Mb rows.

    python scripts/scale_bench.py [genome_len] [workdir] [--ours-only|--ref-only]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jaxcache"))


def main():
    glen = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_bench"
    mode = sys.argv[3] if len(sys.argv) > 3 else "both"
    from soapdenovo2_tpu.utils import simulate as sim

    os.makedirs(work, exist_ok=True)
    cfgp = os.path.join(work, "test.config")
    t0 = time.time()
    if not os.path.exists(cfgp):
        cfgp, _ = sim.make_test_config(
            work, genome_len=glen, read_len=100, insert_size=350,
            coverage=30.0, error_rate=0.002, seed=11,
        )
        print(f"[{time.time()-t0:7.1f}s] simulated {glen} bp", flush=True)
    res = {"genome_len": glen}

    if mode in ("both", "--ours-only"):
        from soapdenovo2_tpu import cli
        from soapdenovo2_tpu.io import files as fio

        prefix = os.path.join(work, "asm")
        stages = {}
        for stage, args in [
            ("pregraph", ["pregraph", "-s", cfgp, "-K", "31", "-o", prefix,
                          "-d", "1", "-z", str(glen)]),
            ("contig", ["contig", "-g", prefix]),
            ("map", ["map", "-s", cfgp, "-g", prefix]),
            ("scaff", ["scaff", "-g", prefix, "-F"]),
        ]:
            t1 = time.time()
            cli.main(args)
            stages[stage] = round(time.time() - t1, 1)
            print(f"[{time.time()-t0:7.1f}s] {stage} done ({stages[stage]}s)",
                  flush=True)
        res["ours_stages_s"] = stages
        res["ours_total_s"] = round(sum(stages.values()), 1)
        scafs = [s for _, s in fio.read_fasta(prefix + ".scafSeq")]
        res["ours_scaffold"] = sim.assembly_stats(
            [s for s in scafs if len(s) >= 100])
        ctgs = [s for _, s in fio.read_fasta(prefix + ".contig")]
        res["ours_contig_n50"] = sim.assembly_stats(
            [s for s in ctgs if len(s) >= 100])["N50"]

    if mode in ("both", "--ref-only"):
        import parity_check as pc

        binary = pc.build_reference(63)
        t1 = time.time()
        subprocess.run(
            [binary, "all", "-s", cfgp, "-K", "31", "-o",
             os.path.join(work, "ref_asm"), "-p", "2", "-F"],
            check=True, capture_output=True, cwd=work,
        )
        res["ref_total_s"] = round(time.time() - t1, 1)
        from soapdenovo2_tpu.io import files as fio
        from soapdenovo2_tpu.utils import simulate as sim2

        scafs = [s for _, s in fio.read_fasta(
            os.path.join(work, "ref_asm.scafSeq"))]
        res["ref_scaffold"] = sim2.assembly_stats(
            [s for s in scafs if len(s) >= 100])
        ctgs = [s for _, s in fio.read_fasta(
            os.path.join(work, "ref_asm.contig"))]
        res["ref_contig_n50"] = sim2.assembly_stats(
            [s for s in ctgs if len(s) >= 100])["N50"]

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
