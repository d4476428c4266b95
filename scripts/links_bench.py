"""Synthetic PE2Links benchmark: device kernel vs host numpy at >=10M
links (VERDICT r4 item 6 bar: device >= 5x host on the accumulation).

    python scripts/links_bench.py [n_reads]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jaxcache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    rng = np.random.default_rng(5)
    n_ctg = 200_000
    ctg_len = rng.integers(500, 4000, size=2 * n_ctg).astype(np.int64)
    ctg_len[1::2] = ctg_len[0::2]
    rid = np.arange(n_reads, dtype=np.int64)
    ctg = rng.integers(0, 2 * n_ctg, size=n_reads).astype(np.int32)
    # reads anchored near contig tails so the gap estimate lands inside
    # the attach1PE accept window (g in [-ins/10, ins])
    tail_off = rng.integers(80, 220, size=n_reads).astype(np.int32)
    pos = (ctg_len[ctg] - tail_off).astype(np.int32)
    ins = 400

    from soapdenovo2_tpu.models import scaffold as sf
    import jax
    import jax.numpy as jnp

    # device: upload once (the production flow keeps map outputs
    # device-resident), time the kernel steady-state
    rid_d = jnp.asarray(rid, jnp.int32)
    ctg_d = jnp.asarray(ctg)
    pos_d = jnp.asarray(pos)
    len_d = jnp.asarray(ctg_len, jnp.int32)
    dev, _ = sf.build_links_for_grad_device(rid_d, ctg_d, pos_d, len_d,
                                            ins, 0, n_reads)  # warm
    # kernel-only: the accumulation itself, outputs left device-resident
    # (a co-located deployment consumes them at PCIe/ICI bandwidth; the
    # axon tunnel's ~30 MB/s download is an artifact of this test rig
    # and is reported separately below)
    kern = sf._links_kernel_cache[0]
    link_cap = 1 << max(int(np.ceil(np.log2(n_reads))), 20)
    out = kern(rid_d, ctg_d, pos_d, len_d, 0, n_reads, ins,
               link_cap, 1 << 20)
    jax.block_until_ready(out)
    t0 = time.time()
    out = kern(rid_d, ctg_d, pos_d, len_d, 0, n_reads, ins,
               link_cap, 1 << 20)
    jax.block_until_ready(out)
    kernel_s = time.time() - t0

    t0 = time.time()
    dev, _ = sf.build_links_for_grad_device(rid_d, ctg_d, pos_d, len_d,
                                            ins, 0, n_reads)
    dev_s = time.time() - t0

    t0 = time.time()
    host, _ = sf.build_links_for_grad(rid, ctg, pos, ctg_len, ins, 0,
                                      n_reads)
    host_s = time.time() - t0

    assert (host.c1 == dev.c1).all() and (host.weight == dev.weight).all()
    print({"links": int(host.c1.size), "host_s": round(host_s, 2),
           "device_kernel_s": round(kernel_s, 2),
           "device_with_tunnel_download_s": round(dev_s, 2),
           "kernel_speedup": round(host_s / kernel_s, 1)})


if __name__ == "__main__":
    main()
