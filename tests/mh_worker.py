"""Multi-process worker for tests/test_multihost.py.

Run as: python mh_worker.py <proc_id> <n_proc> <port> <outdir>
(env MH_LOCAL_DEVICES sets the per-process virtual device count).
Counts the same deterministic read stream as the single-process ground
truth, feeding only this process's host_read_slice, then dumps its
locally-owned shard rows for the union check.

Also importable (no side effects at import) for the shared constants and
read_stream definition."""
import os
import sys

K = 21
BATCH_B = 64
MAX_LEN = 80


def read_stream():
    from soapdenovo2_tpu.io import reads as rio
    from soapdenovo2_tpu.utils import simulate as sim

    genome = sim.random_genome(4000, seed=42)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=MAX_LEN, insert_size=300,
                                   coverage=12.0, seed=43, error_rate=0.0)
    inter = [r for pair in zip(r1, r2) for r in pair]
    return rio.batch_reads(iter(inter), BATCH_B, MAX_LEN)


def main():
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=" + \
        os.environ.get("MH_LOCAL_DEVICES", "4")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    proc_id, n_proc, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    # distributed init MUST precede anything that touches the XLA backend
    # — including importing package modules that call jax.devices()
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=n_proc, process_id=proc_id)
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np
    from soapdenovo2_tpu.parallel import multihost as mh

    assert jax.process_count() == n_proc
    mesh = mh.global_mesh()
    keys, covs, n, n_reads, dropped = mh.count_stream_multihost(
        read_stream(), K, mesh, MAX_LEN, BATCH_B,
        init_cap_per_shard=1 << 12)
    lk, lc = mh.local_table_rows(keys, covs, n)
    np.savez(os.path.join(outdir, f"proc{proc_id}.npz"),
             keys=lk, covs=lc, n_reads=n_reads, dropped=dropped,
             n_devices=len(jax.devices()))
    print(f"proc {proc_id}: {lk.shape[0]} owned kmers, "
          f"{len(jax.devices())} devices", flush=True)


if __name__ == "__main__":
    main()
