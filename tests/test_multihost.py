"""Multi-host (DCN) sharded counting: process-count invariance.

Spawns a REAL 2-process jax.distributed CPU cluster (4 virtual devices
per process = 8 global) via tests/mh_worker.py, counts a deterministic
read stream with each process feeding only its host_read_slice, and
asserts the union of the hosts' owned sub-tables is IDENTICAL to the
single-process 8-device table — the multi-host form of the shard-count
invariance the single-host tests already pin (SURVEY.md 2.4: k-mer table
sharded over devices/hosts; the reference has no multi-node capability
at all, SURVEY.md L3)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_table():
    """Ground truth: same stream, one process, 8 devices."""
    from soapdenovo2_tpu.parallel import shard_count as scount
    import mh_worker

    mesh = scount.make_mesh(8)
    keys, covs, n, n_reads, dropped = (
        None, None, None, 0, 0)
    stream = scount.ShardedCountStream(
        mesh, mh_worker.K, mh_worker.BATCH_B, mh_worker.MAX_LEN,
        init_cap_per_shard=1 << 12)
    from soapdenovo2_tpu.ops import kmer as kops

    for batch in mh_worker.read_stream():
        codes, lengths = batch.codes, batch.lengths
        stream.add_batch(codes, lengths, batch.n)
    keys, covs, n = stream.finish()
    k_np = np.asarray(keys)
    c_np = np.asarray(covs)
    n_np = np.asarray(n)
    cap = k_np.shape[0] // n_np.shape[0]
    rows_k = []
    rows_c = []
    for s in range(n_np.shape[0]):
        rows_k.append(k_np[s * cap : s * cap + n_np[s]])
        rows_c.append(c_np[s * cap : s * cap + n_np[s]])
    del kops
    return np.concatenate(rows_k), np.concatenate(rows_c), stream.dropped


def _sorted_rows(keys, covs):
    order = np.lexsort(tuple(keys[:, i] for i in range(keys.shape[1] - 1,
                                                       -1, -1)))
    return keys[order], covs[order]


def test_two_process_union_matches_single(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["MH_LOCAL_DEVICES"] = "4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mh_worker.py"),
             str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker failed:\n{so.decode()[-1500:]}\n{se.decode()[-1500:]}")

    d0 = np.load(tmp_path / "proc0.npz")
    d1 = np.load(tmp_path / "proc1.npz")
    assert int(d0["n_devices"]) == 8  # 2 hosts x 4 devices
    assert int(d0["dropped"]) == 0 and int(d1["dropped"]) == 0
    union_k = np.concatenate([d0["keys"], d1["keys"]])
    union_c = np.concatenate([d0["covs"], d1["covs"]])
    # hosts own DISJOINT k-mer sets (hash%n sharding)
    seen = {tuple(r) for r in d0["keys"]}
    assert not any(tuple(r) in seen for r in d1["keys"])

    ref_k, ref_c, ref_dropped = _single_process_table()
    assert ref_dropped == 0
    assert union_k.shape == ref_k.shape
    uk, uc = _sorted_rows(union_k, union_c)
    rk, rc = _sorted_rows(ref_k, ref_c)
    assert (uk == rk).all()
    assert (uc == rc).all()
