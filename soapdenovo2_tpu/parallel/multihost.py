"""Multi-host (DCN) scale-out for the sharded k-mer pipeline.

The reference is strictly single-node (SURVEY.md L3: pthreads + shared
memory, no MPI/sockets anywhere); this module supplies the blueprint item
the reference never had — SURVEY.md 2.4's "k-mer table sharded over
devices/**hosts** by hash prefix":

  * ``init_distributed``: ``jax.distributed.initialize`` from explicit
    args or SOAP_TPU_* env vars.  After it, ``jax.devices()`` spans every
    process and a single ``Mesh`` over all of them makes the existing
    ``shard_map`` programs (parallel/shard_count.py) run unchanged: the
    hash%n all_to_all routing rides ICI within a host and DCN across
    hosts, exactly where XLA places it.
  * ``host_read_slice``: deterministic round-robin assignment of read
    batches to processes — each host decodes only its own 1/n_proc of the
    input stream (the multi-host form of the reference's per-thread read
    buffers, prlHashReads.c:406).
  * ``count_stream_multihost``: per-process driver feeding
    ShardedCountStream with process-local batch slices; every control
    decision inside the stream derives from replicated collectives, so
    the processes stay in lockstep.

Shard tables partition k-mer space disjointly by ``hash(kmer) %
n_devices`` — the union over all shards (and hence over all hosts) is
process-count invariant, which tests/test_multihost.py asserts by
spawning real multi-process CPU clusters (2x4 virtual devices).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import jax
import numpy as np

from ..ops import kmer as kops
from . import shard_count as scount


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or SOAP_TPU_COORDINATOR /
    SOAP_TPU_NUM_PROCS / SOAP_TPU_PROC_ID env vars.  Returns True when a
    multi-process runtime was initialized (False = single-process)."""
    coordinator_address = coordinator_address or os.environ.get(
        "SOAP_TPU_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("SOAP_TPU_NUM_PROCS", "0")) or None
    if process_id is None:
        pid = os.environ.get("SOAP_TPU_PROC_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator_address:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh() -> "jax.sharding.Mesh":
    """One mesh over every device of every process (ICI + DCN)."""
    return scount.make_mesh()


def host_read_slice(batches: Iterable, n_proc: int, proc_id: int,
                    batch_b: int):
    """Yield this process's row slice of every global batch.

    Round-robin over READ PAIRS within each batch keeps mates together;
    every process sees every batch index (lockstep collectives) but only
    decodes/ships its own rows.  Returns (codes_local, lengths_local,
    n_local) triples."""
    local_b = batch_b // n_proc
    for batch in batches:
        codes, lengths = batch.codes, batch.lengths
        B, L = codes.shape
        if B < batch_b:
            codes = np.concatenate(
                [codes, np.full((batch_b - B, L), kops.BASE_N, np.uint8)]
            )
            lengths = np.concatenate(
                [lengths, np.zeros((batch_b - B,), lengths.dtype)]
            )
        lo = proc_id * local_b
        hi = lo + local_b
        n_local = int(np.minimum(np.maximum(batch.n - lo, 0), local_b))
        yield codes[lo:hi], lengths[lo:hi], n_local


def count_stream_multihost(batches: Iterable, k: int, mesh, max_len: int,
                           batch_b: int, **kw):
    """Multi-process ShardedCountStream driver.  ``batches`` is the FULL
    global batch stream (deterministically simulated/decoded on every
    host); each process ships only its host_read_slice rows to its local
    devices.  Returns (keys, covs, n_per_shard, n_reads_local, dropped) —
    keys/covs are global sharded arrays; use addressable_shards for this
    host's sub-tables."""
    n_proc = jax.process_count()
    proc_id = jax.process_index()
    if batch_b % (mesh.devices.size):
        raise ValueError("batch size must divide the mesh")
    if n_proc > 1 and batch_b % n_proc:
        raise ValueError("batch size must divide the process count")
    stream = scount.ShardedCountStream(mesh, k, batch_b, max_len, **kw)
    for codes, lengths, n_local in host_read_slice(
            batches, max(n_proc, 1), proc_id, batch_b):
        stream.add_batch(codes, lengths, n_local)
    keys, covs, n = stream.finish()
    return keys, covs, n, stream.n_reads, stream.dropped


def local_table_rows(keys, covs, n) -> tuple:
    """Extract this process's live (key, cov) rows from the sharded
    table.  Shards are paired by their global row ranges (shard ordinal =
    row_start / rows_per_shard), not by addressable_shards order."""
    live_by_ord = {}
    for s in n.addressable_shards:
        start = s.index[0].start or 0
        ln = int(np.asarray(s.data).reshape(-1)[0])
        live_by_ord[start] = ln  # n has one element per shard
    cap = None
    out_k = []
    out_c = []
    cov_by_ord = {}
    for s in covs.addressable_shards:
        cov_by_ord[s.index[0].start or 0] = np.asarray(s.data)
    for s in keys.addressable_shards:
        start = s.index[0].start or 0
        data = np.asarray(s.data)
        if cap is None:
            cap = data.shape[0]
        ordinal = start // cap
        live = live_by_ord[ordinal]
        out_k.append(data[:live])
        out_c.append(cov_by_ord[start][:live])
    if not out_k:
        return (np.zeros((0, keys.shape[1]), np.uint32),
                np.zeros((0, covs.shape[1]), np.uint16))
    return np.concatenate(out_k), np.concatenate(out_c)
