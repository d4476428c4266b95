"""Synthetic genome + paired-end read simulation (test/bench fixtures).

The reference ships no runnable fixture (example.config points at
placeholder paths), so the test strategy (SURVEY.md section 4) is: simulate
a genome, simulate PE reads, assemble, and check contig/scaffold recovery.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

_BASES = np.frombuffer(b"ACGT", np.uint8)
_COMP = bytes.maketrans(b"ACGT", b"TGCA")


def random_genome(n: int, seed: int = 0, repeat_frac: float = 0.0) -> bytes:
    """Random genome; optionally copy a segment to create an exact repeat."""
    rng = np.random.default_rng(seed)
    g = _BASES[rng.integers(0, 4, size=n)].tobytes()
    if repeat_frac > 0:
        rep_len = int(n * repeat_frac)
        src = rng.integers(0, n - rep_len)
        dst = rng.integers(0, n - rep_len)
        b = bytearray(g)
        b[dst : dst + rep_len] = g[src : src + rep_len]
        g = bytes(b)
    return g


def revcomp(seq: bytes) -> bytes:
    return seq.translate(_COMP)[::-1]


def simulate_pe_reads(
    genome: bytes,
    read_len: int = 100,
    insert_size: int = 300,
    coverage: float = 30.0,
    error_rate: float = 0.0,
    seed: int = 1,
) -> Tuple[List[bytes], List[bytes]]:
    """Simulate paired-end reads (fwd-rev orientation, like real PE libs).

    Returns (reads1, reads2), pair i = (reads1[i], reads2[i]).
    """
    rng = np.random.default_rng(seed)
    n = len(genome)
    n_pairs = int(n * coverage / (2 * read_len))
    max_start = n - insert_size
    if max_start <= 0:
        raise ValueError("genome shorter than insert size")
    starts = rng.integers(0, max_start, size=n_pairs)
    r1, r2 = [], []
    garr = np.frombuffer(genome, np.uint8)
    for s in starts:
        f = garr[s : s + read_len].tobytes()
        rseg = garr[s + insert_size - read_len : s + insert_size].tobytes()
        r = revcomp(rseg)
        if error_rate > 0:
            f = _mutate(f, error_rate, rng)
            r = _mutate(r, error_rate, rng)
        # pairs land on either strand with equal probability
        if rng.random() < 0.5:
            r1.append(f)
            r2.append(r)
        else:
            # same fragment sequenced from the opposite strand
            r1.append(r)
            r2.append(f)
    return r1, r2


def _mutate(seq: bytes, rate: float, rng) -> bytes:
    arr = np.frombuffer(seq, np.uint8).copy()
    mask = rng.random(arr.shape[0]) < rate
    idx = np.nonzero(mask)[0]
    if idx.size:
        arr[idx] = _BASES[rng.integers(0, 4, size=idx.size)]
    return arr.tobytes()


def write_fastq(path: str, reads: List[bytes], name_prefix: str = "r") -> None:
    with open(path, "w") as fh:
        for i, seq in enumerate(reads):
            fh.write(f"@{name_prefix}{i}\n{seq.decode()}\n+\n{'I' * len(seq)}\n")


def write_fasta(path: str, seqs: List[bytes], name_prefix: str = "s") -> None:
    with open(path, "w") as fh:
        for i, seq in enumerate(seqs):
            fh.write(f">{name_prefix}{i}\n{seq.decode()}\n")


def make_test_config(
    dirpath: str,
    genome_len: int = 20000,
    read_len: int = 100,
    insert_size: int = 300,
    coverage: float = 30.0,
    error_rate: float = 0.0,
    seed: int = 0,
    rank: int = 1,
) -> Tuple[str, bytes]:
    """Write a simulated PE library + .config into dirpath.

    Returns (config_path, genome)."""
    genome = random_genome(genome_len, seed=seed)
    r1, r2 = simulate_pe_reads(
        genome, read_len, insert_size, coverage, error_rate, seed=seed + 1
    )
    os.makedirs(dirpath, exist_ok=True)
    p1 = os.path.join(dirpath, "lib1_1.fastq")
    p2 = os.path.join(dirpath, "lib1_2.fastq")
    write_fastq(p1, r1)
    write_fastq(p2, r2)
    cfg = os.path.join(dirpath, "test.config")
    with open(cfg, "w") as fh:
        fh.write(
            f"max_rd_len={read_len}\n[LIB]\navg_ins={insert_size}\n"
            f"reverse_seq=0\nasm_flags=3\nrank={rank}\n"
            f"q1={p1}\nq2={p2}\n"
        )
    return cfg, genome


def make_multirank_config(
    dirpath: str,
    genome_len: int = 5_000_000,
    read_len: int = 100,
    coverage: float = 25.0,
    long_coverage: float = 8.0,
    long_insert: int = 3000,
    short_insert: int = 350,
    error_rate: float = 0.005,
    repeat_frac: float = 0.02,
    seed: int = 0,
) -> Tuple[str, bytes]:
    """Two-rank library mix over a repeat-bearing genome: rank 1 short
    inserts (asm_flags=3) + rank 2 long inserts (asm_flags=2, scaffolding
    only) — the input shape that exercises detectBreakScaff / freezing /
    bySmall rank transitions (orderContig.c:5766 rank loop)."""
    genome = random_genome(genome_len, seed=seed, repeat_frac=repeat_frac)
    os.makedirs(dirpath, exist_ok=True)
    s1, s2 = simulate_pe_reads(
        genome, read_len, short_insert, coverage, error_rate, seed=seed + 1
    )
    l1, l2 = simulate_pe_reads(
        genome, read_len, long_insert, long_coverage, error_rate,
        seed=seed + 2
    )
    paths = {}
    for name, reads in (("s_1", s1), ("s_2", s2), ("l_1", l1),
                        ("l_2", l2)):
        p = os.path.join(dirpath, f"lib{name}.fastq")
        write_fastq(p, reads)
        paths[name] = p
    cfg = os.path.join(dirpath, "multirank.config")
    with open(cfg, "w") as fh:
        fh.write(
            f"max_rd_len={read_len}\n"
            f"[LIB]\navg_ins={short_insert}\nreverse_seq=0\nasm_flags=3\n"
            f"rank=1\npair_num_cutoff=3\n"
            f"q1={paths['s_1']}\nq2={paths['s_2']}\n"
            f"[LIB]\navg_ins={long_insert}\nreverse_seq=0\nasm_flags=2\n"
            f"rank=2\npair_num_cutoff=5\n"
            f"q1={paths['l_1']}\nq2={paths['l_2']}\n"
        )
    return cfg, genome


def assembly_stats(contigs: List[str]) -> dict:
    """N50/N90-style stats (the reference logs these in iterate.c:2296 and
    ScafStat, orderContig.c:3429)."""
    lens = sorted((len(c) for c in contigs), reverse=True)
    total = sum(lens)
    out = {
        "n": len(lens),
        "total": total,
        "max": lens[0] if lens else 0,
    }
    for frac, name in ((0.5, "N50"), (0.9, "N90")):
        acc = 0
        val = 0
        for L in lens:
            acc += L
            if acc >= total * frac:
                val = L
                break
        out[name] = val
    return out
