"""Native fastx decoder: parity with the pure-Python reader."""

import gzip
import os

import numpy as np
import pytest

from soapdenovo2_tpu import native
from soapdenovo2_tpu.config import LibInfo
from soapdenovo2_tpu.io import native_reads as nr
from soapdenovo2_tpu.io import reads as rio
from soapdenovo2_tpu.utils import simulate as sim

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable"
)


def _collect(batches):
    rows = []
    for b in batches:
        for i in range(b.n):
            rows.append(
                (b.start_id + i, b.lengths[i],
                 b.codes[i, : b.lengths[i]].tobytes())
            )
    return rows


def _libinfo_pair(d, r1, r2, gz=False, **kw):
    suffix = ".fastq.gz" if gz else ".fastq"
    p1 = os.path.join(d, "n_1" + suffix)
    p2 = os.path.join(d, "n_2" + suffix)
    for p, rs in ((p1, r1), (p2, r2)):
        data = "".join(
            f"@r{i}\n{s.decode()}\n+\n{'I' * len(s)}\n" for i, s in enumerate(rs)
        ).encode()
        if gz:
            with gzip.open(p, "wb") as fh:
                fh.write(data)
        else:
            with open(p, "wb") as fh:
                fh.write(data)
    return LibInfo(avg_ins=300, q1=[p1], q2=[p2], **kw)


@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python_paired(tmp_path, gz, rng):
    genome = sim.random_genome(3000, seed=70)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=90, insert_size=250,
                                   coverage=10.0, seed=71)
    lib = _libinfo_pair(str(tmp_path), r1, r2, gz=gz)
    native_rows = _collect(nr.batch_reads_lib(lib, 64, 90))
    python_rows = _collect(
        rio.batch_reads(rio.iter_lib_reads(lib), 64, 90)
    )
    assert native_rows == python_rows


def test_native_reverse_seq_and_clip(tmp_path):
    genome = sim.random_genome(2000, seed=72)
    r1, r2 = sim.simulate_pe_reads(genome, read_len=100, insert_size=300,
                                   coverage=6.0, seed=73)
    lib = _libinfo_pair(str(tmp_path), r1, r2, reverse_seq=1,
                        rd_len_cutoff=80)
    native_rows = _collect(nr.batch_reads_lib(lib, 32, 100))
    python_rows = _collect(
        rio.batch_reads(rio.iter_lib_reads(lib), 32, 100)
    )
    assert native_rows == python_rows


def test_native_fasta_multiline(tmp_path):
    d = str(tmp_path)
    p = os.path.join(d, "x.fa")
    seqs = [sim.random_genome(257, seed=s) for s in range(5)]
    with open(p, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">s{i}\n")
            txt = s.decode()
            for j in range(0, len(txt), 60):
                fh.write(txt[j : j + 60] + "\n")
    lib = LibInfo(avg_ins=0, f=[p])
    native_rows = _collect(nr.batch_reads_lib(lib, 4, 300))
    python_rows = _collect(
        rio.batch_reads(rio.iter_lib_reads(lib), 4, 300)
    )
    assert native_rows == python_rows


def test_fasta_record_spanning_refill_boundary(tmp_path):
    """A multi-line FASTA record larger than the decoder chunk must not be
    truncated or double-decoded (native/fastx.cpp buffer-boundary case)."""
    import numpy as np
    from soapdenovo2_tpu import native
    from soapdenovo2_tpu.io.native_reads import _FileDecoder
    from soapdenovo2_tpu.ops import kmer as kops

    lib = native.get_lib()
    if lib is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(5)
    seqs = ["".join("ACGT"[b] for b in rng.integers(0, 4, size=n))
            for n in (300, 17, 290, 64)]
    path = tmp_path / "big.fa"
    with open(path, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">r{i}\n")
            for j in range(0, len(s), 60):  # multi-line bodies
                fh.write(s[j : j + 60] + "\n")
    for chunk in (32, 57, 128, 1 << 20):  # chunks smaller than one record
        d = _FileDecoder(str(path), 0, False, lib, chunk=chunk)
        codes = np.full((8, 512), kops.BASE_N, np.uint8)
        lengths = np.zeros((8,), np.int32)
        got = d.decode_into(codes, 0, 1, lengths, 8, 512)
        d.close()
        assert got == len(seqs), (chunk, got)
        for i, s in enumerate(seqs):
            assert lengths[i] == len(s), (chunk, i)
            dec = "".join("ACGTN"[c] for c in codes[i, : lengths[i]])
            assert dec == s, (chunk, i)
