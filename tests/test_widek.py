"""Wide-k pipelines: k=63 (4-word) and k=101 (7-word, '127mer' class).

The reference needs separate compile-time binaries for k>63
(SOAPdenovo-127mer); here the same multiword registers cover 13..127.
"""

import os

import pytest

from soapdenovo2_tpu import cli
from soapdenovo2_tpu.io import files as fio
from soapdenovo2_tpu.utils import simulate as sim

from conftest import revcomp_str


@pytest.mark.parametrize("k", [63, 101])
def test_wide_k_pipeline(tmp_path, k):
    d = str(tmp_path)
    cfgp, genome = sim.make_test_config(
        d, genome_len=4000, read_len=150, insert_size=400, coverage=30.0,
        seed=800 + k,
    )
    prefix = os.path.join(d, f"wk{k}")
    cli.main(["all", "-s", cfgp, "-K", str(k), "-o", prefix])
    contigs = [s for _, s in fio.read_contigs(prefix + ".contig")]
    best = max(contigs, key=len)
    gstr = genome.decode()
    assert len(best) >= 0.75 * len(gstr)
    assert best in gstr or revcomp_str(best) in gstr
