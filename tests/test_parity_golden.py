"""Golden parity vs the reference binary (slow; run with -m slow).

Builds SOAPdenovo-63mer out-of-tree, assembles the same simulated reads
with both implementations, and requires scaffold-N50 and genome-matched
bases at or above the reference (SURVEY.md section 4 test strategy)."""

import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

pytestmark = pytest.mark.slow


def _toolchain_ok():
    return shutil.which("g++") and shutil.which("make") and os.path.isdir(
        "/root/reference"
    )


@pytest.mark.skipif(not _toolchain_ok(), reason="no toolchain/reference")
def test_golden_parity(tmp_path):
    from parity_check import run_parity

    res = run_parity(str(tmp_path), genome_len=30_000, k=23)
    ref, tpu = res["ref"], res["tpu"]
    assert tpu["scaffold"]["N50"] >= 0.9 * ref["scaffold"]["N50"]
    assert tpu["matched"] >= 0.95 * ref["matched"]
    assert tpu["mismatched"] <= max(ref["mismatched"], 200)
