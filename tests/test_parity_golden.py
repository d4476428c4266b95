"""Golden parity vs the reference binaries.

Builds SOAPdenovo-{63,127}mer out-of-tree (cached in /tmp across runs),
assembles the same simulated reads with both implementations, and
compares scaffold N50 / genome-matched bases (SURVEY.md section 4 test
strategy).  The small 63-mer golden runs in the DEFAULT suite; the
multi-k (-m), 127-mer, solveReps (-R) and sparse-mode goldens are
``-m slow``.
"""

import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _toolchain_ok():
    return shutil.which("g++") and shutil.which("make") and os.path.isdir(
        "/root/reference"
    )


needs_ref = pytest.mark.skipif(
    not _toolchain_ok(), reason="no toolchain/reference"
)


def _assert_parity(res, n50_ratio=0.98, matched_ratio=0.98):
    ref, tpu = res["ref"], res["tpu"]
    assert tpu["scaffold"]["N50"] >= n50_ratio * ref["scaffold"]["N50"]
    assert tpu["matched"] >= matched_ratio * ref["matched"]
    assert tpu["mismatched"] <= max(ref["mismatched"], 100)


@needs_ref
def test_golden_parity_small(tmp_path):
    """Default-suite golden: 20 kb, K=23, reference binary cached."""
    from parity_check import run_parity

    res = run_parity(str(tmp_path), genome_len=20_000, k=23)
    _assert_parity(res)


@needs_ref
def test_golden_interop_ref_map(tmp_path):
    """Stage mixing: our pregraph+contig -> REFERENCE binary map -> our
    scaff consuming the reference's *.readOnContig.gz/*.readInGap.gz
    (prlRead2Ctg.c:868-880 formats, VERDICT interop item)."""
    from parity_check import run_interop

    res = run_interop(str(tmp_path), genome_len=20_000, k=23)
    assert res["scaffold"]["N50"] >= 0.9 * res["genome_len"]
    assert res["matched"] >= 0.95 * res["genome_len"]
    assert res["mismatched"] <= 200


@pytest.mark.slow
@needs_ref
def test_golden_parity_50k(tmp_path):
    from parity_check import run_parity

    res = run_parity(str(tmp_path), genome_len=50_000, k=23)
    _assert_parity(res)


@pytest.mark.slow
@needs_ref
def test_golden_multik(tmp_path):
    """contig -m multi-k iteration vs the reference Iterate (iterate.c:2640)."""
    from parity_check import run_parity

    res = run_parity(
        str(tmp_path), genome_len=30_000, k=23,
        ref_extra=("-m", "43"), tpu_extra=("-m", "43"),
    )
    _assert_parity(res)


@pytest.mark.slow
@needs_ref
def test_golden_solvereps(tmp_path):
    """-R read-path repeat resolution on both sides."""
    from parity_check import run_parity

    res = run_parity(
        str(tmp_path), genome_len=30_000, k=23,
        ref_extra=("-R",), tpu_extra=("-R",),
    )
    _assert_parity(res)


@pytest.mark.slow
@needs_ref
def test_golden_127mer(tmp_path):
    """Wide k (>63) against the reference 127mer build."""
    from parity_check import run_parity

    res = run_parity(
        str(tmp_path), genome_len=30_000, k=91, read_len=150, mer=127,
    )
    _assert_parity(res)


@pytest.mark.slow
@needs_ref
def test_golden_sparse(tmp_path):
    """sparse_pregraph driver vs the reference.

    The reference sparse driver segfaults on this input, so the harness
    falls back to the reference DENSE pipeline as the bar — a strictly
    higher bar than reference-sparse (dense sees every k-mer, sparse
    keeps ~1/g), so contiguity gets a relaxed ratio while sequence
    quality stays strict."""
    from parity_check import run_parity

    res = run_parity(str(tmp_path), genome_len=20_000, k=23, sparse=True)
    ref, tpu = res["ref"], res["tpu"]
    # measured 0.998x the DENSE reference bar (r5) after the arm-pair
    # collapse + the length-weighted cvgAvg fix (loadGraph.c:393 —
    # unweighted averaging let short error contigs drag cvgAvg down
    # until the real contigs tripped the repeat mask); was 0.78x in r3/r4
    assert tpu["scaffold"]["N50"] >= 0.9 * ref["scaffold"]["N50"]
    assert tpu["matched"] >= 0.9 * ref["matched"]
    assert tpu["mismatched"] <= max(ref["mismatched"], 200)


@pytest.mark.slow
@needs_ref
def test_golden_multirank_1mb(tmp_path):
    """Mixed-rank golden at 1 Mb with an interior repeat: 350 bp rank-1 +
    3 kb rank-2 libraries both sides (VERDICT item 4 at reduced scale —
    the CPU backend carries the test suite; the 5 Mb TPU run lives in
    scripts/e2e_bench.py).  Exercises the rank loop / freezing / bySmall
    / detectBreakScaff transitions (orderContig.c:5766)."""
    from parity_check import run_parity_multirank

    res = run_parity_multirank(str(tmp_path), genome_len=1_000_000)
    ref, tpu = res["ref"], res["tpu"]
    assert tpu["scaffold"]["N50"] >= 0.95 * ref["scaffold"]["N50"]
    assert tpu["matched"] >= 0.98 * ref["matched"]
    assert tpu["mismatched"] <= max(ref["mismatched"], 500)


@pytest.mark.slow
@needs_ref
def test_golden_multirank_repeatrich_1mb(tmp_path):
    """Second mixed-rank golden (VERDICT r4 item 7): different seed and
    3x the repeat density of test_golden_multirank_1mb — repeat-rich
    fidelity of the rank loop + maskPuzzle/checkUnique machinery is what
    the faithful sub-phases exist for (orderContig.c:2147,2222,6464)."""
    from parity_check import run_parity_multirank

    res = run_parity_multirank(str(tmp_path), genome_len=1_000_000,
                               seed=17, repeat_frac=0.06)
    ref, tpu = res["ref"], res["tpu"]
    assert tpu["scaffold"]["N50"] >= 0.95 * ref["scaffold"]["N50"]
    assert tpu["matched"] >= 0.98 * ref["matched"]
    assert tpu["mismatched"] <= max(ref["mismatched"], 500)


@pytest.mark.slow
@needs_ref
def test_golden_diploid_snp(tmp_path):
    """Bubble-dense diploid (-R): ~1 SNP/300 bp means the graph is wall-
    to-wall bubbles, exercising tour-bus merge bookkeeping
    (cleanUpRedundancy's read-interval/marker remap) + solveReps
    together (VERDICT r3 item 4)."""
    from parity_check import run_parity_diploid

    res = run_parity_diploid(str(tmp_path), genome_len=100_000, k=23)
    ref, tpu = res["ref"], res["tpu"]
    assert tpu["scaffold"]["N50"] >= 0.95 * ref["scaffold"]["N50"]
    assert tpu["matched"] >= 0.95 * ref["matched"]
    assert tpu["mismatched"] <= max(2 * ref["mismatched"], 200)


@pytest.mark.slow
@needs_ref
def test_golden_multik_1mb(tmp_path):
    """Multi-k at the scale it exists for (VERDICT r4 item 4): 1 Mb,
    contig -m 43 from K=23 both sides.  Identity-aware: the junction-read
    rebuild yields far longer gapless scaffolds than the reference's
    per-level recount, so a single base error would zero a whole segment
    under the exact-substring metric — the k-mer identity bound is the
    honest sequence-quality bar (>=99.9%)."""
    from parity_check import run_parity

    res = run_parity(
        str(tmp_path), genome_len=1_000_000, k=23,
        ref_extra=("-m", "43"), tpu_extra=("-m", "43"),
    )
    ref, tpu = res["ref"], res["tpu"]
    assert tpu["scaffold"]["N50"] >= 0.95 * ref["scaffold"]["N50"]
    assert tpu["identity"] >= 0.999
    assert tpu["scaffold"]["total"] >= 0.95 * 1_000_000


@pytest.mark.slow
@needs_ref
def test_golden_diploid_snp_1mb(tmp_path):
    """Diploid fidelity at 1 Mb with -R -M 2 (VERDICT r4 item 8):
    bubble counts ~3,300 stress tour-bus merge bookkeeping + solveReps
    jointly (bubble.c:2389, splitReps.c:591)."""
    from parity_check import run_parity_diploid

    res = run_parity_diploid(str(tmp_path), genome_len=1_000_000, k=23,
                             extra=("-R", "-M", "2"))
    ref, tpu = res["ref"], res["tpu"]
    assert tpu["scaffold"]["N50"] >= 0.95 * ref["scaffold"]["N50"]
    assert tpu["matched"] >= 0.95 * ref["matched"]
    assert tpu["mismatched"] <= max(2 * ref["mismatched"], 500)
