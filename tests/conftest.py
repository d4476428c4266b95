"""Test config: force an 8-device virtual CPU mesh.

The environment pre-imports jax (sitecustomize registers the 'axon' TPU
plugin and sets jax_platforms='axon,cpu'), so env vars alone don't stick:
we must override jax.config directly, and set XLA_FLAGS before the CPU
backend is first initialized.  Tests run deterministic on virtual CPU
devices; multi-chip sharding paths use the 8-device mesh
(SURVEY.md section 4 test strategy).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # The CPU backend's parallel LLVM codegen segfaulted
    # nondeterministically under the 1 Mb golden runs (three crashes at
    # two different compile sites, 2026-08-22); single-split codegen
    # trades a little compile time for a JIT that doesn't take the
    # process down mid-suite.
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"
# Auto-sharding off by default in tests: the 8 virtual devices exist for
# the EXPLICIT sharding tests; everything else checks single-chip
# semantics (and runs far faster on this 2-vCPU host).
os.environ.setdefault("SD2TPU_AUTO_MESH", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_dna(rng, n: int) -> str:
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


def revcomp_str(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))
