"""Assembly config file parser.

Parses the SOAPdenovo `.config` library format (reference:
standardPregraph/lib.c:130 ``scan_libInfo``; format documented in
reference README.md:44-76 and example.config): a global ``max_rd_len``
plus ``[LIB]`` sections with insert-size stats, usage flags, and read-file
lists.  Unlike the reference's fixed-size global arrays, this returns a
plain immutable config object.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple


@dataclasses.dataclass
class LibInfo:
    """One [LIB] section (reference LIB_INFO, standardPregraph/inc/def.h:275)."""

    avg_ins: int = 0
    reverse_seq: int = 0  # 0 = fwd-rev paired-end, 1 = rev-fwd mate-pair
    asm_flags: int = 3  # 1=contig, 2=scaff, 3=both, 4=gap-closure only
    rd_len_cutoff: int = 0  # clip reads of this lib to this length (0 = off)
    rank: int = 0  # scaffolding order group
    pair_num_cutoff: int = 0  # min PE pairs to accept a link (0 = default)
    map_len: int = 0  # min map length for the map stage (0 = default)
    # file lists, in config order
    f1: List[str] = dataclasses.field(default_factory=list)  # paired fasta
    f2: List[str] = dataclasses.field(default_factory=list)
    q1: List[str] = dataclasses.field(default_factory=list)  # paired fastq
    q2: List[str] = dataclasses.field(default_factory=list)
    f: List[str] = dataclasses.field(default_factory=list)  # single fasta
    q: List[str] = dataclasses.field(default_factory=list)  # single fastq
    p: List[str] = dataclasses.field(default_factory=list)  # interleaved fasta
    b: List[str] = dataclasses.field(default_factory=list)  # BAM

    def paired_files(self) -> List[Tuple[str, str]]:
        if len(self.f1) != len(self.f2) or len(self.q1) != len(self.q2):
            raise ValueError("unmatched f1/f2 or q1/q2 file lists")
        return list(zip(self.q1, self.q2)) + list(zip(self.f1, self.f2))

    def single_files(self) -> List[str]:
        return list(self.q) + list(self.f)

    def interleaved_files(self) -> List[str]:
        return list(self.p)

    def bam_files(self) -> List[str]:
        return list(self.b)

    def has_paired(self) -> bool:
        return bool(self.f1 or self.q1 or self.p or self.b)


@dataclasses.dataclass
class AssemblyConfig:
    max_rd_len: int
    libs: List[LibInfo]

    def libs_for_contig(self) -> List[LibInfo]:
        """Libraries whose reads feed the k-mer graph (asm_flags & 1)."""
        return [l for l in self.libs if l.asm_flags in (1, 3)]

    def libs_for_scaff(self) -> List[LibInfo]:
        """Libraries used for read->contig mapping / PE links (flags & 2)."""
        return [l for l in self.libs if l.asm_flags in (2, 3)]

    def libs_for_gap(self) -> List[LibInfo]:
        """Long reads used only for gap closure (asm_flags == 4)."""
        return [l for l in self.libs if l.asm_flags == 4]

    def sorted_by_insert(self) -> List[LibInfo]:
        """Libraries in ascending insert size — the scaffolding 'grads' order
        (reference sorts libs to build pes[]/peGrads)."""
        return sorted(self.libs, key=lambda l: l.avg_ins)


_INT_KEYS = {
    "avg_ins",
    "reverse_seq",
    "asm_flags",
    "rd_len_cutoff",
    "rank",
    "pair_num_cutoff",
    "map_len",
}
_FILE_KEYS = {"f1", "f2", "q1", "q2", "f", "q", "p", "b"}


def parse_config(path: str, base_dir: Optional[str] = None) -> AssemblyConfig:
    """Parse a .config file.  Relative read paths resolve against the config
    file's directory (convenience; the reference requires absolute paths)."""
    base = base_dir or os.path.dirname(os.path.abspath(path))
    max_rd_len = 0
    libs: List[LibInfo] = []
    cur: Optional[LibInfo] = None
    with open(path) as fh:
        for lineno, raw in enumerate(fh, 1):
            line = raw.strip()
            if not line or line.startswith("#") or line.startswith(";"):
                continue
            if line.upper().startswith("[LIB]"):
                cur = LibInfo()
                libs.append(cur)
                continue
            if "=" not in line:
                raise ValueError(f"{path}:{lineno}: expected key=value, got {line!r}")
            key, _, value = line.partition("=")
            key = key.strip()
            value = value.strip()
            if key == "max_rd_len":
                max_rd_len = int(value)
            elif key in _INT_KEYS:
                if cur is None:
                    raise ValueError(f"{path}:{lineno}: {key} outside [LIB]")
                setattr(cur, key, int(value))
            elif key in _FILE_KEYS:
                if cur is None:
                    raise ValueError(f"{path}:{lineno}: {key} outside [LIB]")
                p = value if os.path.isabs(value) else os.path.join(base, value)
                getattr(cur, key).append(p)
            else:
                raise ValueError(f"{path}:{lineno}: unknown key {key!r}")
    if max_rd_len <= 0:
        raise ValueError(f"{path}: max_rd_len missing or invalid")
    if not libs:
        raise ValueError(f"{path}: no [LIB] sections")
    return AssemblyConfig(max_rd_len=max_rd_len, libs=libs)
