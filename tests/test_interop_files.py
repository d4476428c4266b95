"""Reference-exact map/contig stage file formats (VERDICT interop item).

Round-trips the binary/text formats the reference binaries read and
write: tight-string 2-bit packing (seq.c:81), the directed-id
*.ContigIndex (output_contig.c:292 / basicContigInfo prlRead2Ctg.c:727),
the 4-column *.readOnContig.gz (recordAlldgn prlRead2Ctg.c:666), the
binary *.readInGap.gz (output1read_gz :427 / getRead1by1_gz
prlReadFillGap.c:107), and the x10-cvg *.updated.edge
(output_updated_edges output_contig.c:333 / loadGraph.c:391)."""
import gzip
import struct

import numpy as np

from soapdenovo2_tpu.io import files as fio
from soapdenovo2_tpu.models.mapping import GapReads


def test_tight_string_roundtrip():
    rng = np.random.default_rng(0)
    for n in (1, 3, 4, 7, 100, 150):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        buf = fio.pack_tight(codes)
        assert len(buf) == n // 4 + 1  # reference always writes len/4+1
        out = fio.unpack_tight(buf, n)
        assert (out == codes).all()
    # bit layout: first base in the HIGH bits (seq.c:81 case 0: nt << 6)
    buf = fio.pack_tight(np.array([3, 0, 0, 0], np.uint8))
    assert buf[0] == 0b11000000


def test_contig_index_directed_ids(tmp_path):
    prefix = str(tmp_path / "g")
    lengths = [500, 300, 200]
    pal = [False, True, False]  # contig 2 palindromic
    fio.write_contig_index(prefix, lengths, pal)
    text = open(prefix + ".ContigIndex").read().splitlines()
    # directed count: 2 + 1 + 2 = 5
    assert text[0] == "Edge_num 5 3"
    assert text[1] == "index\tlength\treverseComplement"
    assert text[2] == "1\t500\t1"
    assert text[3] == "3\t300\t0"  # id 2 was the twin of contig 1
    assert text[4] == "4\t200\t1"
    m = fio.read_contig_index(prefix)
    assert list(m.dir2ref) == [1, 2, 3, 3, 4, 5]
    assert m.ref2dir[1] == 0 and m.ref2dir[2] == 1
    assert m.ref2dir[3] == 2  # palindrome: both slots -> forward
    assert m.ref2dir[4] == 4 and m.ref2dir[5] == 5
    assert list(m.lengths) == lengths


def test_read_on_contig_reference_format(tmp_path):
    prefix = str(tmp_path / "g")
    pal = [False, True, False]
    d2r = fio.dir_to_ref_ids(pal)
    rid = np.array([0, 1, 5], np.int64)
    ctg = np.array([0, 3, 2], np.int32)  # fwd c0, twin c1(pal->self), c2 fwd...
    pos = np.array([10, -2, 7], np.int32)
    fio.write_read_on_contig(prefix, rid, ctg, pos, dir2ref=d2r)
    with gzip.open(prefix + ".readOnContig.gz", "rt") as fh:
        lines = fh.read().splitlines()
    assert lines[0] == "read\tcontig\tpos"
    # read ids 1-based; ctg 3 is our directed id for the palindrome's
    # "twin" slot -> same ref id 3, orien '+' (no distinct twin)
    assert lines[1] == "1\t1\t10\t+"
    assert lines[2] == "2\t3\t-2\t+"
    assert lines[3] == "6\t3\t7\t+"


def test_read_on_contig_roundtrip(tmp_path):
    prefix = str(tmp_path / "g")
    pal = [False, False]
    fio.write_contig_index(prefix, [100, 200], pal)
    m = fio.read_contig_index(prefix)
    rid = np.array([0, 3, 4], np.int64)
    ctg = np.array([1, 2, 3], np.int32)  # twin of c0, fwd c1, twin c1
    pos = np.array([5, 6, 7], np.int32)
    fio.write_read_on_contig(prefix, rid, ctg, pos, dir2ref=m.dir2ref)
    r2, c2, p2 = fio.read_read_on_contig(prefix, ref2dir=m.ref2dir)
    assert list(r2) == [0, 3, 4]
    assert list(c2) == [1, 2, 3]
    assert list(p2) == [5, 6, 7]
    with gzip.open(prefix + ".readOnContig.gz", "rt") as fh:
        rows = [l.split("\t") for l in fh.read().splitlines()[1:]]
    assert rows[0][3] == "-" and rows[1][3] == "+" and rows[2][3] == "-"


def test_read_in_gap_binary_roundtrip(tmp_path):
    prefix = str(tmp_path / "g")
    pal = [False, False]
    fio.write_contig_index(prefix, [100, 200], pal)
    m = fio.read_contig_index(prefix)
    pool = GapReads.empty()
    rng = np.random.default_rng(1)
    for i, (c, p, ins) in enumerate([(0, 10, 300), (3, 40, 500)]):
        seq = rng.integers(0, 4, 73 + i).astype(np.uint8)
        pool.anchor_ctg.append(c)
        pool.anchor_pos.append(p)
        pool.insert_size.append(ins)
        pool.seqs.append(seq.tobytes())
        pool.dh.append(1)
    fio.write_read_in_gap(prefix, pool, dir2ref=m.dir2ref)
    # raw record check: (len, refctg, pos) little-endian int32 header
    with gzip.open(prefix + ".readInGap.gz", "rb") as fh:
        ln, ref, pos = struct.unpack("<iii", fh.read(12))
    assert ln == 73 and ref == 1 and pos == 10 + 300 - 73
    back = fio.read_read_in_gap(prefix, ref2dir=m.ref2dir)
    assert len(back) == 2
    assert back.anchor_ctg == [0, 3]
    # window-preserving re-anchoring: (pos - 2*len, ins = 3*len) keeps the
    # gap-pool reach [pos-2rl, pos+2rl] AND the write formula
    # anchor + ins - len == pos stable across round-trips
    p1 = 10 + 300 - 73
    p2 = 40 + 500 - 74
    assert back.anchor_pos == [p1 - 2 * 73, p2 - 2 * 74]
    assert back.insert_size == [3 * 73, 3 * 74]
    assert (back.anchor_pos[0] + back.insert_size[0] - 73) == p1
    assert np.frombuffer(back.seqs[0], np.uint8).shape == (73,)
    for i in range(2):
        assert back.seqs[i] == pool.seqs[i]


def test_long_read_in_gap(tmp_path):
    prefix = str(tmp_path / "g")
    pool = GapReads.empty()
    seq = np.arange(40, dtype=np.uint8) % 4
    pool.anchor_ctg.append(2)
    pool.anchor_pos.append(55)
    pool.insert_size.append(18)
    pool.seqs.append(seq.tobytes())
    pool.dh.append(0)
    fio.write_long_read_in_gap(prefix, pool)
    back = fio.read_read_in_gap(prefix)  # merges longReadInGap
    assert len(back) == 1
    # the record holds the read's own placement (55); read-back uses the
    # window-preserving re-anchor so anchor + ins - len == 55 round-trips
    assert back.anchor_pos[0] + back.insert_size[0] - 40 == 55
    assert back.seqs[0] == seq.tobytes()


def test_updated_edge_cvg(tmp_path):
    prefix = str(tmp_path / "g")
    fio.write_updated_edges(prefix, [(500, False, 31.4), (300, True, 7.0)])
    text = open(prefix + ".updated.edge").read().splitlines()
    assert text[0] == "EDGEs 3"
    assert text[1] == ">length 500,1,314,"
    assert text[2] == ">length 500,-1,314,"
    assert text[3] == ">length 300,0,70,"
    cvg = fio.read_contig_cvg(prefix, 2)
    assert abs(cvg[0] - 31.4) < 1e-9 and abs(cvg[1] - 7.0) < 1e-9


def test_pe_grads_reference_header(tmp_path):
    from soapdenovo2_tpu.io.reads import PeGrad

    prefix = str(tmp_path / "g")
    grads = [PeGrad(350, 1000, 1, 3), PeGrad(3000, 1500, 2, 5)]
    fio.write_pe_grads(prefix, grads, 100)
    head = open(prefix + ".peGrads").readline()
    # reference loadPEgrads sscanf's THREE values after 'grads&num: '
    # (attachPEinfo.c:95): count, total reads, max read len
    assert head == "grads&num: 2\t1500\t100\n"
    back, mrl = fio.read_pe_grads(prefix)
    assert mrl == 100
    assert [g.insert_size for g in back] == [350, 3000]
    assert [g.pair_num_cutoff for g in back] == [3, 5]
