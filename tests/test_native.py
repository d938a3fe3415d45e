"""Native seqpack library: build, bindings, and fallback agreement."""

import numpy as np
import pytest

from barcoder_tpu import native_bridge as nb
from barcoder_tpu.core.encode import encode, revcomp

from .genomes import random_seq


@pytest.fixture(scope="module")
def native():
    if not nb.seqpack_available():
        pytest.skip("g++/native build unavailable")
    return nb.get_lib()


def make_fastq_bytes(reads):
    return b"".join(
        f"@r{i}\n{s}\n+\n{'I' * len(s)}\n".encode() for i, s in enumerate(reads)
    )


class TestParsers:
    def test_parse_fastq(self, native):
        reads = ["ACGTACGT", "TTTT", "ACGTACGTACGTACGT"]
        mat, lens = nb.parse_fastq_buffer(make_fastq_bytes(reads), row_width=12)
        assert lens.tolist() == [8, 4, 16]
        assert mat[0, :8].tobytes() == b"ACGTACGT"
        assert mat[1, 4:].sum() == 0
        assert mat[2].tobytes() == b"ACGTACGTACGT"  # truncated to width

    def test_parse_fastq_matches_fallback(self, native):
        rng = np.random.default_rng(0)
        reads = [random_seq(int(rng.integers(10, 40)), rng) for _ in range(200)]
        data = make_fastq_bytes(reads)
        a = nb.parse_fastq_buffer(data, row_width=40)
        import os

        os.environ["BARCODER_TPU_NO_NATIVE"] = "1"
        lib_save, tried_save = nb._lib, nb._tried
        nb._lib, nb._tried = None, False
        try:
            b = nb.parse_fastq_buffer(data, row_width=40)
        finally:
            del os.environ["BARCODER_TPU_NO_NATIVE"]
            nb._lib, nb._tried = lib_save, tried_save
        assert np.array_equal(a[0], b[0])
        assert np.array_equal(a[1], b[1])

    def test_parse_reads(self, native):
        data = b"AAAA\nCCCC\n\nGGGGG\n"
        mat, lens = nb.parse_reads_buffer(data, row_width=5)
        assert lens.tolist() == [4, 4, 5]
        assert mat[2].tobytes() == b"GGGGG"


class TestTransforms:
    def test_encode_codes(self, native):
        arr = np.frombuffer(b"ACGTNacgtX", dtype=np.uint8)
        codes = nb.encode_codes(arr)
        assert codes.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
        assert np.array_equal(codes, encode("ACGTNacgtX"))

    def test_revcomp_ascii(self, native):
        mat = np.frombuffer(b"ACGTNTTTAA", dtype=np.uint8).reshape(2, 5)
        rc = nb.revcomp_ascii(mat)
        assert rc[0].tobytes().decode() == revcomp("ACGTN")
        assert rc[1].tobytes().decode() == revcomp("TTTAA")

    def test_pack_matches_fallback(self, native):
        rng = np.random.default_rng(1)
        seqs = [random_seq(20, rng) for _ in range(50)] + ["ACGTNACGTNACGTNACGTN"]
        mat = np.array(seqs, dtype="S").view(np.uint8).reshape(len(seqs), -1)
        a = nb.pack_2bit64(mat)
        import os

        os.environ["BARCODER_TPU_NO_NATIVE"] = "1"
        lib_save, tried_save = nb._lib, nb._tried
        nb._lib, nb._tried = None, False
        try:
            b = nb.pack_2bit64(mat)
        finally:
            del os.environ["BARCODER_TPU_NO_NATIVE"]
            nb._lib, nb._tried = lib_save, tried_save
        assert np.array_equal(a, b)
        assert a[-1] == np.uint64(0xFFFFFFFFFFFFFFFF)


class TestCountExact:
    def test_counts_match_python(self, native):
        rng = np.random.default_rng(2)
        barcodes = sorted({random_seq(20, rng) for _ in range(30)})
        L_fl, R_fl, pre, tail = "GGTAGCT", "CTTAAGC", "ACGTG", "TCCATGGA"
        reads, truth = [], {}
        for _ in range(3000):
            bc = barcodes[rng.integers(0, len(barcodes))]
            reads.append(pre + L_fl + bc + R_fl + tail)
            truth[bc] = truth.get(bc, 0) + 1
        mat = np.array(reads, dtype="S").view(np.uint8).reshape(len(reads), -1)
        lens = np.full(len(reads), len(reads[0]), dtype=np.int64)
        bc_mat = np.array(barcodes, dtype="S").view(np.uint8).reshape(len(barcodes), -1)
        keys = nb.pack_2bit64(bc_mat)
        order = np.argsort(keys)
        res = nb.count_exact(
            mat, lens, start=len(pre), l_flank=L_fl, r_flank=R_fl,
            bc_len=20, bc_keys_sorted=keys[order],
        )
        assert res is not None
        doc, undoc_rows = res
        assert len(undoc_rows) == 0
        got = {barcodes[order[i]]: int(c) for i, c in enumerate(doc) if c}
        # map sorted slots back to barcode strings
        inv = {int(k): b for k, b in zip(keys, barcodes)}
        got = {}
        for slot, cnt in enumerate(doc):
            if cnt:
                got[inv[int(keys[order][slot])]] = int(cnt)
        assert got == truth

    def test_n_and_flank_rejection(self, native):
        barcodes = ["ACGT" * 5, "TGCA" * 5] + [f"AC{('GT' * 9)}" ] * 0
        barcodes = sorted(set(barcodes) | {("ACGT" * 5)[:-1] + "C"} | {f"A{c}GTACGTACGTACGTACGT" for c in "CG"})
        keys = nb.pack_2bit64(np.array(sorted(barcodes), dtype="S").view(np.uint8).reshape(len(barcodes), -1))
        order = np.argsort(keys)
        reads = [
            "GG" + "ACGT" * 5 + "CC",   # ok, matches barcode 0 with flanks GG/CC
            "GG" + "ACGT" * 5 + "CA",   # wrong right flank -> skipped
            "GG" + "ACNT" + "ACGT" * 4 + "CC",  # N -> skipped
            "GG" + "TTTT" * 5 + "CC",   # flanks ok, unknown core -> undocumented
        ]
        mat = np.array(reads, dtype="S").view(np.uint8).reshape(len(reads), -1)
        lens = np.array([len(r) for r in reads], dtype=np.int64)
        doc, undoc_rows = nb.count_exact(
            mat, lens, start=0, l_flank="GG", r_flank="CC",
            bc_len=20, bc_keys_sorted=keys[order],
        )
        assert doc.sum() == 1
        assert undoc_rows.tolist() == [3]


class TestFallbackRecordParity:
    """r5 review: the numpy fallbacks must COUNT records exactly like the
    native parsers (and MatrixStream's cut arithmetic) — a divergence
    desyncs the multi-host lockstep dispatch schedule."""

    def _fallback(self, fn, *args):
        import os

        os.environ["BARCODER_TPU_NO_NATIVE"] = "1"
        lib_save, tried_save = nb._lib, nb._tried
        nb._lib, nb._tried = None, False
        try:
            return fn(*args)
        finally:
            del os.environ["BARCODER_TPU_NO_NATIVE"]
            nb._lib, nb._tried = lib_save, tried_save

    def test_fastq_edge_records(self, native):
        # empty sequence line, header-only truncated final record, blank
        # line between records — all kept by the native parser
        data = b"@r1\n\n+\n\n\n@r2\nACGT\n+\nIIII\n@r3"
        a = nb.parse_fastq_buffer(data, row_width=8)
        b = self._fallback(nb.parse_fastq_buffer, data, 8)
        assert len(a[1]) == len(b[1]) == 3
        assert a[1].tolist() == b[1].tolist() == [0, 4, 0]
        assert np.array_equal(a[0], b[0])

    def test_reads_whitespace_line(self, native):
        data = b"AAAA\n   \n\nCCCC\n"  # whitespace-only line IS a record
        a = nb.parse_reads_buffer(data, row_width=4)
        b = self._fallback(nb.parse_reads_buffer, data, 4)
        assert len(a[1]) == len(b[1]) == 3
        assert a[1].tolist() == b[1].tolist()
        assert np.array_equal(a[0], b[0])
