"""Chunk-ownership reader (multi-host input sharding, VERDICT r4 item 1):
``skip_records`` must advance the stream exactly like ``next_records``
without paying the matrix parse, and ``iter_owned_matrix_chunks`` must give
every owner the identical (chunk_idx, n_records) schedule while parsing
disjoint chunk subsets that reassemble to the full stream."""

import numpy as np
import pytest

from barcoder_tpu.seqio.fast_reader import (
    MatrixStream,
    iter_matrix_chunks,
    iter_owned_matrix_chunks,
)


def _write_fastq(path, reads):
    with open(path, "w") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")


def _rand_reads(n, rng, lo=30, hi=60):
    return [
        "".join(rng.choice(list("ACGT"), size=rng.integers(lo, hi)))
        for _ in range(n)
    ]


@pytest.fixture()
def fq(tmp_path):
    rng = np.random.default_rng(11)
    reads = _rand_reads(533, rng)
    p = tmp_path / "r.fastq"
    _write_fastq(p, reads)
    return str(p), reads


class TestSkipRecords:
    def test_counts_match_parse(self, fq):
        path, reads = fq
        s_skip, s_parse = MatrixStream(path), MatrixStream(path)
        while True:
            n1 = s_skip.skip_records(100)
            r = s_parse.next_records(100)
            if n1 is None:
                assert r is None
                break
            assert n1 == len(r[1])
        s_skip.close(), s_parse.close()

    def test_interleaved_skip_then_parse(self, fq):
        """A skipped prefix leaves the stream positioned exactly at the
        next record."""
        path, reads = fq
        s = MatrixStream(path)
        assert s.skip_records(200) == 200
        mat, lens = s.next_records(5)
        got = [
            mat[i, : lens[i]].tobytes().decode() for i in range(len(lens))
        ]
        assert got == reads[200:205]
        s.close()

    def test_no_trailing_newline(self, tmp_path):
        p = tmp_path / "t.reads"
        p.write_bytes(b"ACGT\nGGTT\nTTAA")  # last record unterminated
        s = MatrixStream(str(p))
        assert s.skip_records(10) == 3
        assert s.skip_records(10) is None
        s.close()

    @pytest.mark.parametrize("payload,fmt,expect", [
        # trailing blank line(s): not records — skip must agree with the
        # parsers, which drop them (r5 review: the old skip counted them,
        # desyncing the multi-host lockstep schedule)
        (b"AAAA\nCCCC\n\n", "reads", 2),
        (b"AAAA\nCCCC\n\n\n\r\n", "reads", 2),
        (b"AAAA\n\nCCCC\n", "reads", 2),  # mid-file blank dropped too
        (b"@r1\nACGT\n+\nIIII\n\n", "fastq", 1),
        # truncated final FASTQ record (missing +/quality): still a read,
        # like the reference's readline loop and the native parser
        (b"@r1\nACGT\n+\nIIII\n@r2\nTTTT\n", "fastq", 2),
        (b"@r1\nACGT\n+\nIIII\n@r2\nTTTT", "fastq", 2),
    ])
    def test_eof_edge_counts_agree(self, tmp_path, payload, fmt, expect):
        """skip_records and next_records must report identical counts on
        EOF edge shapes (blank tails, truncated records) — the lockstep
        invariant — and match the expected parser semantics."""
        p = tmp_path / ("t." + fmt)
        p.write_bytes(payload)
        s_skip, s_parse = MatrixStream(str(p)), MatrixStream(str(p))
        n_skip = n_parse = 0
        while True:
            k = s_skip.skip_records(100)
            if k is None:
                break
            n_skip += k
        while True:
            r = s_parse.next_records(100)
            if r is None:
                break
            n_parse += len(r[1])
        s_skip.close(), s_parse.close()
        assert n_skip == n_parse == expect, (payload, n_skip, n_parse)


class TestOwnedIterator:
    def test_disjoint_and_complete(self, fq):
        path, reads = fq
        # the plain iterator's row stream is the ground truth
        flat = []
        for r1, _ in iter_matrix_chunks(path, chunk_size=64):
            mat, lens = r1
            flat.extend(
                mat[i, : lens[i]].tobytes().decode() for i in range(len(lens))
            )
        assert flat == reads

        K = 2
        schedules, parsed = [], {k: [] for k in range(K)}
        for k in range(K):
            sched = []
            for idx, n, r1, r2 in iter_owned_matrix_chunks(
                path, chunk_size=64, owner=k, num_owners=K
            ):
                sched.append((idx, n))
                assert (r1 is not None) == (idx % K == k)
                assert r2 is None
                if r1 is not None:
                    mat, lens = r1
                    assert len(lens) == n
                    parsed[k].append(
                        (idx, [mat[i, : lens[i]].tobytes().decode()
                               for i in range(len(lens))])
                    )
            schedules.append(sched)
        # identical shared schedule on every owner
        assert schedules[0] == schedules[1]
        assert sum(n for _, n in schedules[0]) == len(reads)
        # disjoint ownership reassembling to the full stream
        own0 = {i for i, _ in parsed[0]}
        own1 = {i for i, _ in parsed[1]}
        assert own0.isdisjoint(own1)
        merged = dict(parsed[0] + parsed[1])
        reassembled = [r for i in sorted(merged) for r in merged[i]]
        assert reassembled == reads

    def test_paired(self, tmp_path):
        rng = np.random.default_rng(5)
        reads1, reads2 = _rand_reads(130, rng), _rand_reads(130, rng)
        p1, p2 = tmp_path / "a.fastq", tmp_path / "b.fastq"
        _write_fastq(p1, reads1), _write_fastq(p2, reads2)
        got1, got2 = [], []
        for k in range(2):
            for idx, n, r1, r2 in iter_owned_matrix_chunks(
                str(p1), str(p2), chunk_size=32, owner=k, num_owners=2
            ):
                assert (r1 is None) == (r2 is None)
                if r1 is not None:
                    for (mat, lens), out in ((r1, got1), (r2, got2)):
                        out.extend(
                            (idx, mat[i, : lens[i]].tobytes().decode())
                            for i in range(len(lens))
                        )
        assert [r for _, r in sorted(got1, key=lambda t: t[0])] != []
        assert sorted(got1)[0][0] == 0
        assert [r for _, r in sorted(got1, key=lambda t: t[0])] == reads1
        assert [r for _, r in sorted(got2, key=lambda t: t[0])] == reads2

    def test_paired_length_mismatch(self, tmp_path):
        _write_fastq(tmp_path / "a.fastq", ["ACGT"] * 10)
        _write_fastq(tmp_path / "b.fastq", ["ACGT"] * 7)
        with pytest.raises(ValueError, match="same for paired-end"):
            for _ in iter_owned_matrix_chunks(
                str(tmp_path / "a.fastq"), str(tmp_path / "b.fastq"),
                chunk_size=4, owner=0, num_owners=2,
            ):
                pass

    @pytest.mark.parametrize("fmt", ["fastq", "fastq.gz", "reads"])
    def test_formats_and_owner_counts(self, tmp_path, fmt):
        """Owned iteration reassembles the stream for every supported
        input format and any owner count, with identical schedules."""
        import gzip
        import zlib

        # deterministic per-format seed (str.__hash__ is salted per process)
        rng = np.random.default_rng(zlib.crc32(fmt.encode()))
        reads = _rand_reads(311, rng, lo=20, hi=70)
        p = tmp_path / f"r.{fmt}"
        if fmt == "reads":
            p.write_text("".join(r + "\n" for r in reads))
        elif fmt == "fastq.gz":
            with gzip.open(p, "wt") as fh:
                for i, r in enumerate(reads):
                    fh.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
        else:
            _write_fastq(p, reads)
        for K in (1, 3):
            got = {}
            scheds = []
            for k in range(K):
                sched = []
                for idx, n, r1, _ in iter_owned_matrix_chunks(
                    str(p), chunk_size=50, owner=k, num_owners=K
                ):
                    sched.append((idx, n))
                    if r1 is not None:
                        mat, lens = r1
                        got[idx] = [
                            mat[i, : lens[i]].tobytes().decode()
                            for i in range(len(lens))
                        ]
                scheds.append(sched)
            assert all(s == scheds[0] for s in scheds)
            reassembled = [r for i in sorted(got) for r in got[i]]
            assert reassembled == reads, (fmt, K)

    def test_start_chunk_skips_owned_parse(self, fq):
        path, reads = fq
        rows = []
        for idx, n, r1, _ in iter_owned_matrix_chunks(
            path, chunk_size=64, owner=0, num_owners=2, start_chunk=4
        ):
            if idx < 4:
                assert r1 is None  # resume skip: no parse even when owned
            elif idx % 2 == 0:
                assert r1 is not None
                rows.extend(
                    r1[0][i, : r1[1][i]].tobytes().decode()
                    for i in range(len(r1[1]))
                )
        assert rows == reads[256:320] + reads[384:448] + reads[512:]


class TestBlankLineReads:
    """r5 review: paired .reads with blank lines raised a spurious
    length-mismatch (records were cut by LINE count, not record count);
    cuts now consume however many lines hold n NONBLANK records."""

    def test_paired_reads_with_blanks_align(self, tmp_path):
        f1, f2 = tmp_path / "a.reads", tmp_path / "b.reads"
        # equal record counts; blanks at different places in each file
        f1.write_text("AAAA\n\nCCCC\nGGGG\n\nTTTT\n")
        f2.write_text("TTTT\nGGGG\n\n\nCCCC\nAAAA\n")
        chunks = list(iter_owned_matrix_chunks(str(f1), str(f2), chunk_size=2))
        r1 = [row.tobytes().rstrip(b"\x00") for _i, _n, a, b in chunks for row in a[0]]
        r2 = [row.tobytes().rstrip(b"\x00") for _i, _n, a, b in chunks for row in b[0]]
        assert r1 == [b"AAAA", b"CCCC", b"GGGG", b"TTTT"]
        assert r2 == [b"TTTT", b"GGGG", b"CCCC", b"AAAA"]

    def test_skip_matches_parse_with_blanks(self, tmp_path):
        f1 = tmp_path / "a.reads"
        f1.write_text("AAAA\n\n\nCCCC\nGGGG\n\nTTTT\nACGT\n")
        parse = [
            n for _i, n, _a, _b in iter_owned_matrix_chunks(str(f1), chunk_size=2)
        ]
        skip = [
            n
            for _i, n, _a, _b in iter_owned_matrix_chunks(
                str(f1), chunk_size=2, owner=1, num_owners=2
            )
        ]
        assert parse == skip == [2, 2, 1]

    def test_zero_record_request_is_not_eof(self, tmp_path):
        from barcoder_tpu.seqio.fast_reader import MatrixStream

        f1 = tmp_path / "a.reads"
        f1.write_text("AAAA\nCCCC\n")
        s = MatrixStream(str(f1))
        mat, lens = s.next_records(0)
        assert len(lens) == 0  # empty batch, NOT the end-of-stream None
        assert s.skip_records(0) == 0
        mat, lens = s.next_records(10)
        assert len(lens) == 2
        s.close()
