import numpy as np
import pytest

from barcoder_tpu.core.encode import (
    N_CODE,
    decode,
    encode,
    gc_content,
    onehot,
    pack_2bit,
    revcomp,
    revcomp_codes,
)


def test_encode_roundtrip():
    s = "ACGTACGTNNAC"
    assert decode(encode(s)) == s


def test_encode_case_and_unknown():
    assert list(encode("acgt")) == [0, 1, 2, 3]
    assert list(encode("RYKM")) == [N_CODE] * 4
    assert list(encode("U")) == [3]


def test_revcomp():
    assert revcomp("ACGTN") == "NACGT"
    assert revcomp("AAGG") == "CCTT"
    assert revcomp("acgt") == "acgt"[::-1].translate(str.maketrans("acgt", "tgca"))


def test_revcomp_codes():
    codes = encode("AACGTN")
    assert decode(revcomp_codes(codes)) == "NACGTT"


def test_onehot_n_is_zero():
    oh = onehot(encode("AN"))
    assert oh[0].tolist() == [1, 0, 0, 0]
    assert oh[1].tolist() == [0, 0, 0, 0]


def test_pack_2bit():
    codes = encode("ACGT" * 8)  # 32 bases = 2 uint32 words
    packed = pack_2bit(codes)
    assert packed.dtype == np.uint32
    assert len(packed) == 2
    # first word: A C G T ... little-endian 2-bit lanes: 0b11100100 repeated
    assert packed[0] == np.uint32(0xE4E4E4E4)


def test_gc_content():
    assert gc_content("GGCC") == 1.0
    assert gc_content("ATGC") == pytest.approx(0.5)
