"""Table derivation tests: canonical Annex K codes, zigzag, AAN scales."""

import numpy as np

from tests.conftest import needs_reference
from tinyimgcodec_tpu import constants as C


def test_dc_codes_spot_values():
    t = C.string_code_tables()[C.DC]
    assert t[0] == "00"
    assert t[1] == "010"
    assert t[5] == "110"
    assert t[6] == "1110"
    assert t[11] == "111111110"


def test_ac_codes_spot_values():
    t = C.string_code_tables()[C.AC]
    assert t[(0, 0)] == "1010"  # EOB
    assert t[(15, 0)] == "11111111001"  # ZRL
    assert t[(0, 1)] == "00"
    assert t[(0, 2)] == "01"
    assert t[(1, 1)] == "1100"
    assert t[(15, 10)] == "1111111111111110"
    assert t[(2, 3)] == "1111110111"


def test_codes_are_prefix_free():
    for table in C.string_code_tables().values():
        codes = sorted(table.values())
        for a, b in zip(codes, codes[1:]):
            assert not b.startswith(a), (a, b)


def test_zigzag_inverse():
    assert np.array_equal(
        C.ZIGZAG_ORDER[C.INVERSE_ZIGZAG], np.arange(64)
    )
    # first and last few entries of the classic scan
    assert list(C.ZIGZAG_ORDER[:6]) == [0, 1, 8, 16, 9, 2]
    assert C.ZIGZAG_ORDER[63] == 63


def test_quality_factor_mapping():
    assert C.quality_to_factor(50) == 100.0
    assert C.quality_to_factor(10) == 500.0
    assert C.quality_to_factor(90) == 20.0
    # q=50 leaves the table unscaled
    assert np.array_equal(
        C.quant_divisors(50), C.LUMINANCE_QUANTIZATION_TABLE.astype(float)
    )


def test_aan_scales_known_values():
    # corner values from the reference table (constants.py:37-51)
    q11 = np.round(C.AAN_SCALES * 2048).astype(int)
    assert q11[0, 0] == 16384
    assert q11[0, 1] == 22725
    assert q11[7, 7] == 1247
    assert q11[3, 4] == 19266


@needs_reference
def test_tables_match_reference_exactly():
    from tests.ref_shim import import_reference

    import_reference()
    from tinyimgcodec.constants import (  # type: ignore
        ANNSCALES,
        HUFFMAN_CATEGORY_CODEWORD,
        LUMINANCE_QUANTIZATION_TABLE,
        ZIGZAG_ORDER,
    )

    ours = C.string_code_tables()
    assert dict(HUFFMAN_CATEGORY_CODEWORD["DC"]) == ours[C.DC]
    assert dict(HUFFMAN_CATEGORY_CODEWORD["AC"]) == ours[C.AC]
    assert np.array_equal(
        LUMINANCE_QUANTIZATION_TABLE, C.LUMINANCE_QUANTIZATION_TABLE
    )
    assert np.array_equal(ZIGZAG_ORDER, C.ZIGZAG_ORDER)
    assert np.allclose(ANNSCALES, C.AAN_SCALES, atol=0)
