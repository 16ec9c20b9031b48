"""Extended-range dynamic Huffman tables (qualities 97-99).

The standard Annex-K tables stop at DC category 11 / AC size 10; at
quality 97-99 the quantizer divisor drops below 1.0 (factor = 200 - 2q,
reference utils.py:48-53) and high-contrast images produce coefficients
whose categories exceed that range.  The reference crashes there with a
bare ``KeyError`` from the table dict (codec.py:153-162).  Here the
standard-table path raises a clean ``ValueError`` naming the fix, and
``auto_generate_huffman_table=True`` succeeds: the custom-table wire
format stores category/size as u4, so dynamic tables extend to 16 DC
categories / 16 AC sizes (huffman.DC_CATS / huffman.AC_SIZES).
"""

import numpy as np
import pytest

from tinyimgcodec_tpu import api, container, golden
from tinyimgcodec_tpu.huffman import (
    AC_SIZES,
    DC_CATS,
    build_huffman_spec,
    symbol_counts,
)


@pytest.fixture(scope="module")
def contrast_image():
    """Checkerboard-with-gradient: guarantees DC categories >= 12 at
    q=99 (max-amplitude block-to-block DC swings)."""
    rng = np.random.RandomState(7)
    img = np.zeros((64, 64), np.uint8)
    for by in range(8):
        for bx in range(8):
            img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                255 if (by + bx) % 2 else 0
            )
    img[16:48, 16:48] = rng.randint(0, 256, (32, 32))
    return img


def test_extended_symbols_present(contrast_image):
    arrays = golden.encode_arrays(contrast_image, 99)
    spec = build_huffman_spec(arrays)
    assert spec.extended  # the fixture must actually exercise the range


def test_standard_tables_raise_clean_valueerror(contrast_image):
    with pytest.raises(ValueError, match="auto_generate_huffman_table"):
        container.compress(contrast_image, 99)


def test_host_extended_roundtrip(contrast_image):
    data = container.compress(
        contrast_image, 99, auto_generate_huffman_table=True
    )
    out = container.decompress(data)
    assert out.shape == contrast_image.shape
    # q=99 divisors are tiny: reconstruction must be near-lossless
    err = np.abs(out.astype(int) - contrast_image.astype(int))
    assert err.max() <= 2


def test_native_python_decode_parity(contrast_image):
    data = container.compress(
        contrast_image, 99, auto_generate_huffman_table=True
    )
    a_nat = container.decompress_to_arrays(data, use_native=True)
    a_py = container.decompress_to_arrays(data, use_native=False)
    np.testing.assert_array_equal(a_nat.dc, a_py.dc)
    np.testing.assert_array_equal(a_nat.ac, a_py.ac)


def test_engine_extended_matches_host_bytes(contrast_image):
    data_j = api.compress(
        contrast_image, quality=99,
        auto_generate_huffman_table=True, backend="jax",
    )
    data_h = container.compress(
        contrast_image, 99, auto_generate_huffman_table=True,
        block_index=True,
    )
    assert data_j == data_h


def test_engine_standard_q99_raises(contrast_image):
    with pytest.raises(ValueError, match="auto_generate_huffman_table"):
        api.compress(contrast_image, quality=99, backend="jax")


def test_in_range_layout_unchanged(contrast_image):
    """Widening the count/table arrays must not change tables (and so
    bytes) for images whose symbols stay inside the standard range."""
    arrays = golden.encode_arrays(contrast_image, 50)
    spec = build_huffman_spec(arrays)
    assert not spec.extended
    dc_counts, ac_counts = symbol_counts(arrays.dc, arrays.ac)
    assert dc_counts.shape == (DC_CATS,)
    assert ac_counts.shape == (16 * AC_SIZES,)
    assert not dc_counts[12:].any()
    ac_grid = ac_counts.reshape(16, AC_SIZES)
    assert not ac_grid[:, 11:].any()
    # device-table views keep the (12,) / (16, 11) kernel layout
    dcc, dcl, acc, acl = spec.device_tables()
    assert dcc.shape == (12,) and acc.shape == (16, 11)


def test_symbol_counts_extended_bins(contrast_image):
    """Extended bins match the per-block reference RLE at q=99."""
    from collections import Counter

    from tinyimgcodec_tpu.golden import bits_required, run_length_encode

    arrays = golden.encode_arrays(contrast_image, 99)
    dc_counts, ac_counts = symbol_counts(arrays.dc, arrays.ac)
    ref_dc = Counter(int(c) for c in bits_required(arrays.dc))
    ref_ac: Counter = Counter()
    for row in arrays.ac:
        for run, value in run_length_encode(row):
            ref_ac[(run, int(bits_required(np.int32(value))))] += 1
    for cat in range(DC_CATS):
        assert dc_counts[cat] == ref_dc.get(cat, 0)
    for run in range(16):
        for size in range(AC_SIZES):
            assert ac_counts[run * AC_SIZES + size] == ref_ac.get(
                (run, size), 0
            ), (run, size)
