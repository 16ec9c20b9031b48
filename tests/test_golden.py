"""Golden host codec tests: pinned to verified reference semantics."""

import numpy as np
import pytest

from tests.conftest import needs_reference, synthetic_image
from tinyimgcodec_tpu import golden


def test_bits_required():
    vals = np.array([0, 1, -1, 2, 3, -3, 4, 255, -255, 256, 1023, 1024])
    expect = np.array([0, 1, 1, 2, 2, 2, 3, 8, 8, 9, 10, 11])
    assert np.array_equal(golden.bits_required(vals), expect)


def test_pad_image_reflect():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    padded = golden.pad_image(img)
    assert padded.shape == (8, 8)
    # reflect mode (reference utils.py:56-61): row 3 mirrors row 1
    assert np.array_equal(padded[3, :4], img[1])
    assert padded[0, 4] == img[0, 3 - 1]


def test_block_slice_combine_roundtrip():
    img = np.arange(16 * 24).reshape(16, 24)
    blocks = golden.block_slice(img)
    assert blocks.shape == (2, 3, 8, 8)
    assert np.array_equal(blocks[1, 2], img[8:16, 16:24])
    assert np.array_equal(golden.block_combine(blocks), img)


def test_quantize_round_half_even():
    # np.round is banker's rounding (SURVEY quirk 2.5-7): 0.5->0, 1.5->2
    coeffs = np.zeros((1, 1, 8, 8))
    coeffs[0, 0, 0, 0] = 8.0  # /16 = 0.5 -> 0
    coeffs[0, 0, 0, 1] = 16.5  # /11 = 1.5 -> 2
    q = golden.quantize(coeffs, 50)
    assert q[0, 0, 0, 0] == 0
    assert q[0, 0, 0, 1] == 2


def test_decode_truncates_toward_zero():
    # Output cast is truncation, not rounding (reference codec.py:68-70).
    arrays = golden.encode_arrays(np.full((8, 8), 200, np.uint8), 50)
    img = golden.decode_arrays(arrays)
    assert img.dtype == np.uint8


def test_dct_orthonormal_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 4, 8, 8)
    assert np.allclose(golden.block_idct(golden.block_dct(x)), x, atol=1e-12)


def test_encode_decode_roundtrip_psnr(small_image):
    arrays = golden.encode_arrays(small_image, 50)
    out = golden.decode_arrays(arrays)
    assert out.shape == small_image.shape
    mse = np.mean((out.astype(float) - small_image.astype(float)) ** 2)
    psnr = 20 * np.log10(255 / np.sqrt(mse))
    assert psnr > 28.0


def test_arrays_roundtrip_nonmultiple_of_8():
    img = synthetic_image(75, 100, seed=5)
    arrays = golden.encode_arrays(img, 50)
    out = golden.decode_arrays(arrays)
    assert out.shape == (75, 100)


# ---------------------------------------------------------------------------
# RLE golden vectors
# ---------------------------------------------------------------------------

def _rle(seq):
    return golden.run_length_encode(np.array(seq + [0] * (63 - len(seq))))


def test_rle_simple():
    assert _rle([5, 0, 0, 3]) == [(0, 5), (2, 3), (0, 0)]


def test_rle_all_zero():
    assert golden.run_length_encode(np.zeros(63, int)) == [(0, 0)]


def test_rle_long_run_zrl():
    seq = [1] + [0] * 20 + [7]
    assert _rle(seq) == [(0, 1), (15, 0), (4, 7), (0, 0)]


def test_rle_exact_16_run():
    seq = [1] + [0] * 16 + [7]
    assert _rle(seq) == [(0, 1), (15, 0), (0, 7), (0, 0)]


def test_rle_trailing_zeros_dropped():
    seq = [9]
    assert _rle(seq) == [(0, 9), (0, 0)]


def test_rle_last_coefficient_nonzero_still_gets_eob():
    seq = [0] * 62 + [4]
    out = golden.run_length_encode(np.array(seq))
    assert out == [(15, 0), (15, 0), (15, 0), (14, 4), (0, 0)]


def test_rle_decode_inverse():
    rng = np.random.RandomState(1)
    for _ in range(50):
        row = rng.randint(-4, 5, size=63) * (rng.rand(63) < 0.2)
        row = row.astype(np.int32)
        pairs = golden.run_length_encode(row)
        assert np.array_equal(golden.run_length_decode(pairs), row)


@needs_reference
def test_rle_matches_reference():
    from tests.ref_shim import import_reference

    import_reference()
    from tinyimgcodec.huffman import encode_run_length  # type: ignore

    rng = np.random.RandomState(2)
    for _ in range(100):
        row = (rng.randint(-30, 31, size=63) * (rng.rand(63) < 0.15)).astype(
            np.int32
        )
        theirs = [tuple(p) for p in encode_run_length(row)]
        assert golden.run_length_encode(row) == theirs


@needs_reference
def test_transform_matches_reference(small_image):
    from tests.ref_shim import import_reference

    ref = import_reference()
    info = ref.encode(small_image, quality=50)
    ours = golden.encode_arrays(small_image, 50)
    assert np.array_equal(info["dc"], ours.dc)
    assert np.array_equal(info["ac"], ours.ac)
