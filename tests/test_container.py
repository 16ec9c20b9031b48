"""Container/bitstream-level tests incl. reference conformance."""

import struct

import numpy as np
import pytest

from tests.conftest import needs_reference, synthetic_image
from tinyimgcodec_tpu import container, golden
from tinyimgcodec_tpu.constants import FLAG_CUSTOM_TABLE, HEADER_BYTES


def test_header_roundtrip():
    arrays = golden.encode_arrays(synthetic_image(17, 33), 75)
    hdr = container.make_header(arrays)
    assert len(hdr) == HEADER_BYTES
    h, w, q, flag = container.parse_header(hdr)
    assert (h, w, q, flag) == (17, 33, 75, 0)


def test_compress_decompress_roundtrip(small_image):
    data = container.compress(small_image, 50)
    out = container.decompress(data)
    ref = golden.decode_arrays(golden.encode_arrays(small_image, 50))
    assert np.array_equal(out, ref)


def test_compression_ratio_sane(small_image):
    data = container.compress(small_image, 50)
    assert len(data) < small_image.size  # actually compresses


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_quality_sweep_roundtrip(quality):
    img = synthetic_image(40, 56, seed=9)
    out = container.decompress(container.compress(img, quality))
    assert out.shape == img.shape


def test_truncated_stream_degrades_gracefully(small_image):
    # SURVEY quirk 2.5-10: decode what's decodable, rest stays flat.
    data = container.compress(small_image, 50)
    out = container.decompress(data[: len(data) // 2])
    assert out.shape == small_image.shape


def test_custom_table_roundtrip(small_image):
    # The reference's dynamic-table path is broken (quirk 2.5-1); ours
    # round-trips and must reproduce the exact same pixels as the static
    # table path (entropy coding is lossless).
    data = container.compress(small_image, 50, auto_generate_huffman_table=True)
    _, _, _, flag = container.parse_header(data)
    assert flag & FLAG_CUSTOM_TABLE
    static = container.compress(small_image, 50)
    assert np.array_equal(
        container.decompress(data), container.decompress(static)
    )


def test_custom_table_compresses_no_worse(small_image):
    static = container.compress(small_image, 50)
    dynamic = container.compress(
        small_image, 50, auto_generate_huffman_table=True
    )
    # dynamic tables pay a header cost but the payload is optimal; allow
    # small overhead on tiny images
    assert len(dynamic) < len(static) + 400


@needs_reference
def test_compress_bytes_identical_to_reference(small_image):
    from tests.ref_shim import import_reference

    ref = import_reference()
    theirs = ref.compress(small_image, quality=50)
    ours = container.compress(small_image, 50)
    assert ours == theirs


@needs_reference
def test_decompress_matches_reference_decoder(small_image):
    from tests.ref_shim import import_reference

    ref = import_reference()
    data = container.compress(small_image, 50)
    assert np.array_equal(container.decompress(data), ref.decompress(data))


@needs_reference
@pytest.mark.parametrize("quality", [10, 25, 50, 75, 90])
def test_lenna_bytes_identical_to_reference(lenna, quality):
    """Full-image byte-identity at every benchmark quality."""
    from tests.ref_shim import import_reference

    ref = import_reference()
    crop = lenna[:128, :128]  # keep the pure-python reference fast
    assert container.compress(crop, quality) == ref.compress(
        crop, quality=quality
    )
