"""Device op tests (CPU backend): transform + entropy vs the golden host
implementation, including bit-exactness of the df32 'exact' mode."""

import numpy as np
import pytest

from tests.conftest import synthetic_image
from tinyimgcodec_tpu import container, golden
from tinyimgcodec_tpu.bitstream import pack_ragged_words
from tinyimgcodec_tpu.constants import HEADER_BYTES, ZIGZAG_ORDER
from tinyimgcodec_tpu.ops import entropy, transform


def _blocks_of(img):
    padded = transform.pad_to_blocks(img)
    return np.asarray(transform.blockify(padded.astype(np.int32)))


def _golden_zz(img, quality):
    arrays = golden.encode_arrays(img, quality)
    dc = np.cumsum(arrays.dc)
    zz = np.empty((dc.shape[0], 64), np.int32)
    zz[:, 0] = dc
    zz[:, 1:] = arrays.ac
    return zz


def test_dct_basis_orthonormal():
    d = transform.dct_basis()
    assert np.allclose(d @ d.T, np.eye(8), atol=1e-15)


def test_blockify_matches_golden(small_image):
    blocks = _blocks_of(small_image)
    ref = golden.block_slice(golden.pad_image(small_image).astype(np.int32))
    assert np.array_equal(blocks, ref.reshape(-1, 8, 8))


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_encode_blocks_exact_matches_golden(quality):
    img = synthetic_image(64, 64, seed=11)
    zz, flags = transform.encode_blocks(
        _blocks_of(img), quality, transform.EXACT, with_flags=True
    )
    zz, flags = np.asarray(zz), np.asarray(flags)
    ref = _golden_zz(img, quality)
    # unflagged blocks must be bit-exact; flagged ones (rounding-boundary,
    # resolved by the engine's host fixup) must be rare
    assert np.array_equal(zz[~flags], ref[~flags])
    assert flags.mean() < 0.2


def test_encode_blocks_fast_close_to_golden():
    img = synthetic_image(64, 64, seed=12)
    zz = np.asarray(
        transform.encode_blocks(_blocks_of(img), 50, transform.FAST)
    )
    ref = _golden_zz(img, 50)
    # fast mode may flip rare rounding ties only
    assert np.abs(zz - ref).max() <= 1
    assert (zz != ref).mean() < 0.01


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_decode_blocks_exact_matches_golden(quality):
    img = synthetic_image(64, 64, seed=13)
    arrays = golden.encode_arrays(img, quality)
    ref = golden.decode_arrays(arrays)
    zz = _golden_zz(img, quality)
    blocks, flags = transform.decode_blocks(
        zz, quality, transform.EXACT, with_flags=True
    )
    flags = np.asarray(flags)
    out = np.asarray(transform.unblockify(np.asarray(blocks), 64, 64))
    ref_blocks = golden.block_slice(ref).reshape(-1, 8, 8)
    ours_blocks = np.asarray(blocks)
    assert np.array_equal(ours_blocks[~flags], ref_blocks[~flags])
    assert flags.mean() < 0.2


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_engine_decode_bit_exact(quality):
    img = synthetic_image(64, 64, seed=13)
    arrays = golden.encode_arrays(img, quality)
    ref = golden.decode_arrays(arrays)
    from tinyimgcodec_tpu.engine import Engine

    assert np.array_equal(Engine().decode_arrays(arrays), ref)


def test_dpcm_roundtrip():
    rng = np.random.RandomState(0)
    zz = rng.randint(-100, 100, size=(32, 64)).astype(np.int32)
    dc, ac = transform.dc_dpcm(zz)
    dc = np.asarray(dc)
    assert dc[0] == zz[0, 0]
    assert np.array_equal(np.cumsum(dc), zz[:, 0])
    back = np.asarray(transform.undo_dpcm(dc, ac))
    assert np.array_equal(back, zz)


# ---------------------------------------------------------------------------
# Entropy stage
# ---------------------------------------------------------------------------

def _device_payload(img, quality):
    blocks = _blocks_of(img)
    zz = transform.encode_blocks(blocks, quality, transform.EXACT)
    dc, ac = transform.dc_dpcm(zz)
    w0, w1, bits, overflow = entropy.block_symbols(dc, ac)
    assert not bool(overflow)
    words, block_bits = entropy.pack_blocks(w0, w1, bits)
    return np.asarray(words), np.asarray(block_bits)


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_device_entropy_bytes_match_host(quality):
    img = synthetic_image(64, 80, seed=21)
    words, block_bits = _device_payload(img, quality)
    payload = pack_ragged_words(words, block_bits)
    expected = container.compress(img, quality)[HEADER_BYTES:]
    assert payload == expected


def test_device_entropy_all_zero_blocks():
    img = np.full((16, 16), 128, np.uint8)  # quantizes to all-zero
    words, block_bits = _device_payload(img, 50)
    # DC cat0 ("00") + EOB ("1010") = 6 bits per block
    assert np.all(block_bits == 6)
    payload = pack_ragged_words(words, block_bits)
    assert payload == container.compress(img, 50)[HEADER_BYTES:]


def test_device_entropy_extreme_values():
    # craft blocks hitting ZRL chains and large magnitudes via an image
    # with sharp impulses
    rng = np.random.RandomState(3)
    img = np.full((64, 64), 128, np.uint8)
    ys, xs = rng.randint(0, 64, 40), rng.randint(0, 64, 40)
    img[ys, xs] = 255
    words, block_bits = _device_payload(img, 90)
    payload = pack_ragged_words(words, block_bits)
    assert payload == container.compress(img, 90)[HEADER_BYTES:]


def test_stitch_words_matches_host_stitch():
    img = synthetic_image(64, 80, seed=22)
    words, block_bits = _device_payload(img, 50)
    total = int(block_bits.sum())
    cap = (total + 31) // 32 + 8
    stream, total_dev = entropy.stitch_words(
        words, block_bits.astype(np.int32), cap
    )
    assert int(total_dev) == total
    got = np.asarray(stream)
    expect_bytes = pack_ragged_words(words, block_bits)
    expect = np.zeros(cap * 4, np.uint8)
    expect[: len(expect_bytes)] = np.frombuffer(expect_bytes, np.uint8)
    assert np.array_equal(got.astype(">u4").view(np.uint8), expect)


def test_engine_end_to_end(small_image):
    from tinyimgcodec_tpu.engine import Engine

    eng = Engine()
    data = eng.compress(small_image, 50)
    # public entries default block_index=True (round-4 verdict #2)
    assert data == container.compress(small_image, 50, block_index=True)
    out = eng.decompress(data)
    assert np.array_equal(out, container.decompress(data))


def test_engine_via_public_api(small_image):
    import tinyimgcodec_tpu as tic

    data = tic.compress(small_image, 50, backend="jax")
    assert data == container.compress(small_image, 50, block_index=True)
    assert np.array_equal(
        tic.decompress(data, backend="jax"), container.decompress(data)
    )


def test_engine_decompress_batch(small_image):
    from tests.conftest import synthetic_image
    from tinyimgcodec_tpu.engine import Engine

    imgs = [synthetic_image(64, 80, seed=s) for s in (91, 92, 93)]
    streams = [container.compress(im, 50) for im in imgs]
    eng = Engine()
    out = eng.decompress_batch(streams)
    assert out.shape == (3, 64, 80)
    for i in range(3):
        assert np.array_equal(out[i], container.decompress(streams[i]))
