"""Pallas kernel tests (interpret mode on CPU; real runs happen on TPU)."""

import numpy as np
import pytest

from tests.conftest import synthetic_image
from tinyimgcodec_tpu.ops import entropy, transform
from tinyimgcodec_tpu.ops.pallas_encode import encode_pallas


def _reference_words(blocks, quality, nb):
    """XLA pipeline output for comparison (fast precision)."""
    zz = transform.encode_blocks(blocks, quality, transform.FAST)
    zz = np.asarray(zz).reshape(-1, nb, 64)
    import jax.numpy as jnp

    dc, ac = transform.dc_dpcm(jnp.asarray(zz))
    w0, w1, bits, overflow = entropy.block_symbols(dc, ac)
    words, block_bits = entropy.pack_blocks(w0, w1, bits)
    n = zz.shape[0] * nb
    return (
        np.asarray(words).reshape(n, -1),
        np.asarray(block_bits).reshape(n),
        bool(overflow),
    )


@pytest.mark.parametrize("quality", [50, 90])
def test_pallas_encode_matches_xla(quality):
    img = synthetic_image(64, 64, seed=61)  # 64 blocks = one tile
    blocks = np.asarray(
        transform.blockify(img.astype(np.int32))
    )
    words, bits, over = encode_pallas(
        blocks, quality, nb=64, bt=64, interpret=True
    )
    ref_words, ref_bits, ref_over = _reference_words(blocks, quality, 64)
    assert not bool(over) and not ref_over
    assert np.array_equal(np.asarray(bits), ref_bits)
    assert np.array_equal(np.asarray(words), ref_words)


def test_pallas_encode_multi_tile_carry():
    # DC predictor must carry across tiles: 2 images of 64 blocks, bt=32
    imgs = np.stack(
        [synthetic_image(64, 64, seed=s) for s in (62, 63)]
    )
    blocks = np.asarray(transform.blockify(imgs.astype(np.int32)))
    flat = blocks.reshape(-1, 8, 8)
    words, bits, over = encode_pallas(
        flat, 50, nb=64, bt=32, interpret=True
    )
    ref_words, ref_bits, _ = _reference_words(blocks, 50, 64)
    assert np.array_equal(np.asarray(bits), ref_bits)
    assert np.array_equal(np.asarray(words), ref_words)


def test_pallas_encode_image_boundary_reset():
    # second image's first block must diff against 0, not the previous
    # image's last DC (nb parameter)
    img_a = np.full((16, 16), 200, np.uint8)
    img_b = np.full((16, 16), 60, np.uint8)
    blocks = np.concatenate(
        [
            np.asarray(transform.blockify(img_a.astype(np.int32))),
            np.asarray(transform.blockify(img_b.astype(np.int32))),
        ]
    )
    words, bits, _ = encode_pallas(blocks, 50, nb=4, bt=8, interpret=True)
    stacked = blocks.reshape(2, 4, 8, 8)
    ref_words, ref_bits, _ = _reference_words(stacked, 50, 4)
    assert np.array_equal(np.asarray(bits), ref_bits)
    assert np.array_equal(np.asarray(words), ref_words)


def test_pallas_encode_extreme_runs():
    # impulses produce long zero runs (ZRL chains)
    rng = np.random.RandomState(7)
    img = np.full((64, 64), 128, np.uint8)
    ys, xs = rng.randint(0, 64, 30), rng.randint(0, 64, 30)
    img[ys, xs] = 255
    blocks = np.asarray(transform.blockify(img.astype(np.int32)))
    words, bits, over = encode_pallas(
        blocks, 90, nb=64, bt=64, interpret=True
    )
    ref_words, ref_bits, _ = _reference_words(blocks, 90, 64)
    assert np.array_equal(np.asarray(bits), ref_bits)
    assert np.array_equal(np.asarray(words), ref_words)


# ---------------------------------------------------------------------------
# Stitch kernel
# ---------------------------------------------------------------------------

def _stitch_reference(words, bits, nb):
    """Expected multi-image byte-aligned stream via the host stitcher."""
    from tinyimgcodec_tpu.bitstream import pack_ragged_words

    n = words.shape[0]
    chunks = []
    starts = []
    pos_bits = 0
    for i in range(0, n, nb):
        starts.append(pos_bits)
        payload = pack_ragged_words(words[i : i + nb], bits[i : i + nb])
        chunks.append(payload)
        pos_bits += len(payload) * 8
    return b"".join(chunks), starts


@pytest.mark.parametrize("bt", [32, 64])
def test_pallas_stitch_matches_host(bt):
    from tinyimgcodec_tpu.ops.pallas_stitch import stitch_pallas

    imgs = np.stack(
        [synthetic_image(64, 64, seed=s) for s in (71, 72)]
    )
    blocks = np.asarray(transform.blockify(imgs.astype(np.int32)))
    words, bits, _ = _reference_words(blocks, 50, 64)
    stream, starts, total, status = stitch_pallas(
        words, bits, nb=64, cap_words=words.shape[0] * 52, bt=bt,
        interpret=True,
    )
    assert int(status) == 0
    expect, expect_starts = _stitch_reference(words, bits, 64)
    assert list(np.asarray(starts)) == expect_starts
    got = np.asarray(stream).astype(">u4").tobytes()[: len(expect)]
    assert got == expect
    # total covers the last image's payload
    assert -(-int(total) // 8) == len(expect)


def test_pallas_stitch_overflow_detected():
    from tinyimgcodec_tpu.ops.pallas_stitch import stitch_pallas

    img = synthetic_image(64, 64, seed=73)
    blocks = np.asarray(transform.blockify(img.astype(np.int32)))
    words, bits, _ = _reference_words(blocks, 90, 64)
    assert int(bits.sum()) // 32 > 128  # stream genuinely exceeds cap
    _, _, _, status = stitch_pallas(
        words, bits, nb=64, cap_words=128, bt=64, interpret=True
    )
    assert int(status) & 2


def test_pallas_pipeline_end_to_end():
    from tinyimgcodec_tpu import container
    from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas

    imgs = np.stack(
        [synthetic_image(64, 64, seed=s) for s in (81, 82)]
    )
    out = compress_batch_pallas(imgs, 50, bt=64, interpret=True)
    assert len(out) == 2
    for i in range(2):
        ref = container.compress(imgs[i], 50)
        dec = container.decompress(out[i])
        ref_dec = container.decompress(ref)
        # fast-precision streams may differ from float64 streams in rare
        # rounding ties; decoded quality must be essentially identical
        assert np.abs(
            dec.astype(float) - ref_dec.astype(float)
        ).max() <= 2
        assert abs(len(out[i]) - len(ref)) < 64


def test_pallas_pipeline_exact_mode():
    from tinyimgcodec_tpu import container
    from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas

    imgs = np.stack([synthetic_image(64, 64, seed=s) for s in (83, 84)])
    out = compress_batch_pallas(
        imgs, 50, bt=64, interpret=True, precision="exact"
    )
    # the staged tie fixup makes exact mode byte-identical to the
    # float64 reference encoder
    for i in range(2):
        assert out[i] == container.compress(imgs[i], 50)


def test_pallas_pipeline_exact_tie_fixup():
    """Every block hits an exact rational DC tie (constant 129 => DC
    coefficient 8/16 = 0.5 at q=50): the flag+fixup path must fire and
    still produce byte-identical output."""
    from tinyimgcodec_tpu import container
    from tinyimgcodec_tpu.ops.pallas_exact import (
        exact_transform_pallas_cm,
    )
    from tinyimgcodec_tpu.ops import transform as tr
    from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas

    imgs = np.full((1, 32, 32), 129, np.uint8)
    blocks = np.asarray(tr.blockify(imgs)).reshape(-1, 64)
    _, flags = exact_transform_pallas_cm(
        blocks.astype(np.int32).T, 50, bt=16, interpret=True,
        with_flags=True,
    )
    assert np.asarray(flags).all(), "DC ties must be flagged"
    out = compress_batch_pallas(
        imgs, 50, bt=16, interpret=True, precision="exact"
    )
    assert out[0] == container.compress(imgs[0], 50)


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_pallas_exact_transform_matches_xla(quality):
    from tinyimgcodec_tpu.ops.pallas_exact import exact_transform_pallas

    img = synthetic_image(64, 64, seed=95)
    blocks = np.asarray(transform.blockify(img.astype(np.int32)))
    zz_pl = np.asarray(
        exact_transform_pallas(blocks, quality, bt=64, interpret=True)
    )
    zz_xla = np.asarray(
        transform.encode_blocks(blocks, quality, transform.EXACT)
    )
    assert np.array_equal(zz_pl, zz_xla)


# ---- v2 kernels: coefficient-major encode + placement assembler --------


def _v2_exact_packed(imgs, quality, bt, nb):
    """Run the exact v2 path (deterministic across layouts) to
    ((N, 56) pre-aligned word rows, (2, N) offset/bits meta)."""
    from tinyimgcodec_tpu.ops.pallas_encode2 import encode_pallas2
    from tinyimgcodec_tpu.ops.pallas_exact import (
        exact_transform_pallas_cm,
    )

    blocks = np.asarray(transform.blockify(imgs)).reshape(-1, 64)
    zz_cm = exact_transform_pallas_cm(
        blocks.astype(np.int32).T, quality, bt=bt, interpret=True
    )
    packed, meta, over = encode_pallas2(
        zz_cm, quality, nb=nb, bt=bt, interpret=True, from_zz=True
    )
    return blocks, np.asarray(packed), np.asarray(meta), bool(over)


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_pallas_encode2_offsets_and_bits(quality):
    """v2 bit counts equal v1's; offsets are their byte-aligned cumsum."""
    imgs = np.stack(
        [synthetic_image(64, 64, seed=s) for s in (81, 82)]
    )
    nb = 64
    blocks, packed, meta, over2 = _v2_exact_packed(imgs, quality, 32, nb)
    zz = np.asarray(
        transform.encode_blocks(
            blocks.reshape(-1, 8, 8), quality, transform.EXACT
        )
    )
    w1, b1, o1 = encode_pallas(
        zz, quality, nb=nb, bt=32, interpret=True, from_zz=True
    )
    bits2 = meta[1].astype(np.int64)
    assert np.array_equal(np.asarray(b1).astype(np.int64), bits2)
    # expected offsets: exclusive cumsum, byte-aligned per image
    off_exp = np.zeros(len(bits2), np.int64)
    pos = 0
    for i, bbits in enumerate(bits2):
        if i % nb == 0:
            pos = (pos + 7) & ~7
        off_exp[i] = pos
        pos += int(bbits)
    assert np.array_equal(meta[0].astype(np.int64), off_exp)
    assert bool(o1) == over2


@pytest.mark.parametrize("bt", [32, 64])
def test_pallas_place_matches_stitch(bt):
    from tinyimgcodec_tpu.ops.pallas_place import assemble_cm
    from tinyimgcodec_tpu.ops.pallas_stitch import stitch_pallas

    imgs = np.stack(
        [synthetic_image(64, 64, seed=s) for s in (83, 84)]
    )
    nb = 64
    blocks, packed, meta, _ = _v2_exact_packed(imgs, 50, bt, nb)
    # v1 reference stream from the same coefficients
    zz = np.asarray(
        transform.encode_blocks(
            blocks.reshape(-1, 8, 8), 50, transform.EXACT
        )
    )
    words, bits, _ = encode_pallas(
        zz, 50, nb=nb, bt=bt, interpret=True, from_zz=True
    )
    cap = packed.shape[0] * 52
    s1 = stitch_pallas(np.asarray(words), np.asarray(bits), nb=nb,
                       cap_words=cap, bt=bt, interpret=True)
    s2 = assemble_cm(packed, meta, nb=nb, cap_words=cap, bt=bt,
                     interpret=True)
    assert list(np.asarray(s1[1])) == list(np.asarray(s2[1]))  # starts
    assert int(s1[2]) == int(s2[2])  # total bits
    nw = -(-int(s1[2]) // 32)
    assert np.array_equal(np.asarray(s1[0])[:nw], np.asarray(s2[0])[:nw])


def test_pallas_pipeline_v2_matches_v1():
    from tinyimgcodec_tpu import container, metrics
    from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas

    imgs = np.stack(
        [synthetic_image(64, 64, seed=s) for s in (85, 86, 87, 88)]
    )
    # exact mode: double-float transforms are deterministic across
    # layouts, so v1 and v2 must agree byte for byte
    s1 = compress_batch_pallas(
        imgs, quality=50, bt=64, interpret=True,
        precision="exact", version="v1",
    )
    s2 = compress_batch_pallas(
        imgs, quality=50, bt=32, interpret=True,
        precision="exact", version="v2",
    )
    assert s1 == s2
    # fast mode: v2 computes the DCT as M^T @ x instead of x @ M, so
    # f32 accumulation order differs and isolated coefficients may round
    # differently; assert rate/distortion parity instead
    f1 = compress_batch_pallas(
        imgs, quality=50, bt=64, interpret=True,
        precision="fast", version="v1",
    )
    f2 = compress_batch_pallas(
        imgs, quality=50, bt=32, interpret=True,
        precision="fast", version="v2",
    )
    for img, a, b in zip(imgs, f1, f2):
        assert abs(len(a) - len(b)) <= 8
        pa = metrics.psnr(img, container.decompress(a))
        pb = metrics.psnr(img, container.decompress(b))
        assert abs(pa - pb) < 0.05


def test_pallas_place_wide_group_fallback():
    """Groups wider than the fast-path span exercise the per-block path."""
    from tinyimgcodec_tpu.ops.pallas_place import assemble_cm
    from tinyimgcodec_tpu.ops.pallas_stitch import stitch_pallas

    rng = np.random.RandomState(0)
    # white noise at q=90 maximizes per-block bits -> wide word spans
    img = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    nb = 64
    blocks, packed, meta, _ = _v2_exact_packed(img[None], 90, 32, nb)
    bits = meta[1].astype(np.int64)
    spans = (
        np.add.reduceat(bits, np.arange(0, len(bits), 8)) // 32
    )
    assert spans.max() > 47  # fallback path genuinely taken
    zz = np.asarray(
        transform.encode_blocks(
            blocks.reshape(-1, 8, 8), 90, transform.EXACT
        )
    )
    words, wbits, _ = encode_pallas(
        zz, 90, nb=nb, bt=32, interpret=True, from_zz=True
    )
    cap = packed.shape[0] * 52
    s1 = stitch_pallas(np.asarray(words), np.asarray(wbits), nb=nb,
                       cap_words=cap, bt=32, interpret=True)
    s2 = assemble_cm(packed, meta, nb=nb, cap_words=cap, bt=32,
                     interpret=True)
    nw = -(-int(s1[2]) // 32)
    assert np.array_equal(np.asarray(s1[0])[:nw], np.asarray(s2[0])[:nw])


def test_encode_pallas2_fused_blockify_matches():
    """Alternative input layouts (in-kernel blockify from raw image
    rows; u32 word-packed blocks, the hardware default) must emit
    byte-identical packed rows/meta to the block-major uint8 path."""
    from tinyimgcodec_tpu.ops.pallas_encode2 import encode_pallas2
    from tinyimgcodec_tpu.ops.transform import blockify_u32

    imgs = np.stack(
        [synthetic_image(64, 64, seed=80 + i) for i in range(2)]
    )
    blocks = np.asarray(transform.blockify(imgs)).reshape(128, 64)
    p1, m1, o1 = encode_pallas2(blocks, 50, nb=64, bt=64, interpret=True)
    p2, m2, o2 = encode_pallas2(
        imgs.reshape(-1, 64), 50, nb=64, bt=64, interpret=True, img_w=64
    )
    assert not bool(o1) and not bool(o2)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
    assert np.array_equal(np.asarray(m1), np.asarray(m2))

    u32 = np.asarray(blockify_u32(imgs))
    p3, m3, o3 = encode_pallas2(
        u32, 50, nb=64, bt=64, interpret=True, from_u32=True
    )
    assert not bool(o3)
    assert np.array_equal(np.asarray(p1), np.asarray(p3))
    assert np.array_equal(np.asarray(m1), np.asarray(m3))

    with pytest.raises(ValueError):
        # tile covers half a band: 4 * 64 = 256 bits % img_w=512 != 0
        encode_pallas2(imgs.reshape(-1, 32), 50, nb=64, bt=4,
                       interpret=True, img_w=512)
