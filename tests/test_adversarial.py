"""Adversarial-content encode conformance tests (round-3 verdict #1/#2).

Property-style sweeps that drive the public encode paths with content the
natural-image e2e tests never produce (noise, checkerboards, saturated
edges) and with stream sizes stepping across the capacity buffer's
128-word row boundary.  This is the test class that catches the round-3
defect: the placement kernels' defensive output-row clamp silently
relocated any block landing in the LAST capacity row while the overflow
flag only fired at 100% of capacity (ops/pallas_place.py), so a 64x64
noise image at the default 4 bpp budget decoded with max pixel error 255
and no exception.  The reference encoder can never corrupt output -- its
BitBuffer grows without bound (reference codec.py:133-164,
bitbuffer.py:20-27) -- so byte-identity at *default* settings must hold
for every input, not just natural images.
"""

import numpy as np
import pytest

from tinyimgcodec_tpu import container
from tinyimgcodec_tpu.ops import transform


def _noise(h, w, seed=7):
    return np.random.RandomState(seed).randint(
        0, 256, (h, w)
    ).astype(np.uint8)


def _contents(h, w):
    """Adversarial content battery: name -> (h, w) uint8 image."""
    y, x = np.mgrid[0:h, 0:w]
    return {
        "noise": _noise(h, w),
        "checker1": ((x + y) % 2 * 255).astype(np.uint8),
        "checker4": (((x // 4 + y // 4) % 2) * 255).astype(np.uint8),
        "hgrad": (x * 255 // max(w - 1, 1)).astype(np.uint8),
        "vgrad": (y * 255 // max(h - 1, 1)).astype(np.uint8),
        "flat0": np.zeros((h, w), np.uint8),
        "flat255": np.full((h, w), 255, np.uint8),
        "stripes": ((x % 2) * 255).astype(np.uint8),
    }


def _payload_bits(stream: bytes) -> int:
    return (len(stream) - container.HEADER_BYTES) * 8


def test_verdict_repro_near_capacity_exact():
    """The round-3 verdict repro, pinned: 64x64 RandomState(7) noise,
    q=50, exact precision, DEFAULT budget -> byte-identical."""
    from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas

    img = _noise(64, 64, seed=7)
    ref = container.compress(img, quality=50)
    out = compress_batch_pallas(
        img[None], quality=50, precision="exact", interpret=True
    )[0]
    assert out == ref
    assert np.array_equal(
        container.decompress(out), container.decompress(ref)
    )


def _budget_for_words(cap_words: int, pixels: int) -> float:
    """bits_per_pixel_budget that yields exactly cap_words capacity."""
    return cap_words * 32 / pixels


def test_capacity_boundary_sweep_exact_v2():
    """Exact-mode bytes must be budget-independent: sweep the capacity
    across the exact stream size and both adjacent 128-word row edges
    (the old silent-corruption window was the last row of the buffer)."""
    from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas

    img = _noise(64, 64, seed=7)
    ref = container.compress(img, quality=50)
    need = -(-_payload_bits(ref) // 32)  # exact word count
    row_up = -(-need // 128) * 128
    pixels = img.size
    for cap in sorted({need - 64, need - 1, need,
                       row_up - 1, row_up + 128}):
        out = compress_batch_pallas(
            img[None], quality=50, precision="exact", interpret=True,
            bits_per_pixel_budget=_budget_for_words(cap, pixels),
        )[0]
        assert out == ref, f"cap_words={cap} (need={need})"


@pytest.mark.parametrize("version", ["v2", "v1"])
def test_capacity_boundary_sweep_fast(version):
    """Fast-mode bytes must also be budget-independent (pinned against a
    worst-case-budget run of the same path) and always decodable."""
    from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas

    img = _noise(64, 64, seed=11)
    golden = compress_batch_pallas(
        img[None], quality=50, precision="fast", version=version,
        interpret=True, bits_per_pixel_budget=16.0,
    )[0]
    need = -(-_payload_bits(golden) // 32)
    row_up = -(-need // 128) * 128
    for cap in sorted({need - 1, need, row_up}):
        out = compress_batch_pallas(
            img[None], quality=50, precision="fast", version=version,
            interpret=True,
            bits_per_pixel_budget=_budget_for_words(cap, img.size),
        )[0]
        assert out == golden, f"cap_words={cap} (need={need})"
    dec = container.decompress(golden)
    assert dec.shape == img.shape


def test_capacity_boundary_assemble_cm_direct():
    """Kernel-level sweep on v2 AND v3 placement: every cap that admits
    the stream places it bit-perfectly; every cap that does not must
    raise the overflow flag (no silent window)."""
    from tinyimgcodec_tpu.ops.pallas_encode2 import encode_pallas2
    from tinyimgcodec_tpu.ops.pallas_place import assemble_cm

    img = _noise(64, 64, seed=3)
    nb = 64
    blocks = transform.blockify(img[None]).reshape(nb, 64)
    zz = np.asarray(
        transform.encode_blocks(
            blocks.reshape(-1, 8, 8), 50, transform.EXACT
        )
    ).reshape(nb, 64)
    packed, meta, _ = encode_pallas2(
        zz.T, 50, nb=nb, bt=16, interpret=True, from_zz=True
    )
    total_bits = int(meta[0, -1]) + int(meta[1, -1])
    need = -(-total_bits // 32)
    # golden words from a roomy run
    g_stream, _, g_total, g_over = assemble_cm(
        packed, meta, nb=nb, cap_words=need + 512, bt=16, interpret=True
    )
    assert not bool(g_over)
    golden = np.asarray(g_stream)[:need]
    row_up = -(-need // 128) * 128
    # bt=16 exercises the v3 (GROUP3=16) kernel; bt=8 the v2 chain
    caps_by_bt = {
        16: {need - 129, need - 1, need, need + 1, need + 63,
             row_up - 1, row_up, row_up + 128},
        8: {need - 1, need, row_up - 1, row_up},
    }
    for bt in (16, 8):
        for cap in sorted(caps_by_bt[bt]):
            if cap <= 0:
                continue
            stream, _, total, over = assemble_cm(
                packed, meta, nb=nb, cap_words=cap, bt=bt,
                interpret=True,
            )
            assert int(total) == total_bits
            if cap >= need:
                assert not bool(over), f"bt={bt} cap={cap} need={need}"
                assert np.array_equal(
                    np.asarray(stream)[:need], golden
                ), f"bt={bt} cap={cap} need={need}"
            else:
                assert bool(over), (
                    f"silent overflow: bt={bt} cap={cap} need={need}"
                )


def test_capacity_boundary_stitch_v1_direct():
    """Same no-silent-window property for the v1 sequential BitWriter:
    the in-kernel flag alone missed streams exceeding capacity by < one
    64-word chunk (the final tail flush clamps onto the last chunk)."""
    from tinyimgcodec_tpu.ops.pallas_encode import encode_pallas
    from tinyimgcodec_tpu.ops.pallas_stitch import stitch_pallas

    img = _noise(64, 64, seed=3)
    nb = 64
    blocks = transform.blockify(img[None]).reshape(nb, 64)
    zz = np.asarray(
        transform.encode_blocks(
            blocks.reshape(-1, 8, 8), 50, transform.EXACT
        )
    )
    words, bits, _ = encode_pallas(
        zz, 50, nb=nb, bt=32, interpret=True, from_zz=True
    )
    words, bits = np.asarray(words), np.asarray(bits)
    g_stream, _, g_total, g_status = stitch_pallas(
        words, bits, nb=nb, cap_words=4096, bt=32, interpret=True
    )
    assert not (int(g_status) & 2)
    total_bits = int(g_total)
    need = -(-total_bits // 32)
    golden = np.asarray(g_stream)[:need]
    for cap in sorted({need - 65, need - 64, need - 1, need, need + 1,
                       need + 63, need + 64, need + 65}):
        stream, _, total, status = stitch_pallas(
            words, bits, nb=nb, cap_words=cap, bt=32, interpret=True
        )
        assert int(total) == total_bits
        if cap >= need:
            assert not (int(status) & 2), f"cap={cap} need={need}"
            assert np.array_equal(np.asarray(stream)[:need], golden)
        else:
            assert int(status) & 2, (
                f"silent overflow: cap={cap} need={need}"
            )


def test_capacity_boundary_sharded_exact():
    """Sharded pallas path (8 virtual devices): the per-shard capacity
    floor put tiny shards in the old wide-window regime; sweep budgets
    across the per-shard boundary, exact bytes must never change."""
    from tinyimgcodec_tpu.parallel.batch import (
        compress_batch_pallas_sharded,
    )

    imgs = np.stack([_noise(64, 64, seed=100 + i) for i in range(8)])
    refs = [container.compress(im, quality=50) for im in imgs]
    # per-shard (1 image) word need; pick budgets around the max shard
    needs = [-(-_payload_bits(r) // 32) for r in refs]
    w_hi = max(needs)
    for cap in sorted({w_hi - 1, w_hi, -(-w_hi // 128) * 128}):
        out = compress_batch_pallas_sharded(
            imgs, quality=50, precision="exact", interpret=True,
            bits_per_pixel_budget=cap * 32 / (64 * 64),
        )
        assert out == refs, f"cap_words_local={cap} (needs={needs})"


def test_compiled_small_batch_raises_not_tileable():
    """Multi-image batches whose tile is neither a 128-multiple nor the
    whole block count cannot lower on real TPUs (Mosaic's 128-lane
    block rule -- interpret mode never checks it; found by the round-4
    hardware adversarial sweep).  The compiled path must raise the
    "not tileable" marker the API fallback keys on BEFORE building any
    kernel; single images (tile == whole count) stay eligible."""
    from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas

    imgs = np.stack([_noise(64, 64, seed=s) for s in range(7)])
    with pytest.raises(ValueError, match="not tileable"):
        compress_batch_pallas(
            imgs, quality=50, precision="exact", interpret=False
        )
    # the public API falls back to the XLA batch and stays byte-exact
    from tinyimgcodec_tpu import api

    out = api.compress_batch(imgs, quality=50, precision="exact")
    refs = [
        container.compress(im, quality=50, block_index=True)
        for im in imgs
    ]
    assert out == refs


def test_stream_path_near_capacity_exact():
    """compress_stream at DEFAULT settings on high-entropy input."""
    from tinyimgcodec_tpu.parallel.stream import compress_stream

    imgs = [_noise(64, 64, seed=s) for s in (7, 8, 9)]
    refs = [
        container.compress(im, quality=50, block_index=True)
        for im in imgs
    ]
    out = list(
        compress_stream(imgs, quality=50, precision="exact", chunk=2,
                        interpret=True)
    )
    assert out == refs


@pytest.mark.parametrize("quality", [1, 10, 50, 90, 95, 99])
def test_adversarial_content_exact_byte_identity(quality):
    """Content battery x quality: the flagship exact path at default
    settings is byte-identical to the float64 host oracle for EVERY
    input, including ones the natural corpus never produces.  Where the
    oracle itself refuses (q=99 extreme content overflows the standard
    table's AC size range -- the reference dies with a bare KeyError
    there, codec.py:153-162), the pallas path must raise the same
    documented error, never emit bytes."""
    from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas

    imgs = np.stack(list(_contents(64, 64).values()))
    try:
        refs = [container.compress(im, quality=quality) for im in imgs]
    except ValueError:
        with pytest.raises(ValueError, match="Huffman table range"):
            compress_batch_pallas(
                imgs, quality=quality, precision="exact", interpret=True
            )
        return
    out = compress_batch_pallas(
        imgs, quality=quality, precision="exact", interpret=True
    )
    assert out == refs
    for im, s in zip(imgs, out):
        dec = container.decompress(s)
        assert dec.shape == im.shape


@pytest.mark.parametrize("quality", [1, 50, 99])
def test_adversarial_content_fast_decodable(quality):
    """Fast mode on the same battery: always decodable, dimensions
    preserved, and rate/distortion sane vs the oracle."""
    from tinyimgcodec_tpu import metrics
    from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas

    contents = _contents(64, 64)
    imgs = np.stack(list(contents.values()))
    try:
        refs = [container.compress(im, quality=quality) for im in imgs]
    except ValueError:
        with pytest.raises(ValueError, match="Huffman table range"):
            compress_batch_pallas(
                imgs, quality=quality, precision="fast", interpret=True
            )
        return
    out = compress_batch_pallas(
        imgs, quality=quality, precision="fast", interpret=True
    )
    for name, im, s, r in zip(contents, imgs, out, refs):
        dec = container.decompress(s)
        assert dec.shape == im.shape, name
        p_fast = metrics.psnr(im, dec)
        p_ref = metrics.psnr(im, container.decompress(r))
        # flat content decodes losslessly on both paths (PSNR inf)
        assert p_fast >= p_ref - 0.6, (name, quality, p_fast, p_ref)
        assert abs(len(s) - len(r)) <= max(16, len(r) // 50), name
