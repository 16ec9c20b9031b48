"""Crop-contract + public-API routing regressions (VERDICT r2 #1/#2).

The reference records TRUE image dims in the header and crops on decode
(reference codec.py:69, utils.py:56-61).  Every public entry point --
including the flagship pallas batch/stream paths -- must honor that
contract, and the one-call ``compress()`` API must route through the
same fused kernels as the batch path.
"""

import numpy as np
import pytest

from tests.conftest import synthetic_image
from tinyimgcodec_tpu import api, container
from tinyimgcodec_tpu.engine import Engine
from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas


@pytest.mark.parametrize("precision", ["fast", "exact"])
def test_pallas_batch_odd_shape_records_true_dims(precision):
    imgs = np.stack(
        [synthetic_image(60, 52, seed=s) for s in (11, 12)]
    )
    out = compress_batch_pallas(
        imgs, quality=50, interpret=True, precision=precision
    )
    for data, img in zip(out, imgs):
        h, w, q, _ = container.parse_header(data)
        assert (h, w) == (60, 52)
        dec = container.decompress(data)
        assert dec.shape == (60, 52)
        assert abs(float(dec.mean()) - float(img.mean())) < 8.0
    if precision == "exact":
        # byte-identical to the host/golden container path per image
        for data, img in zip(out, imgs):
            assert data == container.compress(img, 50)


def test_compress_stream_odd_shape_records_true_dims():
    from tinyimgcodec_tpu.parallel.stream import compress_stream

    imgs = [synthetic_image(60, 52, seed=s) for s in range(3)]
    out = list(
        compress_stream(iter(imgs), quality=50, chunk=2, interpret=True)
    )
    assert len(out) == 3
    for data in out:
        h, w, _, _ = container.parse_header(data)
        assert (h, w) == (60, 52)
        assert container.decompress(data).shape == (60, 52)


def test_compress_stream_exact_matches_container():
    from tinyimgcodec_tpu.parallel.stream import compress_stream

    imgs = [synthetic_image(60, 52, seed=s) for s in range(2)]
    out = list(
        compress_stream(
            iter(imgs), quality=50, chunk=2, interpret=True,
            precision="exact",
        )
    )
    for data, img in zip(out, imgs):
        # stream output now carries the TICX trailer by default
        assert data == container.compress(img, 50, block_index=True)


def _pallas_engine(precision):
    return Engine(precision, use_pallas=True, pallas_interpret=True)


@pytest.mark.parametrize("shape", [(64, 80), (60, 52)])
def test_engine_pallas_routing_exact_bytes(shape):
    img = synthetic_image(*shape, seed=21)
    eng = _pallas_engine("exact")
    assert eng._pallas_compatible(img)
    assert eng.compress(img, 50) == container.compress(
        img, 50, block_index=True
    )


def test_engine_pallas_fallback_untileable_shape():
    # 72x72 -> 81 blocks, not a multiple of 8: must fall back to the
    # XLA path and still produce reference-identical bytes
    img = synthetic_image(72, 72, seed=22)
    eng = _pallas_engine("exact")
    assert not eng._pallas_compatible(img)
    assert eng.compress(img, 50) == container.compress(
        img, 50, block_index=True
    )


@pytest.mark.parametrize("precision", ["fast", "exact"])
def test_engine_pallas_block_index(precision):
    img = synthetic_image(64, 80, seed=23)
    eng = _pallas_engine(precision)
    data = eng.compress(img, 50, block_index=True)
    plain = eng.compress(img, 50, block_index=False)
    nb = (64 // 8) * (80 // 8)
    idx = container.parse_block_index(data, nb)
    assert idx is not None
    assert data[: len(plain)] == plain  # index is a pure trailer
    assert np.array_equal(
        container.decompress(data), container.decompress(plain)
    )
    if precision == "exact":
        assert plain == container.compress(img, 50)


def test_pallas_batch_exact_block_index_offsets():
    # exact-precision pallas path now emits the TICX trailer too
    # (VERDICT r2 #4); offsets must equal the host container's
    img = synthetic_image(64, 64, seed=24)
    out = compress_batch_pallas(
        img[None], quality=50, interpret=True, precision="exact",
        block_index=True,
    )[0]
    ref = container.compress(img, 50, block_index=True)
    assert out == ref


def test_api_compress_batch_matches_container():
    imgs = np.stack([synthetic_image(64, 64, seed=s) for s in (31, 32)])
    out = api.compress_batch(imgs, quality=50, precision="exact")
    for data, img in zip(out, imgs):
        assert data == container.compress(img, 50, block_index=True)


def test_api_decompress_batch_roundtrip():
    imgs = np.stack([synthetic_image(60, 52, seed=s) for s in (41, 42)])
    streams = api.compress_batch(imgs, quality=50, precision="exact")
    out = api.decompress_batch(streams)
    ref = np.stack([container.decompress(s) for s in streams])
    assert out.shape == (2, 60, 52)
    assert np.array_equal(out, ref)
    host = api.decompress_batch(streams, backend="host")
    assert np.array_equal(host, ref)


def test_api_compress_batch_host_backend():
    imgs = np.stack([synthetic_image(24, 24, seed=s) for s in (33, 34)])
    out = api.compress_batch(imgs, quality=50, backend="host")
    for data, img in zip(out, imgs):
        assert data == container.compress(img, 50, block_index=True)


def test_decompress_stream_roundtrip_mixed_shapes():
    """decompress_stream: the decode dual of compress_stream -- chunks
    group by (shape, quality, flags), shape changes flush, output order
    matches input order, bytes decode to the oracle's pixels."""
    import numpy as np

    from tinyimgcodec_tpu import container
    from tinyimgcodec_tpu.parallel.stream import decompress_stream
    from conftest import synthetic_image

    imgs = [
        synthetic_image(64, 64, seed=1),
        synthetic_image(64, 64, seed=2),
        synthetic_image(48, 40, seed=3),   # shape change flushes
        synthetic_image(64, 64, seed=4),
        synthetic_image(64, 64, seed=5),
        synthetic_image(64, 64, seed=6),
    ]
    streams = [container.compress(im, quality=50) for im in imgs]
    streams[4] = container.compress(imgs[4], quality=75)  # quality flush
    out = list(decompress_stream(streams, chunk=2))
    assert len(out) == len(imgs)
    for s, dec in zip(streams, out):
        assert np.array_equal(dec, container.decompress(s))
