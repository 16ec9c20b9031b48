"""Corpus-level conformance: rate/distortion parity with the reference's
published benchmark values (BASELINE.md)."""

import numpy as np
import pytest

from tests.conftest import needs_reference
from tinyimgcodec_tpu import container, corpus, metrics

pytestmark = pytest.mark.skipif(
    not corpus.corpus_available(), reason="reference corpus not mounted"
)


@pytest.fixture(scope="module")
def lenna_img():
    return corpus.load_named("Lenna")


def test_lenna_q50_headline_numbers(lenna_img):
    """The reference's published Lenna q=50 figures: CR 12.62:1,
    PSNR 35.8 dB wrapped / 35.41 dB true (BASELINE.md)."""
    data = container.compress(lenna_img, 50)
    assert metrics.compression_ratio(lenna_img, data) == pytest.approx(
        12.62, abs=0.01
    )
    out = container.decompress(data)
    assert metrics.psnr(lenna_img, out) == pytest.approx(35.41, abs=0.01)
    assert metrics.psnr_reference(lenna_img, out) == pytest.approx(
        35.8, abs=0.1
    )


def test_lenna_quality_sweep_rate_distortion(lenna_img):
    """BASELINE.md measured sweep: CR 34.1/19.7/12.6/7.9/4.4 and true
    PSNR 30.3/33.4/35.4/37.3/40.1 dB at q=10/25/50/75/90."""
    expect = {
        10: (34.1, 30.3),
        25: (19.7, 33.4),
        50: (12.6, 35.4),
        75: (7.9, 37.3),
        90: (4.4, 40.1),
    }
    for q, (cr, psnr) in expect.items():
        data = container.compress(lenna_img, q)
        out = container.decompress(data)
        assert metrics.compression_ratio(lenna_img, data) == pytest.approx(
            cr, abs=0.1
        ), f"q={q} CR"
        assert metrics.psnr(lenna_img, out) == pytest.approx(
            psnr, abs=0.1
        ), f"q={q} PSNR"


def test_corpus_subset_mean_stats():
    """First 8 corpus images at q=50: sane CR and PSNR (full-corpus means
    are CR 9.12 / 31.97 dB per BASELINE.md)."""
    imgs = corpus.load_corpus(limit=8)
    crs, psnrs = [], []
    for img in imgs:
        data = container.compress(img, 50)
        out = container.decompress(data)
        crs.append(metrics.compression_ratio(img, data))
        psnrs.append(metrics.psnr(img, out))
    assert 4 < np.mean(crs) < 20
    assert 25 < np.mean(psnrs) < 40


@needs_reference
def test_corpus_streams_decode_with_reference(lenna_img):
    """Whole-image byte-identity plus cross-decoder pixel identity."""
    from tests.ref_shim import import_reference

    ref = import_reference()
    data = container.compress(lenna_img, 50)
    theirs = ref.compress(np.asarray(lenna_img), quality=50)
    assert data == theirs
    assert np.array_equal(
        container.decompress(data), ref.decompress(data)
    )


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_engine_byte_identity_corpus_subset(quality):
    """The device (exact) encoder is byte-identical to the float64 host
    encoder -- and therefore to the reference -- across corpus images."""
    from tinyimgcodec_tpu.engine import Engine

    eng = Engine()
    for img in corpus.load_corpus(limit=4):
        assert eng.compress(img, quality) == container.compress(
            img, quality, block_index=True
        )


def test_engine_decode_byte_identity_corpus_subset():
    """Device (exact) decode is pixel-identical to the float64 reference
    decoder across corpus images and qualities."""
    from tinyimgcodec_tpu.engine import Engine

    eng = Engine()
    for img in corpus.load_corpus(limit=3):
        for q in (10, 50, 90):
            data = container.compress(img, q)
            assert np.array_equal(
                eng.decompress(data), container.decompress(data)
            )
