"""Aux subsystem tests: config, metrics, corpus, profiling, jobs, CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import synthetic_image
from tinyimgcodec_tpu import container, corpus, metrics
from tinyimgcodec_tpu.config import CodecConfig, QFACTOR_NAMES
from tinyimgcodec_tpu.jobs import CorpusEncodeJob
from tinyimgcodec_tpu.profiling import StageTimer, run_record


def test_config_validation():
    CodecConfig(quality=1)
    CodecConfig(quality=99)
    with pytest.raises(ValueError):
        CodecConfig(quality=100)
    with pytest.raises(ValueError):
        CodecConfig(quality=0)
    with pytest.raises(ValueError):
        CodecConfig(precision="f64")
    assert QFACTOR_NAMES["med"] == 2


def test_psnr_reference_wraps_uint8():
    # SURVEY quirk 2.5-5: the reference formula wraps differences mod 256
    a = np.zeros((4, 4), np.uint8)
    b = np.full((4, 4), 46, np.uint8)  # (0-46) wraps to 210
    wrapped = metrics.psnr_reference(a, b)
    true = metrics.psnr(a, b)
    assert wrapped != pytest.approx(true)
    # both the subtraction AND the squaring wrap mod 256 in the reference
    mse_wrapped = float(((0 - 46) % 256) ** 2 % 256)
    assert wrapped == pytest.approx(20 * np.log10(255 / np.sqrt(mse_wrapped)))


def test_psnr_identical_is_inf():
    a = synthetic_image(16, 16)
    assert metrics.psnr(a, a) == float("inf")
    assert metrics.psnr_reference(a, a) == float("inf")


def test_corpus_loading():
    imgs = corpus.load_corpus(limit=3)
    assert imgs.shape == (3, 512, 512)
    assert imgs.dtype == np.uint8
    lenna = corpus.load_named("Lenna")
    assert lenna.shape == (512, 512)


def test_synthetic_corpus_deterministic():
    a = corpus.synthetic_corpus(2, 64)
    b = corpus.synthetic_corpus(2, 64)
    assert np.array_equal(a, b)


def test_stage_timer():
    t = StageTimer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    json.loads(t.json())


def test_run_record():
    r = run_record("test", 1.0, 0.5, {"x": 1})
    assert r["mp_per_s"] == 2.0
    assert r["x"] == 1


def test_corpus_job_resume(tmp_path):
    imgs = {
        "a": synthetic_image(16, 16, seed=1),
        "b": synthetic_image(16, 16, seed=2),
    }
    out = str(tmp_path / "job")
    job = CorpusEncodeJob(out, quality=50, backend="host")
    paths = job.run(imgs)
    assert sorted(paths) == ["a", "b"]
    for p in paths.values():
        with open(p, "rb") as f:
            assert container.decompress(f.read()).shape == (16, 16)
    # resume: nothing pending
    job2 = CorpusEncodeJob(out, quality=50, backend="host")
    assert job2.pending(["a", "b"]) == []
    # new item only
    imgs["c"] = synthetic_image(16, 16, seed=3)
    assert job2.pending(["a", "b", "c"]) == ["c"]


def test_encode_cli_roundtrip(tmp_path):
    from PIL import Image

    img = synthetic_image(32, 32, seed=4)
    src = str(tmp_path / "in.png")
    dst = str(tmp_path / "out.img")
    Image.fromarray(img).save(src)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "tinyimgcodec_tpu.cli.encode", src, dst,
         "-q", "50", "--backend", "host"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr
    assert "compression" in r.stdout
    with open(dst, "rb") as f:
        out = container.decompress(f.read())
    assert out.shape == (32, 32)


def test_view_cli_save(tmp_path):
    img = synthetic_image(24, 24, seed=5)
    data = container.compress(img, 50)
    src = str(tmp_path / "x.img")
    with open(src, "wb") as f:
        f.write(data)
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    r = subprocess.run(
        [sys.executable, "-m", "tinyimgcodec_tpu.cli.view", src,
         "--save", str(tmp_path / "png"), "--backend", "host"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr
    assert os.path.exists(tmp_path / "png" / "x.png")


def test_benchmark_harness_small(tmp_path):
    from tinyimgcodec_tpu.cli import benchmark as bm

    csv_path = str(tmp_path / "r.csv")
    rows = bm.run_corpus("host", csv_path, limit=1)
    assert os.path.exists(csv_path)
    assert len(rows) == len(bm.QUALITIES)
    assert all(r["ratio"] > 1 for r in rows)


def test_corpus_job_batched_matches_api(tmp_path):
    """VERDICT item 8: the job encodes via the batch pipeline; output bytes
    must equal the per-image exact API path, with per-image resume."""
    from tinyimgcodec_tpu import api

    imgs = {
        f"im{i}": synthetic_image(24, 24, seed=i) for i in range(5)
    }
    imgs["odd"] = synthetic_image(16, 40, seed=9)  # shape change mid-run
    out = str(tmp_path / "job")
    job = CorpusEncodeJob(out, quality=50, backend="auto", batch_size=3)
    seen = []
    paths = job.run(imgs, progress=lambda i, n, name: seen.append(name))
    assert len(seen) == 6
    for name, img in imgs.items():
        with open(paths[name], "rb") as f:
            data = f.read()
        assert data == api.compress(img, quality=50)
    # resume: nothing pending, partial manifest resumes correctly
    job2 = CorpusEncodeJob(out, quality=50, backend="auto", batch_size=3)
    assert job2.pending(sorted(imgs)) == []
