#!/usr/bin/env python3
"""Hardware parity artifact: quality sweep on the real chip.

Runs the unified byte-identical exact path (pallas double-float
transform + float64 host fixup, tinyimgcodec_tpu/pallas_pipeline.py)
on one real TPU chip and checks the emitted bytes against the float64
host oracle (container.compress, itself byte-compatible with the
reference encoder, /root/reference/tinyimgcodec/codec.py:133-164).

Writes reports/hw_quality_sweep.json.  The north star (BASELINE.json)
requires bit-identical reconstructions on TPU; this artifact is the
proof for the Lenna sweep (q in {10,25,50,75,90}) plus corpus stats.

Usage: python scripts/hw_quality_sweep.py [--skip-corpus]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tinyimgcodec_tpu import container, corpus, metrics
from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas


def main() -> None:
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    lenna = corpus.load_named("Lenna")
    rows = []
    all_identical = True
    for q in (10, 25, 50, 75, 90):
        # first call carries the (possibly cold) Mosaic/XLA compile;
        # report it separately from the steady-state run (VERDICT r2 #8)
        t0 = time.perf_counter()
        out = compress_batch_pallas(
            lenna[None, ...], quality=q, precision="exact"
        )[0]
        compile_plus_run_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = compress_batch_pallas(
            lenna[None, ...], quality=q, precision="exact"
        )[0]
        run_s = time.perf_counter() - t0
        ref = container.compress(lenna, quality=q)
        identical = out == ref
        all_identical &= identical
        dec = container.decompress(out)
        rows.append(
            {
                "image": "lenna",
                "q": q,
                "bytes": len(out),
                "cr": round(lenna.size / len(out), 2),
                "psnr": round(metrics.psnr(dec, lenna), 2),
                "psnr_ref_formula": round(
                    metrics.psnr_reference(dec, lenna), 2
                ),
                "byte_identical_to_host_oracle": bool(identical),
                "compile_plus_run_s": round(compile_plus_run_s, 3),
                "run_s": round(run_s, 3),
            }
        )
        print(rows[-1], file=sys.stderr)

    report: dict = {"rows": rows}

    if "--skip-corpus" not in sys.argv:
        images = corpus.load_corpus()
        outs = compress_batch_pallas(images, quality=50, precision="exact")
        ident = 0
        crs, psnrs = [], []
        for img, out in zip(images, outs):
            ref = container.compress(img, quality=50)
            ident += out == ref
            crs.append(img.size / len(out))
            psnrs.append(metrics.psnr(container.decompress(out), img))
        report["corpus"] = {
            "images": int(images.shape[0]),
            "byte_identical": int(ident),
            "corpus_q50_mean_cr": round(float(np.mean(crs)), 2),
            "corpus_q50_mean_psnr": round(float(np.mean(psnrs)), 2),
            "baseline_mean_cr": 9.12,
            "baseline_mean_psnr": 31.97,
        }
        all_identical &= ident == images.shape[0]
        print(report["corpus"], file=sys.stderr)

    report["note"] = (
        "Unified exact path (pallas double-float transform + float64 host "
        "tie fixup) on one real v5e chip; bytes checked against the host "
        "float64 oracle (container.compress), which is byte-compatible "
        "with the reference encoder."
    )
    path = pathlib.Path(__file__).parent.parent / "reports"
    path.mkdir(exist_ok=True)
    (path / "hw_quality_sweep.json").write_text(json.dumps(report, indent=1))
    print(json.dumps({"all_byte_identical": bool(all_identical)}))
    sys.exit(0 if all_identical else 1)


if __name__ == "__main__":
    main()
