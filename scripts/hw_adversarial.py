#!/usr/bin/env python3
"""Hardware adversarial conformance sweep -> reports/hw_adversarial.json.

tests/test_adversarial.py runs the same battery in Pallas interpret mode
on CPU, which computes real f32 and can HIDE hardware-only defects (the
round-4 example: XLA:TPU silently casts f32 dot inputs to bf16, so the
v4 placement kernel corrupted streams on the chip while every interpret
test passed).  This script drives the COMPILED kernels on the real
device:

- content battery (noise / checkerboards / gradients / flat / saturated
  stripes) x qualities, exact mode byte-identity vs the float64 host
  oracle, fast mode decodability;
- capacity-boundary sweep on the flagship path (budgets stepping the
  128-word output row edge -- the round-3 silent-corruption window);
- TICX device entropy decode parity on the same adversarial content.

Exit code 0 only if every check passes.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def contents(h, w):
    y, x = np.mgrid[0:h, 0:w]
    rng = np.random.RandomState(7)
    return {
        "noise": rng.randint(0, 256, (h, w)).astype(np.uint8),
        "checker1": ((x + y) % 2 * 255).astype(np.uint8),
        "checker4": (((x // 4 + y // 4) % 2) * 255).astype(np.uint8),
        "hgrad": (x * 255 // max(w - 1, 1)).astype(np.uint8),
        "flat0": np.zeros((h, w), np.uint8),
        "flat255": np.full((h, w), 255, np.uint8),
        "stripes": ((x % 2) * 255).astype(np.uint8),
    }


def main() -> int:
    from tinyimgcodec_tpu import container
    from tinyimgcodec_tpu.engine import Engine
    from tinyimgcodec_tpu.pallas_pipeline import compress_batch_pallas
    from tinyimgcodec_tpu.xla_cache import ensure_cache

    ensure_cache()
    import jax

    rec: dict = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "checks": [],
        "all_passed": True,
    }

    def check(name, passed, **extra):
        rec["checks"].append({"name": name, "passed": bool(passed), **extra})
        rec["all_passed"] = rec["all_passed"] and bool(passed)
        print(f"{'PASS' if passed else 'FAIL'} {name} {extra}",
              file=sys.stderr, flush=True)

    # 128x128 battery: nb=256 per image admits a legal 128-multiple
    # pallas tile for the 7-image batch (Mosaic's 128-lane block rule;
    # 64x64 batches fall back to XLA -- checked separately below)
    imgs = np.stack(list(contents(128, 128).values()))
    names = list(contents(128, 128))

    # -- content battery x quality, exact byte-identity ----------------
    for q in (1, 10, 50, 90, 95):
        t0 = time.time()
        refs = [container.compress(im, quality=q) for im in imgs]
        out = compress_batch_pallas(imgs, quality=q, precision="exact")
        ok = out == refs
        check(f"exact-byte-identity-q{q}", ok, secs=round(time.time() - t0, 1),
              mismatches=[n for n, a, b in zip(names, out, refs) if a != b])
        # fast mode: decodable, dims preserved
        fast = compress_batch_pallas(imgs, quality=q, precision="fast")
        dec_ok = all(
            container.decompress(s).shape == im.shape
            for s, im in zip(fast, imgs)
        )
        check(f"fast-decodable-q{q}", dec_ok)

    # -- q=99: the oracle refuses extreme content on the standard table;
    # the device path must raise the same error, never emit bytes ------
    try:
        container.compress(imgs[0], quality=99)
        oracle_raises = False
    except ValueError:
        oracle_raises = True
    if oracle_raises:
        try:
            compress_batch_pallas(imgs, quality=99, precision="exact")
            check("q99-raises-like-oracle", False)
        except ValueError as e:
            check("q99-raises-like-oracle", "Huffman table range" in str(e))

    # -- capacity-boundary sweep on the flagship path ------------------
    noise = imgs[0]
    ref = container.compress(noise, quality=50)
    need = -(-(len(ref) - 16) * 8 // 32)
    row_up = -(-need // 128) * 128
    sweep_ok = True
    for cap in sorted({need - 64, need - 1, need, row_up - 1, row_up,
                       row_up + 128}):
        out = compress_batch_pallas(
            noise[None], quality=50, precision="exact",
            bits_per_pixel_budget=cap * 32 / noise.size,
        )[0]
        if out != ref:
            sweep_ok = False
            check(f"capacity-boundary cap={cap}", False, need=need)
    check("capacity-boundary-sweep", sweep_ok, need=need, row_up=row_up)

    # -- small-image batch: must FALL BACK (not crash, not corrupt) ----
    from tinyimgcodec_tpu import api

    small = np.stack(list(contents(64, 64).values()))
    # api entries default block_index=True since round 5 (the trailer
    # is a pure suffix; payload bytes still match the oracle)
    refs64 = [
        container.compress(im, quality=50, block_index=True)
        for im in small
    ]
    out64 = api.compress_batch(small, quality=50, precision="exact")
    check("small-batch-api-fallback-byte-identity", out64 == refs64)
    one64 = api.compress(small[0], quality=50, precision="exact")
    check("single-small-image-byte-identity", one64 == refs64[0])

    # -- TICX device entropy decode parity on adversarial content ------
    streams = compress_batch_pallas(
        imgs, quality=50, precision="exact", block_index=True
    )
    eng = Engine(precision="exact")
    eng._device_entropy = True
    dev = eng.decompress_batch(streams)
    gold = np.stack([container.decompress(s) for s in streams])
    check("device-entropy-decode-parity", np.array_equal(dev, gold))
    # dense content at q=90 forces the subset-rerun path on chip
    s90 = compress_batch_pallas(
        imgs, quality=90, precision="exact", block_index=True
    )
    dev90 = eng.decompress_batch(s90)
    gold90 = np.stack([container.decompress(s) for s in s90])
    check("device-entropy-decode-parity-q90-dense",
          np.array_equal(dev90, gold90))

    # -- dynamic-table streams through the device decoder (round 5):
    # runtime-tensor tables ride the same chain/reassembly programs --
    # the value pieces cross an MXU matmul, so byte parity must be
    # proven on the chip, not interpret mode ---------------------------
    from tinyimgcodec_tpu.ops.entropy_decode import prepare_batch

    for q in (50, 90):
        s_auto = eng.compress(imgs[0], q, auto_table=True)
        prep = prepare_batch([s_auto])
        routed = prep is not None and prep["tables"] is not None
        dev_a = eng.decompress(s_auto)
        gold_a = container.decompress(s_auto)
        check(f"device-entropy-decode-parity-custom-table-q{q}",
              routed and np.array_equal(dev_a, gold_a), routed=routed)

    out_path = (
        pathlib.Path(__file__).parent.parent
        / "reports" / "hw_adversarial.json"
    )
    out_path.write_text(json.dumps(rec, indent=1))
    print(json.dumps({"all_passed": rec["all_passed"],
                      "checks": len(rec["checks"])}))
    return 0 if rec["all_passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
