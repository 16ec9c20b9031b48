#!/usr/bin/env python3
"""Stage-by-stage encode profiling on the real device.

Times each pipeline stage independently at corpus scale (49 x 512 x 512 =
200704 blocks) to locate the bottleneck before optimizing.  Run directly
on the TPU host: python scripts/profile_encode.py [--batch 49]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(fn, *args, reps=10, warmup=2):
    import jax

    for _ in range(warmup):
        r = fn(*args)
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps, r


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=49)
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from tinyimgcodec_tpu import corpus
    from tinyimgcodec_tpu.ops import entropy, transform

    images = corpus.load_corpus(args.batch)
    b = images.shape[0]
    mp = b * 512 * 512 / 1e6
    blocks_np = np.asarray(
        transform.blockify(images.astype(np.int32).reshape(b, 512, 512))
    ).reshape(-1, 8, 8)
    n = blocks_np.shape[0]
    print(f"{b} images, {n} blocks, {mp:.2f} MP")

    blocks = jax.device_put(blocks_np)

    def stage(name, fn, *a, reps=args.reps):
        dt, r = timeit(jax.jit(fn), *a, reps=reps)
        print(f"{name:28s} {dt * 1e3:8.2f} ms   {mp / dt:9.1f} MP/s")
        return r

    # transfer cost
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(jax.device_put(blocks_np))
    dt = (time.perf_counter() - t0) / 3
    print(f"{'h2d transfer':28s} {dt * 1e3:8.2f} ms   {mp / dt:9.1f} MP/s")

    zzf = stage(
        "transform fast", lambda x: transform.encode_blocks(x, 50, "fast"),
        blocks,
    )
    zz = stage(
        "transform exact",
        lambda x: transform.encode_blocks(x, 50, "exact"), blocks,
    )
    dc, ac = stage("dpcm", transform.dc_dpcm, zz)
    w0, w1, bits, _ = stage(
        "symbols", lambda d, a: entropy.block_symbols(d, a), dc, ac
    )
    words, bb = stage(
        "pack_blocks", lambda a, b_, c: entropy.pack_blocks(a, b_, c),
        w0, w1, bits,
    )
    total = int(np.asarray(bb).sum())
    cap = -(-total // 32) + 64
    stage(
        "stitch (one stream)",
        lambda w, l: entropy.stitch_words(w, l, cap), words,
        bb.astype(jnp.int32),
    )

    # fused pipelines
    def fused(x):
        z = transform.encode_blocks(x, 50, "exact")
        d, a = transform.dc_dpcm(z)
        s0, s1, sb, ov = entropy.block_symbols(d, a)
        w, l = entropy.pack_blocks(s0, s1, sb)
        return w, l, ov

    w, l, _ = stage("fused exact->words", fused, blocks)

    # device -> host pulls
    t0 = time.perf_counter()
    for _ in range(3):
        _ = np.asarray(w), np.asarray(l)
    dt = (time.perf_counter() - t0) / 3
    print(f"{'d2h words pull':28s} {dt * 1e3:8.2f} ms   {mp / dt:9.1f} MP/s")

    # host stitch
    from tinyimgcodec_tpu import native

    wn, ln = np.asarray(w), np.asarray(l)
    if native.available():
        t0 = time.perf_counter()
        for _ in range(3):
            native.stitch(wn, ln)
        dt = (time.perf_counter() - t0) / 3
        print(f"{'host C stitch':28s} {dt * 1e3:8.2f} ms   {mp / dt:9.1f} MP/s")


if __name__ == "__main__":
    main()
