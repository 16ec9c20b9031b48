#!/usr/bin/env python3
"""Per-stage timing of the pallas v2/v3 encode pipeline on hardware.

Each stage runs k data-dependent iterations inside one jitted fori_loop
(the same anti-hoisting discipline as bench.py::bench_device) so tunnel
dispatch latency stays out of the numbers.  Default k=100: each blocking
device_get costs ~26 ms through this tunnel, so small k inflates every
per-iteration number by ~26/k ms (the round-2 "blockify costs 2.4 ms"
conclusion was exactly this artifact -- the u32 blockify is in fact
nearly free).  Prints ms per corpus pass
and MP/s per stage: blockify_u32, encode kernel, placement, and the
fused whole.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tinyimgcodec_tpu import corpus
    from tinyimgcodec_tpu.ops import transform
    from tinyimgcodec_tpu.ops.pallas_encode2 import encode_pallas2
    from tinyimgcodec_tpu.ops.pallas_place import assemble_cm
    from tinyimgcodec_tpu.xla_cache import ensure_cache

    ensure_cache()
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    bt = 1024
    quality = 50

    images = corpus.load_corpus()
    b, h, w = images.shape
    nb = (h // 8) * (w // 8)
    n = b * nb
    mp = images.size / 1e6
    cap = -(-b * h * w * 4 // 32)
    dev = jax.device_put(images)

    def kloop(step, seed_dtype=jnp.uint8):
        @jax.jit
        def f(im):
            def body(i, acc):
                eps = jnp.where(
                    acc == jnp.uint32(0xFFFFFFFF), seed_dtype(1),
                    seed_dtype(0),
                )
                return acc + step(im + eps)
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))
        return f

    def run(name, f, *args):
        jax.device_get(f(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(f(*args))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1] / k
        print(f"{name:24s} {dt * 1e3:8.2f} ms   {mp / dt:9.1f} MP/s",
              flush=True)
        return dt

    # stage 1: u32-packed blockify alone
    def s_blockify(im):
        x = transform.blockify_u32(im)
        return x[0, 0] + x[-1, -1]

    t1 = run("blockify_u32", kloop(s_blockify), dev)

    # stage 2: encode kernel alone (u32 input staged once)
    x32 = jax.device_put(np.asarray(
        jax.jit(transform.blockify_u32)(dev)))

    def s_encode(x):
        packed, meta, _ = encode_pallas2(
            x, quality, nb=nb, bt=bt, from_u32=True
        )
        return packed[0, 0] + meta[0, -1]

    t2 = run("encode kernel", kloop(s_encode, jnp.uint32), x32)

    # stage 3: placement alone (packed rows staged once)
    pk, mt, _ = jax.jit(
        lambda x: encode_pallas2(x, quality, nb=nb, bt=bt, from_u32=True)
    )(x32)
    pk = jax.device_put(np.asarray(pk))
    mt = jax.device_put(np.asarray(mt))

    @jax.jit
    def f_place(pkx, mtx):
        def body(i, acc):
            eps = jnp.where(
                acc == jnp.uint32(0xFFFFFFFF), jnp.uint32(1), jnp.uint32(0)
            )
            stream, starts, total, _ = assemble_cm(
                pkx + eps, mtx, nb=nb, cap_words=cap, bt=bt
            )
            return acc + stream[0] + stream[-1] + jnp.uint32(total)
        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    t3 = run("placement (assemble_cm)", f_place, pk, mt)

    # fused whole (the bench headline shape)
    def s_full(im):
        packed, meta, _ = encode_pallas2(
            transform.blockify_u32(im), quality, nb=nb, bt=bt,
            from_u32=True,
        )
        stream, starts, total, _ = assemble_cm(
            packed, meta, nb=nb, cap_words=cap, bt=bt
        )
        return stream[0] + stream[-1] + jnp.uint32(total)

    tf = run("full pipeline", kloop(s_full), dev)
    print(f"{'sum of stages':24s} {(t1 + t2 + t3) * 1e3:8.2f} ms   "
          f"(fusion gain {(t1 + t2 + t3 - tf) * 1e3:+.2f} ms)")


if __name__ == "__main__":
    main()
