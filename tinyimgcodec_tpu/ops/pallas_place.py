"""Stream assembly v2: XLA pre-shift + Pallas word-placement kernel.

The v1 device BitWriter (ops/pallas_stitch.py) walks blocks one at a
time carrying the global bit offset in SMEM -- ~1.6 us/block on
hardware, dominated by per-iteration loop overhead and per-block
predicated bookkeeping, not by data movement.

v2 splits the work by what each engine is good at:

1. **XLA (vectorized, no serial state):** global bit offsets are an
   exclusive cumsum of per-block bit counts (with byte alignment folded
   in at image boundaries: aligned image starts are a cumsum of
   byte-rounded image totals).  Every block row is then *bit-shifted to
   its final alignment* with two elementwise passes -- per-lane variable
   shifts are native VPU ops, so the only thing XLA cannot do fast
   (data-dependent placement) is deferred.
2. **Pallas (placement only):** pre-shifted rows need just an OR at a
   word offset.  The kernel processes groups of 8 blocks per iteration
   -- one (8, 128) vector register -- placing each sublane at its
   relative word delta via an incremental roll + compare-select chain,
   OR-reducing the sublanes, and read-modify-writing two 128-word rows
   of the VMEM-resident output.  Group spans are precomputed so the
   chain runs 16 steps in the common case, extends to 48 under a
   conditional, and falls back to per-block placement for rare wide
   groups (the worst legal block is 52 words).

No serial bit state survives anywhere: grid steps carry nothing, every
iteration's target comes from the precomputed offsets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import entropy as entropy_ops

BLOCK_WORDS = entropy_ops.BLOCK_WORDS  # 52
ROW_COLS = 56      # pre-shifted row words (52 + spill + pad)
OUT_COLS = 128     # output row width in words
GROUP = 8          # blocks per placement iteration
SPAN1 = 15         # word span handled by the base chain
SPAN2 = 47         # span handled by the conditional extension


def _make_kernel(bt: int, cap_rows: int):
    ng = bt // GROUP

    def kernel(rows_ref, w_ref, base_ref, span_ref, drel_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        sub8 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, GROUP), 0)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, GROUP), 1)

        def rmw(q, placed):
            """OR a (1, 256) window into output rows q, q+1 (clamped)."""
            q0 = jnp.minimum(q, cap_rows - 2)
            cur = out_ref[pl.ds(q0, 2), :]  # (2, OUT_COLS)
            h = jnp.concatenate(
                [placed[:, :OUT_COLS], placed[:, OUT_COLS:]], axis=0
            )
            out_ref[pl.ds(q0, 2), :] = cur | h

        def place_row(row256, w):
            q = w >> 7
            dq = w & 127
            rmw(q, pltpu.roll(row256, dq, 1))

        def group_body(g, carry):
            span = span_ref[0, g]
            big = span > SPAN2

            @pl.when(jnp.logical_not(big))
            def _():
                rows8 = rows_ref[pl.ds(g * GROUP, GROUP), :]  # (8, 56)
                rows8 = jnp.concatenate(
                    [rows8,
                     jnp.zeros((GROUP, OUT_COLS - ROW_COLS), jnp.uint32)],
                    axis=1,
                )  # (8, 128)
                drow = drel_ref[pl.ds(g, 1), :]  # (1, 8)
                bc = jnp.broadcast_to(drow, (GROUP, GROUP))
                dcol = jnp.sum(
                    jnp.where(lane8 == sub8, bc, 0), axis=1, keepdims=True
                )  # (8, 1): word delta per sublane

                def chain(lo, hi, acc, r):
                    for d in range(lo, hi):
                        if d:
                            r = pltpu.roll(r, 1, 1)
                        acc = acc | jnp.where(
                            dcol == d, r, jnp.uint32(0)
                        )
                    return acc, r

                acc, r = chain(0, SPAN1 + 1,
                               jnp.zeros_like(rows8), rows8)
                acc, r = jax.lax.cond(
                    span > SPAN1,
                    lambda a_r: chain(SPAN1 + 1, SPAN2 + 1, *a_r),
                    lambda a_r: a_r,
                    (acc, r),
                )
                red = acc
                for d in (4, 2, 1):
                    red = red | pltpu.roll(red, d, 0)
                win = jnp.concatenate(
                    [red[0:1, :], jnp.zeros((1, OUT_COLS), jnp.uint32)],
                    axis=1,
                )  # (1, 256)
                place_row(win, base_ref[0, g])

            @pl.when(big)
            def _():
                def blk(s, c):
                    w = w_ref[0, g * GROUP + s]
                    row = rows_ref[pl.ds(g * GROUP + s, 1), :]  # (1, 56)
                    row = jnp.concatenate(
                        [row,
                         jnp.zeros((1, 2 * OUT_COLS - ROW_COLS),
                                   jnp.uint32)],
                        axis=1,
                    )  # (1, 256)
                    place_row(row, w)
                    return c

                jax.lax.fori_loop(0, GROUP, blk, 0)

            return carry

        jax.lax.fori_loop(0, ng, group_body, 0)

    return kernel


@functools.cache
def _build(bt: int, n: int, cap_rows: int, interpret: bool):
    ng_total = n // GROUP
    kernel = _make_kernel(bt, cap_rows)
    grid_spec = pl.GridSpec(
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, ROW_COLS), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda t: (0, t),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bt // GROUP), lambda t: (0, t),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bt // GROUP), lambda t: (0, t),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bt // GROUP, GROUP), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cap_rows, OUT_COLS), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
    )

    def call(rows, w, base, span, drel):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((cap_rows, OUT_COLS),
                                           jnp.uint32),
            compiler_params=params,
            interpret=interpret,
        )(rows, w.reshape(1, n), base.reshape(1, ng_total),
          span.reshape(1, ng_total), drel)

    return call


def assemble_cm(
    packed_cm: jnp.ndarray,
    nb: int,
    cap_words: int,
    bt: int = 1024,
    interpret: bool = False,
):
    """(64, N) coefficient-major packed blocks -> one byte-aligned stream.

    packed_cm: output of ops/pallas_encode2.py (rows 0..51 = words, row
    52 = bit count).  nb: blocks per image; image streams are
    byte-aligned.  Returns (stream_words (cap,), image_start_bits
    (n_images,), total_bits, overflow_bool).
    """
    n = packed_cm.shape[1]
    if n % bt:
        raise ValueError(f"N={n} not a multiple of tile {bt}")
    n_img = max(n // nb, 1)
    cap_rows = max(-(-cap_words // OUT_COLS), 4)

    bits = packed_cm[BLOCK_WORDS].astype(jnp.int32)  # (n,)
    img_bits = bits.reshape(n_img, nb).sum(axis=1)
    img_aligned = (img_bits + 7) & ~7
    img_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(img_aligned, dtype=jnp.int32)[:-1]]
    )
    within = jnp.cumsum(
        bits.reshape(n_img, nb), axis=1, dtype=jnp.int32
    ) - bits.reshape(n_img, nb)
    off = (img_start[:, None] + within).reshape(n)
    total_bits = img_start[-1] + img_bits[-1]

    rows = packed_cm[:BLOCK_WORDS].T  # (n, 52)
    rows = jnp.pad(rows, ((0, 0), (0, ROW_COLS - BLOCK_WORDS)))
    sh = (off & 31).astype(jnp.uint32)[:, None]
    prev = jnp.pad(rows[:, :-1], ((0, 0), (1, 0)))
    nsh = (32 - sh) & 31  # sh==0 guarded by the where
    shifted = jnp.where(
        sh > 0, (rows >> sh) | (prev << nsh), rows
    )

    w = (off >> 5).astype(jnp.int32)
    wg = w.reshape(-1, GROUP)
    base = wg[:, 0]
    drel = wg - base[:, None]
    span = drel[:, GROUP - 1]

    call = _build(int(bt), n, int(cap_rows), interpret)
    out = call(shifted, w, base, span, drel)
    overflow = (total_bits >> 5) >= cap_words
    return out.reshape(-1), img_start, total_bits, overflow
