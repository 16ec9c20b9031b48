"""Pallas stream-assembly kernel: ragged per-block words -> one bitstream.

The TPU-native incarnation of the reference's BitWriter + FIFO drain
(c/img.h:24-40, c/fifo.c): a sequential bit-appender running on device,
replacing the gather-based XLA stitch whose per-word binary search and
random gathers dominate encode time on hardware where gathers serialize.

Mechanics (within one sequential grid):

- a 128-word rolling window lives in registers/VMEM; each block's packed
  words are bit-shifted by the current offset (mod 32), *lane-rolled* to
  the current word position (Mosaic supports dynamic rolls), and OR-ed
  into the window;
- whenever the offset crosses the window midpoint, the lower 64 words
  flush to the output buffer via a dynamic-sublane store (also
  supported) and the window shifts down;
- image boundaries (every ``nb`` blocks) round the offset up to a byte
  so each image's stream is independently decodable, and the start
  offsets are recorded for host-side slicing.

Output: (cap_chunks, 64)-word stream buffer + per-image bit offsets +
total bits.  Capacity overflow is detected and reported (bit 1 of
status), letting callers retry with a larger buffer.
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
CHUNK = 64  # words per flushed chunk


def _make_kernel_windowed(bt: int, nb: int, n_images: int, cap_chunks: int):
    """Kernel with the rolling window carried in VMEM scratch (survives
    grid steps) rather than re-read from the output buffer."""

    def kernel(words_ref, bits_ref, out_ref, starts_ref, state_ref,
               win_ref):
        t = pl.program_id(0)
        nt = pl.num_programs(0)

        @pl.when(t == 0)
        def _():
            state_ref[0, 0] = 0
            state_ref[0, 1] = 0
            state_ref[0, 2] = 0
            state_ref[0, 3] = 0
            win_ref[...] = jnp.zeros_like(win_ref)
            starts_ref[...] = jnp.zeros_like(starts_ref)

        lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def body(b, window):
            o = state_ref[0, 0]
            flushed = state_ref[0, 1]
            gb = t * bt + b

            is_start = gb % nb == 0
            o = jnp.where(is_start, (o + 7) & ~7, o)

            @pl.when(is_start)
            def _():
                img = jnp.minimum(gb // nb, n_images - 1)
                starts_ref[pl.ds(img, 1), :] = jnp.full(
                    (1, 1), o, jnp.int32
                )

            nbits = bits_ref[0, b]
            row = words_ref[pl.ds(b, 1), :]
            padded = jnp.concatenate(
                [row, jnp.zeros((1, 128 - BLOCK_WORDS), jnp.uint32)],
                axis=1,
            )

            sh = (o & 31).astype(jnp.uint32)
            nsh = ((32 - (o & 31)) & 31).astype(jnp.uint32)
            prev = pltpu.roll(padded, 1, 1)
            shifted = jnp.where(
                sh > 0, (padded >> sh) | (prev << nsh), padded
            )

            p = (o >> 5) - flushed * CHUNK
            placed = pltpu.roll(shifted, p, 1)
            window = window | placed

            o_new = o + nbits
            state_ref[0, 0] = o_new
            crossed = (o_new >> 5) - flushed * CHUNK >= CHUNK

            @pl.when(crossed)
            def _():
                safe = jnp.minimum(flushed, cap_chunks - 1)
                out_ref[pl.ds(safe, 1), :] = window[:, :CHUNK]
                state_ref[0, 2] = state_ref[0, 2] | jnp.where(
                    flushed >= cap_chunks, 2, 0
                )

            def do_flush(w):
                # shift the upper chunk down (roll left by CHUNK == roll
                # right by 128 - CHUNK; roll requires non-negative shifts)
                rolled = pltpu.roll(w, 128 - CHUNK, 1)
                return jnp.where(lane128 < CHUNK, rolled, jnp.uint32(0))

            window = jax.lax.cond(crossed, do_flush, lambda w: w, window)
            state_ref[0, 1] = jnp.where(crossed, flushed + 1, flushed)
            return window

        window = jax.lax.fori_loop(0, bt, body, win_ref[...])
        win_ref[...] = window

        @pl.when(t == nt - 1)
        def _():
            flushed = state_ref[0, 1]
            s1 = jnp.minimum(flushed, cap_chunks - 1)
            out_ref[pl.ds(s1, 1), :] = window[:, :CHUNK]
            s2 = jnp.minimum(flushed + 1, cap_chunks - 1)

            @pl.when(flushed + 1 < cap_chunks)
            def _():
                out_ref[pl.ds(s2, 1), :] = window[:, CHUNK:]

    return kernel


@functools.cache
def _build(bt: int, nb: int, n: int, cap_chunks: int,
           interpret: bool = False):
    n_images = max(n // nb, 1)
    kernel = _make_kernel_windowed(bt, nb, n_images, cap_chunks)
    grid_spec = pl.GridSpec(
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, BLOCK_WORDS), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda t: (0, t),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((cap_chunks, CHUNK), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_images, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.uint32)],
    )

    def call(words, bits):
        out, starts, state = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((cap_chunks, CHUNK), jnp.uint32),
                jax.ShapeDtypeStruct((n_images, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, 4), jnp.int32),
            ],
            interpret=interpret,
        )(words, bits.reshape(1, n))
        total = state[0, 0]
        status = state[0, 2]
        return out.reshape(-1), starts[:, 0], total, status

    return call


def stitch_pallas(
    words: jnp.ndarray,
    bits: jnp.ndarray,
    nb: int,
    cap_words: int,
    bt: int = 512,
    interpret: bool = False,
):
    """(N, 52) words + (N,) bit counts -> byte-aligned multi-image stream.

    nb: blocks per image (streams are byte-aligned at image boundaries).
    Returns (stream_words (cap,), image_start_bits (n_images,),
    total_bits, status) -- status bit 1 signals capacity overflow.
    """
    n = words.shape[0]
    if n % bt:
        raise ValueError(f"N={n} not a multiple of tile {bt}")
    # +1 guard chunk: the final flush writes the window tail to chunks
    # [flushed, flushed + 1]; a stream that exactly fills the capacity
    # ends with flushed == ceil(cap/64), so without the guard the tail
    # would be clamped onto the last data chunk.  The in-kernel flag
    # only fires on a *crossing* at flushed >= cap_chunks, which a
    # stream exceeding capacity by < 64 words never performs -- so the
    # wrapper below also flags overflow exactly (same silent-window
    # class as the round-3 placement-clamp bug).
    cap_chunks = max(-(-cap_words // CHUNK), 2) + 1
    call = _build(int(bt), int(nb), n, cap_chunks, interpret)
    stream, starts, total, status = call(words, bits.astype(jnp.int32))
    status = status | jnp.where(total > cap_words * 32, 2, 0)
    return stream, starts, total, status
