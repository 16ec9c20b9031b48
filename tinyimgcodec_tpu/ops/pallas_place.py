"""Stream assembly: word placement of pre-aligned block rows.

The v1 device BitWriter (ops/pallas_stitch.py) walks blocks one at a
time carrying the global bit offset in SMEM -- ~1.6 us/block on
hardware, dominated by per-iteration loop overhead and per-block
predicated bookkeeping, not by data movement.

Here all bit-level work already happened inside the encode kernel
(ops/pallas_encode2.py emits every block's words shifted to their final
stream alignment, plus the global bit offset per block), so assembly is
pure *word placement*: OR block row b into the stream at word
``offset_b >> 5``.  Two kernel generations, both tile-vectorized:

**v3 (default, log masked-roll; ~1.9 ms for the 49-image corpus on
v5e -- see reports/perf_breakdown_r03.md):**

1. Every block row rolls to its own in-group word delta in exactly 6
   steps -- one masked lane-roll per bit of the delta (deltas <= 63).
   The whole vector phase runs on 128-lane windows (in-group extent
   <= 63 + 56 = 119 words), halving its VMEM traffic vs the 256-lane
   layout; only the serial phase's roll to the group base's 127-word
   phase widens to 256 lanes.
2. 16-block groups collapse via a 4-step masked segmented OR.
3. A short serial loop per group (bt/16 iterations): one dynamic roll
   to the base word's phase + a read-OR-write of two 128-word rows of
   the VMEM-resident output.  Groups spanning > 63 words fall back to
   per-block placement.  (Measured dead ends, kept out: wider groups
   explode the fallback rate; pair-merged groups and a register-walk
   flush both cost more than they save -- perf_breakdown_r03.md.)

**v2 (kept for tiny tiles and comparison):** an incremental
roll + compare-select chain that walks every possible delta (16 steps
always, 32 more when a tile's max group span needs them) over 8-block
groups -- more VMEM traffic in the vector phase and twice the
serial RMW iterations.

No serial bit state survives anywhere: grid steps carry nothing, every
iteration's target comes from the encode kernel's offsets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_encode2 import ROW_WORDS

OUT_COLS = 128     # output row width in words
GROUP = 8          # blocks per placement group
SPAN1 = 15         # word span handled by the always-on chain
SPAN2 = 47         # span handled by the conditional extension

# v3 (log masked-roll placement)
GROUP3 = 16        # blocks per group
SPAN3 = 63         # max in-group word delta the log roll handles
W3 = 2 * OUT_COLS  # 256-lane window: delta 63 + row 56 + phase 127 < 256

# v4 (matmul scatter placement)
RROWS = 128        # output-row window a tile's stream extent must fit


def _make_kernel(bt: int, cap_rows: int):
    ng = bt // GROUP

    def kernel(rows_ref, w_ref, span_ref, drel_ref, ms_ref, out_ref,
               acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        rows = jnp.concatenate(
            [rows_ref[...],
             jnp.zeros((bt, OUT_COLS - ROW_WORDS), jnp.uint32)],
            axis=1,
        )  # (bt, 128)
        dmat = jnp.broadcast_to(
            drel_ref[...].T, (bt, OUT_COLS)
        )  # word delta per block, broadcast along lanes
        ms = ms_ref[0, t]  # max group span in this tile

        def chain(lo, hi, acc, r):
            for d in range(lo, hi):
                if d:
                    r = pltpu.roll(r, 1, 1)
                acc = acc | jnp.where(dmat == d, r, jnp.uint32(0))
            return acc, r

        acc, _ = chain(0, SPAN1 + 1, jnp.zeros_like(rows), rows)
        acc_ref[...] = acc

        @pl.when(ms > SPAN1)
        def _():
            # chain() pre-rolls by one before d's first use, so seed
            # with rows already rolled to SPAN1 (not SPAN1 + 1)
            r = pltpu.roll(rows, SPAN1, 1)
            ext, _ = chain(SPAN1 + 1, SPAN2 + 1,
                           jnp.zeros_like(rows), r)
            acc_ref[...] = acc_ref[...] | ext

        # segmented OR over each group's 8 sublanes into sublane 8g
        sub = jax.lax.broadcasted_iota(jnp.int32, (bt, OUT_COLS), 0)
        red = acc_ref[...]
        for d in (4, 2, 1):
            shifted = pltpu.roll(red, bt - d, 0)  # row i+d -> i
            red = red | jnp.where(
                (sub & (GROUP - 1)) + d < GROUP, shifted, jnp.uint32(0)
            )
        acc_ref[...] = red

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

        zpad = jnp.zeros((1, OUT_COLS), jnp.uint32)

        def group_body(g, carry):
            span = span_ref[0, g]

            @pl.when(span <= SPAN2)
            def _():
                win = jnp.concatenate(
                    [acc_ref[pl.ds(g * GROUP, 1), :], zpad], axis=1
                )  # (1, 256)
                place_row(win, w_ref[0, g * GROUP])

            @pl.when(span > SPAN2)
            def _():
                def blk(s, c):
                    w = w_ref[0, g * GROUP + s]
                    row = jnp.concatenate(
                        [rows_ref[pl.ds(g * GROUP + s, 1), :],
                         jnp.zeros((1, 2 * OUT_COLS - ROW_WORDS),
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
    ntiles = n // bt
    kernel = _make_kernel(bt, cap_rows)
    grid_spec = pl.GridSpec(
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((bt, ROW_WORDS), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda t: (0, t),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bt // GROUP), lambda t: (0, t),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            # whole maxspan row resident (ntiles is small; a (1, 1)
            # block would violate the lane-divisibility rule)
            pl.BlockSpec((1, ntiles), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((cap_rows, OUT_COLS), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bt, OUT_COLS), jnp.uint32)],
    )
    # full-resident output (cap/128 x 128 words) + the unrolled chain's
    # temporaries exceed the 16 MB default scoped-VMEM limit
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    def call(packed, w, span, drel, maxspan):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((cap_rows, OUT_COLS),
                                           jnp.uint32),
            compiler_params=params,
            interpret=interpret,
        )(packed, w.reshape(1, n), span.reshape(1, ng_total),
          drel.reshape(1, n), maxspan.reshape(1, ntiles))

    return call


def _make_kernel_v3(bt: int, cap_rows: int):
    """Log masked-roll placement (v3).

    The v2 chain walks every possible word delta (16 always + 32
    conditional roll/compare/select steps over the whole tile).  v3
    rolls each block row to its own in-group delta in exactly 6 steps
    -- one masked roll per bit of the delta (deltas <= SPAN3) -- then
    collapses 16-block groups with a 4-step segmented OR, leaving half
    as many serial RMW iterations as v2.  ~6x less VMEM traffic in the
    vector phase; groups whose span exceeds SPAN3 (rare: 16 dense
    high-bit blocks) fall back to per-block placement.
    """
    ng = bt // GROUP3

    def kernel(rows_ref, w_ref, drel_ref, out_ref, acc_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        # the whole vector phase fits a 128-lane window: in-group delta
        # (<= SPAN3 = 63) + block row (56 words) extends to <= 119 < 128,
        # so the rolls/segmented ORs stream half the VMEM of a 256-lane
        # layout; only the serial phase's final roll to the group base's
        # 127-word phase needs the 256-lane window (built per group).
        rows = jnp.concatenate(
            [rows_ref[...],
             jnp.zeros((bt, OUT_COLS - ROW_WORDS), jnp.uint32)],
            axis=1,
        )  # (bt, 128)
        dmat = jnp.broadcast_to(drel_ref[...].T, (bt, OUT_COLS))

        r = rows
        for k in (1, 2, 4, 8, 16, 32):  # per-row roll by delta's bits
            rolled = pltpu.roll(r, k, 1)
            r = jnp.where((dmat & k) != 0, rolled, r)

        # segmented OR over each group's 16 sublanes into sublane 16g
        sub = jax.lax.broadcasted_iota(jnp.int32, (bt, OUT_COLS), 0)
        for d in (8, 4, 2, 1):
            shifted = pltpu.roll(r, bt - d, 0)  # row i+d -> i
            r = r | jnp.where(
                (sub & (GROUP3 - 1)) + d < GROUP3, shifted, jnp.uint32(0)
            )
        acc_ref[...] = r

        def rmw(q, placed):
            """OR a (1, 256) window into output rows q, q+1 (clamped)."""
            q0 = jnp.minimum(q, cap_rows - 2)
            cur = out_ref[pl.ds(q0, 2), :]
            h = jnp.concatenate(
                [placed[:, :OUT_COLS], placed[:, OUT_COLS:]], axis=0
            )
            out_ref[pl.ds(q0, 2), :] = cur | h

        def place_row(row256, w):
            q = w >> 7
            dq = w & 127
            rmw(q, pltpu.roll(row256, dq, 1))

        zpad = jnp.zeros((1, OUT_COLS), jnp.uint32)

        def group_body(g, carry):
            # group span = last block's word delta (w is in SMEM: two
            # scalar reads beat a lane-padded span input, which Mosaic
            # would reject at (1, bt/16) block shape anyway)
            base = w_ref[0, g * GROUP3]
            span = w_ref[0, g * GROUP3 + GROUP3 - 1] - base

            @pl.when(span <= SPAN3)
            def _():
                win = jnp.concatenate(
                    [acc_ref[pl.ds(g * GROUP3, 1), :], zpad], axis=1
                )  # (1, 256)
                place_row(win, base)

            @pl.when(span > SPAN3)
            def _():
                def blk(s, c):
                    w = w_ref[0, g * GROUP3 + s]
                    row = jnp.concatenate(
                        [rows_ref[pl.ds(g * GROUP3 + s, 1), :],
                         jnp.zeros((1, W3 - ROW_WORDS), jnp.uint32)],
                        axis=1,
                    )
                    place_row(row, w)
                    return c

                jax.lax.fori_loop(0, GROUP3, blk, 0)

            return carry

        jax.lax.fori_loop(0, ng, group_body, 0)

    return kernel


@functools.cache
def _build_v3(bt: int, n: int, cap_rows: int, interpret: bool):
    ntiles = n // bt
    kernel = _make_kernel_v3(bt, cap_rows)
    grid_spec = pl.GridSpec(
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((bt, ROW_WORDS), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda t: (0, t),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cap_rows, OUT_COLS), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bt, OUT_COLS), jnp.uint32)],
    )
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    def call(packed, w, drel):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((cap_rows, OUT_COLS),
                                           jnp.uint32),
            compiler_params=params,
            interpret=interpret,
        )(packed, w.reshape(1, n), drel.reshape(1, n))

    return call


def _make_kernel_v4(bt: int, rrows: int):
    """Matmul scatter placement (v4, default when the tile fits).

    v2/v3 end in a serial per-group loop (dynamic read + phase roll +
    two-row RMW per group) that measures ~1.3 ms of the corpus pass on
    a v5e -- loop machinery, not data movement.  v4 removes ALL serial
    placement work by turning the scatter into an MXU matmul:

    1. every block row rolls to its own full word phase ``dq = w & 127``
       (6 masked-roll steps on the 128-lane window for dq & 63 -- block
       extent 56 + 63 < 128 -- then one 256-lane step for dq & 64);
    2. a one-hot matrix ``B[r, j] = (q_j - q0 == r)`` scatters all bt
       rows onto the tile's output-row window in two (rrows, bt) @
       (bt, 256) matmuls.  Stream bits are disjoint across blocks, so
       integer OR == integer ADD, and each uint32 word split into
       16-bit halves sums exactly in f32 (halves <= 0xFFFF).

    No per-group spans, no wide-group fallback: every block is placed
    individually by construction.  Tiles whose stream extent exceeds
    ``rrows - 1`` output rows (> ~16 words/block average) divert the
    whole batch to the v3 kernel via lax.cond in assemble_cm.
    """

    def kernel(rows_ref, qrel_ref, dq_ref, q0_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        rows = jnp.concatenate(
            [rows_ref[...],
             jnp.zeros((bt, OUT_COLS - ROW_WORDS), jnp.uint32)],
            axis=1,
        )  # (bt, 128)
        dmat = jnp.broadcast_to(dq_ref[...].T, (bt, OUT_COLS))
        r = rows
        for k in (1, 2, 4, 8, 16, 32):
            rolled = pltpu.roll(r, k, 1)
            r = jnp.where((dmat & k) != 0, rolled, r)
        r = jnp.concatenate(
            [r, jnp.zeros((bt, OUT_COLS), jnp.uint32)], axis=1
        )  # (bt, 256)
        dmat2 = jnp.broadcast_to(dq_ref[...].T, (bt, W3))
        rolled = pltpu.roll(r, 64, 1)
        r = jnp.where((dmat2 & 64) != 0, rolled, r)

        # Byte-quarter matmuls: the MXU's native bf16 path represents
        # integers <= 256 exactly, and disjoint stream bits keep every
        # 8-bit lane sum <= 255 (f32 accumulation), so four bf16
        # matmuls reconstruct the uint32 words bit-exactly.  (A plain
        # f32 jnp.dot silently casts inputs to bf16 on TPU and
        # corrupts the halves -- caught by the hardware byte-identity
        # check; interpret mode computes f32 and hides it.)
        rows_iota = jax.lax.broadcasted_iota(
            jnp.int32, (rrows, bt), 0
        )
        sel = (
            rows_iota == jnp.broadcast_to(qrel_ref[...], (rrows, bt))
        ).astype(jnp.bfloat16)
        word = jnp.zeros((rrows, W3), jnp.uint32)
        for k in range(4):
            q = (
                ((r >> jnp.uint32(8 * k)) & jnp.uint32(0xFF))
                .astype(jnp.int32)
                .astype(jnp.float32)
                .astype(jnp.bfloat16)
            )
            acc = jnp.dot(sel, q, preferred_element_type=jnp.float32)
            word = word | (
                acc.astype(jnp.int32).astype(jnp.uint32)
                << jnp.uint32(8 * k)
            )  # (rrows, 256)

        q0 = q0_ref[0, t]
        cur = out_ref[pl.ds(q0, rrows), :]
        out_ref[pl.ds(q0, rrows), :] = cur | word[:, :OUT_COLS]
        cur2 = out_ref[pl.ds(q0 + 1, rrows), :]
        out_ref[pl.ds(q0 + 1, rrows), :] = cur2 | word[:, OUT_COLS:]

    return kernel


@functools.cache
def _build_v4(bt: int, n: int, alloc_rows: int, interpret: bool):
    ntiles = n // bt
    kernel = _make_kernel_v4(bt, RROWS)
    grid_spec = pl.GridSpec(
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((bt, ROW_WORDS), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ntiles), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((alloc_rows, OUT_COLS), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    def call(packed, qrel, dq, q0):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((alloc_rows, OUT_COLS),
                                           jnp.uint32),
            compiler_params=params,
            interpret=interpret,
        )(packed, qrel.reshape(1, n), dq.reshape(1, n),
          q0.reshape(1, ntiles))

    return call


def assemble_cm(
    packed: jnp.ndarray,
    meta: jnp.ndarray,
    nb: int,
    cap_words: int,
    bt: int = 1024,
    interpret: bool = False,
):
    """(N, 56) pre-aligned packed blocks -> one byte-aligned stream.

    packed/meta: outputs of ops/pallas_encode2.py (stream-aligned word
    rows; meta row 0 = global bit offsets, row 1 = bit counts).  nb:
    blocks per image.  Returns (stream_words (cap,), image_start_bits
    (n_images,), total_bits, overflow_bool).

    Uses the v3 log masked-roll kernel when the tile admits 16-block
    groups; tiny tiles (tests) fall back to the v2 delta chain.
    """
    n = packed.shape[0]
    if n % bt:
        raise ValueError(f"N={n} not a multiple of tile {bt}")
    # +1 guard row: the RMW writes two 128-word rows starting at
    # q = start_word >> 7, and a valid stream's last block may start
    # anywhere up to word cap_words - 1 (row ceil(cap/128) - 1), so its
    # second row lands in the guard.  Without it the kernels' defensive
    # clamp (q0 = min(q, rows - 2)) silently RELOCATED last-row blocks
    # on top of earlier data -- corrupting any stream whose tail landed
    # in the final 128-word row of the budget with no overflow flag
    # (round-3 verdict repro: 64x64 noise, q=50, 4 bpp budget).  With
    # the guard row the clamp is a true no-op for every stream the
    # overflow predicate below admits.
    cap_rows = max(-(-cap_words // OUT_COLS), 4) + 1

    off = meta[0].astype(jnp.int32)  # (n,)
    total_bits = off[-1] + meta[1, -1].astype(jnp.int32)
    starts = off[::nb]

    w = off >> 5
    if bt % GROUP3 == 0:
        # v4 (matmul scatter) when every tile's stream extent fits the
        # RROWS output-row window (~16 words/block average -- all
        # natural content); the v3 log masked-roll kernel is the
        # always-correct fallback picked at runtime by lax.cond.
        ntiles = n // bt
        alloc_rows = int(cap_rows) + RROWS
        q = w >> 7
        qt = q.reshape(ntiles, bt)
        q0 = qt[:, 0]
        qrel = (qt - q0[:, None]).reshape(n)
        dq = w & 127
        fits = jnp.max(qt[:, -1] - q0) <= RROWS - 1
        wg = w.reshape(-1, GROUP3)
        drel = (wg - wg[:, 0:1]).reshape(n)
        v4 = _build_v4(int(bt), n, alloc_rows, interpret)
        v3 = _build_v3(int(bt), n, alloc_rows, interpret)
        out = jax.lax.cond(
            fits,
            lambda p, wv, dr, qr, dqv, q0v: v4(p, qr, dqv, q0v),
            lambda p, wv, dr, qr, dqv, q0v: v3(p, wv, dr),
            packed, w, drel, qrel, dq, q0.astype(jnp.int32),
        )
    else:
        wg = w.reshape(-1, GROUP)
        drelg = wg - wg[:, 0:1]
        span = drelg[:, GROUP - 1]
        drel = drelg.reshape(n)
        maxspan = span.reshape(n // bt, bt // GROUP).max(axis=1)
        call = _build(int(bt), n, int(cap_rows), interpret)
        out = call(packed, w, span, drel, maxspan)
    # exact capacity test: ceil(total_bits / 32) words must fit.  Any
    # stream admitted here places correctly (see guard-row note above);
    # anything larger is flagged so callers retry with a bigger budget.
    overflow = total_bits > cap_words * 32
    return out.reshape(-1), starts, total_bits, overflow
