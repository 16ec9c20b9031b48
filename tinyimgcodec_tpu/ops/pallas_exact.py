"""Pallas double-float transform kernel (exact-precision encode path).

Computes the quantized zig-zag coefficients with the same double-float
semantics as ops/transform.py's EXACT mode (error-free Dekker/Knuth
transforms, round-half-even with exact-tie snapping), entirely in VMEM.

Layout: *coefficient-major* (64, BT) tiles.  The separable DCT runs on
row-groups: stage 1 builds Y_j = sum_i D[:, i] * X[i, j] as (8, BT)
arrays (output row u on sublanes, block on lanes -- full VPU width), and
stage 2 contracts Y_j against scalar basis entries.  All double-float
helper functions are reused verbatim from ops/df32.py; Mosaic preserves
strict IEEE semantics (verified on hardware), so no optimization
barriers are needed beyond the ones df32 already carries.

Output: zz (64, BT) int32 per tile -- transposed by the caller to feed
the block-major entropy kernel (ops/pallas_encode.py, from_zz).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ZIGZAG_ORDER, quant_divisors
from . import df32
from .transform import dct_basis


def _make_kernel(quality: int, bt: int, interpret: bool,
                 with_flags: bool = False, from_u32: bool = False):
    d64 = dct_basis()  # (8, 8) float64
    dh, dl = df32.split_hi_lo(d64)
    recip = 1.0 / quant_divisors(quality)  # (8, 8) float64
    rh, rl = df32.split_hi_lo(recip)
    # zigzag as a static row permutation of the row-major (u*8+v) order
    zz_rows = [int(p) for p in ZIGZAG_ORDER]

    def kernel(x_ref, tab_ref, *rest):
        # Mosaic cannot lower optimization_barrier and does not need it
        # (strict IEEE lowering, no reassociation/FMA contraction); the
        # interpret path runs through XLA and keeps the barriers.
        with df32.barrier_free() if not interpret else _nullcontext():
            _kernel_body(x_ref, tab_ref, *rest)

    def _kernel_body(x_ref, tab_ref, *rest):
        if from_u32:
            perm_ref, out_ref, *flag_rest = rest
        else:
            out_ref, *flag_rest = rest
        flag_ref = flag_rest[0] if flag_rest else None
        # tab: (4, 8, 8) = [basis hi, basis lo, recip hi, recip lo]
        tab = tab_ref[...]
        if from_u32:
            # word-packed blocks (bt, 16): expand bytes across lanes
            # (same scheme as ops/pallas_encode2), then restore natural
            # pixel order with one EXACT 0/1 matmul (single term per
            # output, pixel values <= 255 -- no rounding) and transpose
            # to coefficient-major.  Skips the XLA u8-blockify + big
            # (N, 64) -> (64, N) int transpose on the host side.
            x32 = x_ref[...]  # (bt, 16) uint32
            xt = pltpu.repeat(x32, 4, 1)  # (bt, 64) lane-tiled
            lane = jax.lax.broadcasted_iota(jnp.int32, (bt, 64), 1)
            sh = ((lane // 16) * 8).astype(jnp.uint32)
            xp = ((xt >> sh) & jnp.uint32(0xFF)).astype(
                jnp.int32
            ).astype(jnp.float32)
            xn = jnp.dot(xp, perm_ref[...],
                         preferred_element_type=jnp.float32)
            x = xn.T - 128.0  # (64, bt), exact
        else:
            x = x_ref[...].astype(jnp.float32) - 128.0  # (64, BT), exact

        # ---- stage 1: Y_j[u, :] = sum_i D[u, i] * X[i*8+j, :] ----------
        y = []  # 8 double-float (8, BT) arrays indexed by j
        for j in range(8):
            acc_h = acc_l = None
            for i in range(8):
                row = x[i * 8 + j : i * 8 + j + 1, :]  # (1, BT)
                mh = tab[0, :, i : i + 1]              # (8, 1)
                ml = tab[1, :, i : i + 1]
                ph, pe = df32.two_prod(row, mh)        # -> (8, BT)
                pe = pe + row * ml
                th, tl = df32.quick_two_sum(ph, pe)
                if acc_h is None:
                    acc_h, acc_l = th, tl
                else:
                    acc_h, acc_l = df32.df_add(acc_h, acc_l, th, tl)
            y.append((acc_h, acc_l))

        # ---- stage 2 + quantize: C_v[u, :] = sum_j Y_j[u, :] D[v, j] ---
        c = []  # row-major coefficient rows (u*8+v) as (1, BT) df pairs
        for v in range(8):
            acc_h = acc_l = None
            for j in range(8):
                yh, yl = y[j]
                # double-float x double-float with the (hi, lo) split of
                # the float64 basis entry as scalar constants
                th, tl = df32.df_mul(
                    yh, yl, float(dh[v, j]), float(dl[v, j])
                )
                if acc_h is None:
                    acc_h, acc_l = th, tl
                else:
                    acc_h, acc_l = df32.df_add(acc_h, acc_l, th, tl)
            c.append((acc_h, acc_l))  # (8, BT): rows u for this v

        # quantize rows: q[u, v] = round_half_even(C * recip)
        q_rows = [None] * 64
        unc_acc = None
        for v in range(8):
            ch, cl = c[v]
            qh, ql = df32.df_mul(
                ch, cl, tab[2, :, v : v + 1], tab[3, :, v : v + 1]
            )
            qv, unc = df32.df_round_half_even(qh, ql)
            if with_flags:
                unc_acc = unc if unc_acc is None else (unc_acc | unc)
            qv = qv.astype(jnp.int32)  # (8, BT)
            for u in range(8):
                q_rows[u * 8 + v] = qv[u : u + 1, :]

        out_ref[...] = jnp.concatenate(
            [q_rows[p] for p in zz_rows], axis=0
        )
        if with_flags:
            # per-block uncertainty flag: any coefficient whose rounding
            # sits closer to a boundary than double-float error can
            # certify against float64 (host fixup recomputes the block)
            flag_ref[...] = jnp.any(
                unc_acc, axis=0, keepdims=True
            ).astype(jnp.int32)

    return kernel


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *exc):
        return None


@functools.cache
def _build(quality: int, bt: int, n: int, interpret: bool,
           with_flags: bool = False, from_u32: bool = False):
    kernel = _make_kernel(quality, bt, interpret, with_flags, from_u32)
    out_specs = pl.BlockSpec((64, bt), lambda t: (0, t),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((64, n), jnp.int32)
    if with_flags:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ]
    if from_u32:
        in_specs = [
            pl.BlockSpec((bt, 16), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 8, 8), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((64, bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 8, 8), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    grid_spec = pl.GridSpec(
        grid=(n // bt,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    d64 = dct_basis()
    dh, dl = df32.split_hi_lo(d64)
    rh, rl = df32.split_hi_lo(1.0 / quant_divisors(quality))
    # numpy until call time: a jnp constant created during one jit trace
    # would leak that trace's tracer into later traces via the cache
    tab_np = np.stack([dh, dl, rh, rl]).astype(np.float32)
    if from_u32:
        from .pallas_encode2 import _u32_perm

        perm_np = np.zeros((64, 64), np.float32)
        perm_np[np.arange(64), _u32_perm()] = 1.0

        def call(x32):  # (N, 16) uint32 word-packed blocks
            return pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=out_shape,
                interpret=interpret,
            )(x32, jnp.asarray(tab_np), jnp.asarray(perm_np))

        return call

    def call(x_cm):  # (64, N) int32 coefficient-major pixels
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(x_cm, jnp.asarray(tab_np))

    return call


def _legal_bt(n: int, bt: int) -> int:
    """Clamp the lane-tile size to what Mosaic accepts.

    The coefficient-major specs tile the LANE dimension, which must be a
    multiple of 128 or the whole array (the Pallas TPU block rule;
    interpret mode never checks it -- the round-4 hardware adversarial
    sweep caught a 7x64-block batch crashing on the chip with bt=64).
    Unlike the entropy kernels, the transform carries no cross-block
    state, so tiles may freely span image boundaries: any divisor of n
    works.
    """
    bt = min(bt, n)
    if n % bt == 0 and (bt % 128 == 0 or bt == n):
        return bt
    for t in (512, 256, 128):
        if n % t == 0:
            return t
    if n <= 4096:  # whole-array single tile (small batches)
        return n
    raise ValueError(
        f"N={n} blocks not tileable for the exact transform "
        "(no 128-multiple divisor)"
    )


def exact_transform_pallas(
    blocks: jnp.ndarray, quality: int, bt: int = 512,
    interpret: bool = False,
):
    """(N, 8, 8)/(N, 64) int blocks -> (N, 64) int32 quantized zig-zag
    coefficients with double-float (reference-grade) rounding."""
    n = blocks.shape[0]
    x = blocks.reshape(n, 64).astype(jnp.int32).T  # (64, N)
    return exact_transform_pallas_cm(x, quality, bt, interpret).T


def exact_transform_pallas_cm(
    x_cm: jnp.ndarray, quality: int, bt: int = 512,
    interpret: bool = False, with_flags: bool = False,
):
    """(64, N) coefficient-major int pixels -> (64, N) int32 quantized
    zig-zag coefficients (double-float rounding), no transposes --
    feeds ops/pallas_encode2.py directly.

    with_flags=True additionally returns a (1, N) int32 per-block flag
    marking blocks whose rounding double-float arithmetic cannot certify
    against the float64 reference (callers recompute those on host to
    reach byte identity; see pallas_pipeline.compress_batch_pallas).
    """
    n = x_cm.shape[1]
    bt = _legal_bt(n, bt)
    call = _build(int(quality), int(bt), n, interpret, with_flags)
    return call(x_cm.astype(jnp.int32))


def exact_transform_pallas_u32(
    x32: jnp.ndarray, quality: int, bt: int = 512,
    interpret: bool = False, with_flags: bool = False,
):
    """(N, 16) uint32 word-packed blocks (transform.blockify_u32) ->
    (64, N) int32 quantized zig-zag coefficients, double-float rounding.

    Same math and outputs as :func:`exact_transform_pallas_cm`; the
    byte expansion + exact un-permutation + transpose run in-kernel, so
    the caller skips the XLA u8 blockify and the (N, 64) -> (64, N)
    int transpose.  Measured on v5e: the skipped XLA prep is ~0.55 ms
    per corpus pass but the in-kernel replacement (expand + exact 0/1
    permute matmul + in-VMEM transpose) costs most of it back -- net
    ~neutral end-to-end (1881 -> 1895 MP/s); kept because it also
    removes the prep from sharded (shard_map) bodies and halves the
    kernel's input DMA (u32 words vs widened int32).
    """
    n = x32.shape[0]
    bt = _legal_bt(n, bt)
    call = _build(int(quality), int(bt), n, interpret, with_flags,
                  from_u32=True)
    return call(x32)
