"""Coefficient-major fused Pallas encode kernel (v2).

Second-generation encode kernel.  v1 (ops/pallas_encode.py) is
block-major -- blocks on sublanes, zig-zag slots on lanes -- which makes
every per-slot packing step a (bt, 52)-lane masked OR and forces the
65-step emit chain to be fully unrolled; Mosaic stack-allocates the
unrolled chain's temporaries (~120 MB of scoped VMEM at bt=512), and the
measured cost is ~1.7 us/block, spill-bound.

v2 flips the layout to *coefficient-major*: zig-zag slots on sublanes,
blocks on lanes (the same layout as ops/pallas_exact.py).  Wins:

- every per-slot quantity (codeword, payload words, bit length, offset)
  is a full-width (1, bt) vector row -- lanes are always 100% utilized;
- the transform is still one MXU matmul: (64, 64) basis  x  (64, bt);
- slot payloads are staged to VMEM scratch, so the per-block packing
  loop is a rolled `fori_loop` with dynamic sublane reads -- no unrolled
  chain, register-resident (56, bt) accumulator, tiny VMEM stack;
- slot bit offsets come from one log-doubling exclusive cumsum along
  sublanes instead of a sequential carry.

Output is (64, n) uint32, column b = one block: rows 0..51 the packed
big-endian bit words, row 52 the block's total bit count, rows 53..63
zero.  The stream assembler (ops/pallas_place.py) consumes this
coefficient-major form directly.

Reference semantics (SURVEY 2.5-7/8): fast-mode f32 transform with
round-half-even quantization; byte-level conformance of the packed
payloads is pinned against the golden encoder in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from . import entropy as entropy_ops
from .pallas_encode import _category, _table_select
from .transform import _fast_encode_matrix

BLOCK_WORDS = entropy_ops.BLOCK_WORDS  # 52
SLOTS = 65  # DC + 63 AC + EOB
SROWS = 72  # slot scratch rows (SLOTS rounded up to a sublane multiple)
PACK_ROWS = 64  # output rows: 52 words + bits + 11 zero
EMIT_UNROLL = 5  # slots per fori_loop iteration (65 = 13 * 5)


def _make_kernel(quality: int, nb: int, bt: int, from_zz: bool):
    m_np, off_np = _fast_encode_matrix(quality)
    dc_comb, ac_comb, zp0, zp1, _ = entropy_ops._symbol_tables()
    eob_w0 = np.uint32(C.EOB_CODE << 28)

    assert np.all(off_np[1:] == 0.0)
    off0 = float(off_np[0])

    def kernel(x_ref, m_ref, out_ref, over_ref, carry_ref,
               sw0_ref, sw1_ref, soff_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            carry_ref[0] = 0
            over_ref[0, 0] = 0

        if from_zz:
            zz = x_ref[...]  # (64, bt) pre-quantized zig-zag
        else:
            x = x_ref[...].astype(jnp.float32)  # (64, bt)
            zzf = jnp.dot(
                m_ref[...], x, preferred_element_type=jnp.float32
            )
            row = jax.lax.broadcasted_iota(jnp.int32, (64, bt), 0)
            zzf = jnp.where(row == 0, zzf - off0, zzf)
            zz = jnp.round(zzf).astype(jnp.int32)

        # ---- DC DPCM along lanes with cross-tile carry ----------------
        dc = zz[0:1, :]  # (1, bt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)
        prev = pltpu.roll(dc, 1, 1)
        prev = jnp.where(lane == 0, carry_ref[0], prev)
        gidx = t * bt + lane
        prev = jnp.where(gidx % nb == 0, 0, prev)
        dc_diff = dc - prev
        carry_ref[0] = jnp.sum(jnp.where(lane == bt - 1, dc, 0))

        def mag_bits(v, s):
            mask = (jnp.int32(1) << s) - 1
            return ((v - (v < 0)) & mask).astype(jnp.uint32)

        # ---- DC slot ---------------------------------------------------
        cat = _category(jnp.abs(dc_diff))
        over = jnp.max((cat > 11).astype(jnp.int32))
        cat = jnp.minimum(cat, 11)
        comb = _table_select(cat, dc_comb)
        code = comb >> jnp.uint32(8)
        clen = (comb & jnp.uint32(0xFF)).astype(jnp.int32)
        val = (code << cat.astype(jnp.uint32)) | mag_bits(dc_diff, cat)
        dc_bits = clen + cat  # (1, bt), in [2, 20]
        dc_w0 = val << (jnp.uint32(32) - dc_bits.astype(jnp.uint32))

        # ---- AC slots (sublane-vectorized over 63 positions) ----------
        ac = zz[1:64, :]  # (63, bt)
        nzm = ac != 0
        posr = jax.lax.broadcasted_iota(jnp.int32, (63, bt), 0)
        marked = jnp.where(nzm, posr, -1)
        run_prev = marked
        for d in (1, 2, 4, 8, 16, 32):
            rolled = pltpu.roll(run_prev, d, 0)
            rolled = jnp.where(posr >= d, rolled, -1)
            run_prev = jnp.maximum(run_prev, rolled)
        excl = pltpu.roll(run_prev, 1, 0)
        excl = jnp.where(posr == 0, -1, excl)
        run = posr - excl - 1
        s = _category(jnp.abs(ac))
        over = jnp.maximum(
            over,
            jnp.max((jnp.where(nzm, s, 0) > 10).astype(jnp.int32)),
        )
        s = jnp.minimum(s, 10)
        r = run & 15
        z = jnp.clip(run >> 4, 0, 3)
        idx = jnp.clip(r * 11 + s, 0, 175)
        comb = _table_select(idx, ac_comb)
        code = comb >> jnp.uint32(8)
        clen = (comb & jnp.uint32(0xFF)).astype(jnp.int32)
        val = (code << s.astype(jnp.uint32)) | mag_bits(ac, s)
        vlen = clen + s
        plen = z * 11
        end = plen + vlen  # <= 59
        e2 = end - 32
        left = jnp.clip(32 - end, 0, 31).astype(jnp.uint32)
        right = jnp.clip(e2, 0, 31).astype(jnp.uint32)
        w1sh = jnp.clip(32 - e2, 0, 31).astype(jnp.uint32)
        in_w0 = jnp.where(e2 <= 0, val << left, val >> right)
        in_w1 = jnp.where(e2 <= 0, jnp.uint32(0), val << w1sh)
        pz0 = _table_select(z, zp0)
        pz1 = _table_select(z, zp1)
        nz_u = nzm.astype(jnp.uint32)
        ac_w0 = (pz0 | in_w0) * nz_u
        ac_w1 = (pz1 | in_w1) * nz_u
        ac_bits = jnp.where(nzm, end, 0)

        over_ref[0, 0] = jnp.maximum(over_ref[0, 0], over)

        # ---- stage slot payloads + exclusive offset cumsum -------------
        zrow = jnp.zeros((SROWS - SLOTS, bt), jnp.uint32)
        sw0_ref[...] = jnp.concatenate(
            [dc_w0, ac_w0, jnp.full((1, bt), eob_w0, jnp.uint32), zrow],
            axis=0,
        )
        sw1_ref[...] = jnp.concatenate(
            [jnp.zeros((1, bt), jnp.uint32), ac_w1,
             jnp.zeros((1, bt), jnp.uint32), zrow],
            axis=0,
        )
        slen = jnp.concatenate(
            [dc_bits, ac_bits, jnp.full((1, bt), C.EOB_LEN, jnp.int32),
             zrow.astype(jnp.int32)],
            axis=0,
        )  # (SROWS, bt)
        srow = jax.lax.broadcasted_iota(jnp.int32, (SROWS, bt), 0)
        csum = slen
        for d in (1, 2, 4, 8, 16, 32, 64):
            rolled = pltpu.roll(csum, d, 0)
            csum = csum + jnp.where(srow >= d, rolled, 0)
        soff_ref[...] = csum - slen  # exclusive; row SLOTS = total bits

        # ---- per-block packing: rolled emit loop ------------------------
        sub56 = jax.lax.broadcasted_iota(jnp.int32, (56, bt), 0)

        def emit(i, acc):
            for j in range(EMIT_UNROLL):
                k = i * EMIT_UNROLL + j
                w0 = sw0_ref[pl.ds(k, 1), :]
                w1 = sw1_ref[pl.ds(k, 1), :]
                off = soff_ref[pl.ds(k, 1), :]
                sh = (off & 31).astype(jnp.uint32)
                nsh = ((32 - (off & 31)) & 31).astype(jnp.uint32)
                has = (off & 31) > 0
                c0 = w0 >> sh
                c1 = jnp.where(has, w0 << nsh, jnp.uint32(0)) | (w1 >> sh)
                c2 = jnp.where(has, w1 << nsh, jnp.uint32(0))
                tgt = off >> 5  # (1, bt)
                acc = (
                    acc
                    | jnp.where(sub56 == tgt, c0, jnp.uint32(0))
                    | jnp.where(sub56 == tgt + 1, c1, jnp.uint32(0))
                    | jnp.where(sub56 == tgt + 2, c2, jnp.uint32(0))
                )
            return acc

        acc = jax.lax.fori_loop(
            0, SLOTS // EMIT_UNROLL, emit,
            jnp.zeros((56, bt), jnp.uint32),
        )

        total = soff_ref[SLOTS : SLOTS + 1, :].astype(jnp.uint32)
        out_ref[...] = jnp.concatenate(
            [acc[:BLOCK_WORDS], total,
             jnp.zeros((PACK_ROWS - BLOCK_WORDS - 1, bt), jnp.uint32)],
            axis=0,
        )

    return kernel


@functools.cache
def _build_call(quality: int, nb: int, bt: int, n: int,
                interpret: bool, from_zz: bool):
    assert SLOTS % EMIT_UNROLL == 0
    kernel = _make_kernel(quality, nb, bt, from_zz)
    grid_spec = pl.GridSpec(
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((64, bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((PACK_ROWS, bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((SROWS, bt), jnp.uint32),
            pltpu.VMEM((SROWS, bt), jnp.uint32),
            pltpu.VMEM((SROWS, bt), jnp.int32),
        ],
    )
    m_np, _ = _fast_encode_matrix(quality)
    m_t = np.ascontiguousarray(m_np.T)
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
    )

    def call(x_cm):  # (64, N) int32 coefficient-major
        packed, over = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((PACK_ROWS, n), jnp.uint32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            compiler_params=params,
            interpret=interpret,
        )(x_cm.astype(jnp.int32), jnp.asarray(m_t))
        return packed, over[0, 0] > 0

    return call


def encode_pallas_cm(
    blocks_cm: jnp.ndarray,
    quality: int,
    nb: int,
    bt: int = 1024,
    interpret: bool = False,
    from_zz: bool = False,
):
    """(64, N) coefficient-major pixels (or zig-zag coefficients with
    from_zz=True) -> ((64, N) packed uint32, overflow bool).

    Row 52 of the packed output is the per-block bit count.  nb: blocks
    per image (DC predictor reset period); N must be a multiple of bt.
    """
    n = blocks_cm.shape[1]
    if n % bt:
        raise ValueError(f"N={n} not a multiple of tile {bt}")
    call = _build_call(int(quality), int(nb), int(bt), n, interpret,
                       from_zz)
    return call(blocks_cm)
