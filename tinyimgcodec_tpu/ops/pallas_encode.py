"""Fused Pallas encode kernel: pixel blocks -> packed per-block bitstreams.

One VMEM-resident pass per tile of BT blocks runs the whole encode
pipeline -- level shift, 2-D DCT, quantization, zig-zag, DC DPCM,
RLE/Huffman symbolization, per-block bit packing -- realizing the
BASELINE north star's "fused Pallas kernel over HBM-resident batched 8x8
block tensors".

Design notes (shaped by measured TPU/Mosaic constraints):

- *Block-major layout*: tiles are (BT, 64) with the block index on
  sublanes, so the DCT is a single MXU matmul against the fused
  (64, 64) transform matrix (DCT basis x 1/divisor, zig-zag column
  order, level shift folded into a per-column offset).
- *No gathers*: Mosaic has no per-lane dynamic gather, and XLA's gather
  runs at ~128 M elements/s on this chip -- the Huffman (run, size) ->
  (code, length) lookup is a compare-select chain over the 176-entry
  table, executed entirely in registers/VMEM.  Table entries are static
  Python constants baked into the instruction stream.
- *Column-chunk skipping*: natural images concentrate nonzero
  coefficients in early zig-zag positions, so symbol work for all-zero
  trailing position chunks is skipped dynamically (@pl.when).
- *Sequential grid*: the DC predictor carries across tiles in SMEM (TPU
  grid steps run in order); a static ``nb`` parameter resets it at image
  boundaries for batch encode.
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
from .transform import _fast_encode_matrix

BLOCK_WORDS = entropy_ops.BLOCK_WORDS  # 52
# The packed output carries the per-block bit count as an extra column
# (53), padded to 56: a separate (N, 1) bits output tempts XLA's memory
# space assignment into stack-allocating the (lane-padded) result tuple
# in VMEM, which OOMs the 16 MB scoped limit at corpus scale.
PACK_COLS = 56
AC_CHUNK = 8  # zig-zag positions per dynamically-skippable chunk


def _category(v_abs_i32):
    """Bit length of |v| via the float32 exponent (|v| <= 2**15 exact)."""
    f = v_abs_i32.astype(jnp.float32)
    bits = pltpu.bitcast(f, jnp.uint32)
    e = (bits >> jnp.uint32(23)).astype(jnp.int32) - 126
    return jnp.where(v_abs_i32 > 0, e, 0)


def _table_select(idx, table):
    """comb = table[idx] as a compare-select chain (no gather HW path).

    table: numpy uint32 array; idx: int32 array.  Entries equal to the
    most common value are folded into the initializer to shorten the
    chain.
    """
    vals, counts = np.unique(table, return_counts=True)
    base = np.uint32(vals[np.argmax(counts)])
    acc = jnp.full(idx.shape, base, jnp.uint32)
    for e, t in enumerate(table):
        if np.uint32(t) != base:
            acc = jnp.where(idx == e, jnp.uint32(t), acc)
    return acc


def _make_kernel(quality: int, nb: int, bt: int, from_zz: bool = False):
    m_np, off_np = _fast_encode_matrix(quality)
    dc_comb, ac_comb, zp0, zp1, zlen = entropy_ops._symbol_tables()
    eob_w0 = np.uint32(C.EOB_CODE << 28)

    # level-shift offset: only the DC (zig-zag 0) column has a nonzero
    # basis sum, so the correction is a scalar on column 0
    assert np.all(off_np[1:] == 0.0)
    off0 = float(off_np[0])

    def kernel(x_ref, m_ref, packed_ref, over_ref, carry_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            carry_ref[0] = 0
            over_ref[0, 0] = 0

        if from_zz:
            # coefficients already quantized (e.g. by the XLA double-float
            # exact transform); this kernel only symbolizes and packs
            zz = x_ref[...]
        else:
            # ---- transform: one MXU matmul does DCT+quant+zigzag ------
            x = x_ref[...].astype(jnp.float32)      # (BT, 64)
            zzf = jnp.dot(
                x, m_ref[...], preferred_element_type=jnp.float32
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (bt, 64), 1)
            zzf = jnp.where(col == 0, zzf - off0, zzf)
            zz = jnp.round(zzf).astype(jnp.int32)

        # ---- DC DPCM with cross-tile carry + image-boundary reset -----
        dc = zz[:, 0:1]                              # (BT, 1)
        shifted = jnp.concatenate([dc[:1] * 0, dc[:-1]], axis=0)
        sub = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
        prev = jnp.where(sub == 0, carry_ref[0], shifted)
        gidx = t * bt + sub
        prev = jnp.where(gidx % nb == 0, 0, prev)
        dc_diff = dc - prev
        carry_ref[0] = dc[bt - 1, 0]

        def mag_bits(v, s):
            mask = (jnp.int32(1) << s) - 1
            return ((v - (v < 0)) & mask).astype(jnp.uint32)

        over = jnp.zeros((bt, 1), jnp.int32)

        # ---- DC slot ---------------------------------------------------
        cat = _category(jnp.abs(dc_diff))
        over = over | (cat > 11).astype(jnp.int32)
        cat = jnp.minimum(cat, 11)
        comb = _table_select(cat, dc_comb)
        code = comb >> jnp.uint32(8)
        clen = (comb & jnp.uint32(0xFF)).astype(jnp.int32)
        val = (code << cat.astype(jnp.uint32)) | mag_bits(dc_diff, cat)
        dc_bits = clen + cat                        # in [2, 20]
        dc_w0 = val << (jnp.uint32(32) - dc_bits.astype(jnp.uint32))

        # ---- AC slots (vectorized across all 63 positions) -------------
        ac = zz[:, 1:]                               # (BT, 63)
        nzm = ac != 0
        posc = jax.lax.broadcasted_iota(jnp.int32, (bt, 63), 1)
        marked = jnp.where(nzm, posc, -1)
        # exclusive cummax along lanes via doubling shifts
        run_prev = marked
        for d in (1, 2, 4, 8, 16, 32):
            rolled = pltpu.roll(run_prev, d, 1)
            rolled = jnp.where(posc >= d, rolled, -1)
            run_prev = jnp.maximum(run_prev, rolled)
        # run_prev is INCLUSIVE cummax; exclusive = shift right by one
        excl = pltpu.roll(run_prev, 1, 1)
        excl = jnp.where(posc == 0, -1, excl)
        run = posc - excl - 1
        s = _category(jnp.abs(ac))
        over = over | jnp.any(
            jnp.where(nzm, s, 0) > 10, axis=1, keepdims=True
        ).astype(jnp.int32)
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
        end = plen + vlen                            # <= 59
        e2 = end - 32
        left = jnp.clip(32 - end, 0, 31).astype(jnp.uint32)
        right = jnp.clip(e2, 0, 31).astype(jnp.uint32)
        w1sh = jnp.clip(32 - e2, 0, 31).astype(jnp.uint32)
        in_w0 = jnp.where(e2 <= 0, val << left, val >> right)
        in_w1 = jnp.where(e2 <= 0, jnp.uint32(0), val << w1sh)
        # ZRL prefixes are z repetitions of the 11-bit ZRL code
        pz0 = _table_select(z, zp0)
        pz1 = _table_select(z, zp1)
        nz_u = nzm.astype(jnp.uint32)
        ac_w0 = (pz0 | in_w0) * nz_u
        ac_w1 = (pz1 | in_w1) * nz_u
        ac_bits = jnp.where(nzm, end, 0)

        over_ref[0, 0] = jnp.maximum(over_ref[0, 0], jnp.max(over))

        # ---- per-block packing into (BT, 52) word columns --------------
        # slot order: DC, AC positions 0..62, EOB
        lane52 = jax.lax.broadcasted_iota(jnp.int32, (bt, BLOCK_WORDS), 1)

        def emit(words, offset, w0c, w1c, bc):
            sh = (offset & 31).astype(jnp.uint32)
            nsh = ((32 - (offset & 31)) & 31).astype(jnp.uint32)
            has_sh = (offset & 31) > 0
            c0 = w0c >> sh
            c1 = jnp.where(has_sh, w0c << nsh, jnp.uint32(0)) | (w1c >> sh)
            c2 = jnp.where(has_sh, w1c << nsh, jnp.uint32(0))
            tgt = offset >> 5
            skip = bc == 0
            add = (
                jnp.where((lane52 == tgt) & ~skip, c0, jnp.uint32(0))
                | jnp.where((lane52 == tgt + 1) & ~skip, c1, jnp.uint32(0))
                | jnp.where((lane52 == tgt + 2) & ~skip, c2, jnp.uint32(0))
            )
            return words | add, offset + bc

        words = jnp.zeros((bt, BLOCK_WORDS), jnp.uint32)
        words, offset = emit(
            words, jnp.zeros((bt, 1), jnp.int32), dc_w0,
            jnp.zeros_like(dc_w0), dc_bits,
        )
        for k in range(63):
            words, offset = emit(
                words, offset, ac_w0[:, k : k + 1], ac_w1[:, k : k + 1],
                ac_bits[:, k : k + 1],
            )
        words, offset = emit(
            words, offset,
            jnp.full((bt, 1), eob_w0, jnp.uint32),
            jnp.zeros((bt, 1), jnp.uint32),
            jnp.full((bt, 1), C.EOB_LEN, jnp.int32),
        )

        packed_ref[...] = jnp.concatenate(
            [
                words,
                offset.astype(jnp.uint32),
                jnp.zeros((bt, PACK_COLS - BLOCK_WORDS - 1), jnp.uint32),
            ],
            axis=1,
        )

    return kernel


@functools.cache
def _build_call(quality: int, nb: int, bt: int, n: int,
                interpret: bool = False, from_zz: bool = False):
    kernel = _make_kernel(quality, nb, bt, from_zz)
    grid_spec = pl.GridSpec(
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, 64), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, PACK_COLS), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    m_np, _ = _fast_encode_matrix(quality)

    # The fully-unrolled 65-step emit chain keeps many (bt, 128)-padded
    # temporaries live; Mosaic stack-allocates them in scoped VMEM, so
    # raise the default 16 MB scoped limit (VMEM is 128 MB on v5e).
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    def call(x):  # (N, 64) int32/uint8
        packed, over = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n, PACK_COLS), jnp.uint32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            compiler_params=params,
            interpret=interpret,
        )(x.astype(jnp.int32), jnp.asarray(m_np))
        words = packed[:, :BLOCK_WORDS]
        bits = packed[:, BLOCK_WORDS].astype(jnp.int32)
        return words, bits, over[0, 0] > 0

    return call


def encode_pallas(
    blocks: jnp.ndarray,
    quality: int,
    nb: int,
    bt: int = 512,
    interpret: bool = False,
    from_zz: bool = False,
):
    """(N, 8, 8) or (N, 64) int blocks -> (words (N,52), bits (N,), overflow).

    nb: blocks per image (the DC predictor resets every nb blocks).
    N must be a multiple of bt.  Fast (f32) transform semantics, or
    from_zz=True to feed pre-quantized zig-zag coefficients (exact mode:
    the double-float XLA transform produces zz, this kernel does the
    entropy stage).
    """
    n = blocks.shape[0]
    if n % bt:
        raise ValueError(f"N={n} not a multiple of tile {bt}")
    x = blocks.reshape(n, 64)
    call = _build_call(int(quality), int(nb), int(bt), n, interpret,
                       from_zz)
    return call(x)
