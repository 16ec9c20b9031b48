"""Coefficient-major fused Pallas encode kernel (v2/v3).

Second-generation encode kernel.  v1 (ops/pallas_encode.py) is
block-major -- blocks on sublanes, zig-zag slots on lanes -- which makes
every per-slot packing step a (bt, 52)-lane masked OR and forces the
65-step emit chain to be fully unrolled; Mosaic stack-allocates the
unrolled chain's temporaries (~120 MB of scoped VMEM at bt=512), and the
measured cost is ~1.7 us/block, spill-bound.

This kernel computes in *coefficient-major* -- zig-zag slots on
sublanes, blocks on lanes (the layout of ops/pallas_exact.py):

- every per-slot quantity (codeword, payload words, bit length, offset)
  is a full-width (1, bt) vector row -- lanes are always 100% utilized;
- the transform is one MXU matmul; fast mode ingests uint8 block-major
  tiles straight from ``blockify`` (4x less input DMA than int32) and
  transposes the matmul result in VMEM;
- slot payloads are staged to VMEM scratch, so the per-block packing
  loop is a rolled `fori_loop` with dynamic sublane reads -- no unrolled
  chain, register-resident (56, bt) accumulator, tiny VMEM stack;
- slot bit offsets come from one log-doubling exclusive cumsum along
  sublanes instead of a sequential carry;
- **global stream offsets are computed in-kernel** (a lane cumsum of
  per-block bit counts plus an SMEM carry across sequential grid steps,
  byte-aligned at image boundaries), and every block's packed words are
  emitted *already bit-shifted to their final stream alignment*.  The
  stream assembler (ops/pallas_place.py) is left with pure word
  placement.

Outputs: (N, 56) uint32 block-major pre-shifted big-endian stream words
(col 52+ may carry spill from the alignment shift), plus a lanes-major
(2, N) uint32 sidecar with row 0 = each block's global stream bit
offset and row 1 = its bit count.  (Block metadata must not live in
columns of the big array: a column slice of an (N, 64) tiled layout
costs ~45 ms at corpus scale on v5e -- strided reads touch every tile.)

Reference semantics (SURVEY 2.5-7/8): fast-mode f32 transform with
round-half-even quantization; conformance is pinned end-to-end against
the golden encoder in tests/test_pallas.py.
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
ROW_WORDS = 56  # pre-shifted stream words per block (52 + spill + pad)
# Slots per emit iteration.  The emit loop's trip count is DYNAMIC:
# slots past the tile's last nonzero coefficient carry no payload, so
# the loop stops at ceil((last_nz + 2) / EMIT_UNROLL) and EOB (slot 64)
# is placed by one static step -- typically ONE iteration at quality 50.
# Measured on v5e (corpus q=50 full pipeline): EU 8/16/32/64 ->
# 5.09/4.86/4.79/4.80 ms; wide unrolls amortize the per-iteration band
# gating (EMIT_CHUNK below) without reviving the v1 unrolled-chain VMEM
# stack blowup because contributions accumulate into 8-row bands.
EMIT_UNROLL = 32  # must divide SLOTS - 1 (the 64 non-EOB slots)
EMIT_CHUNK = 8    # accumulator band rows; must divide ROW_WORDS
# band heights 4/14/28 measured worse (5.50/5.16/5.43 ms at EU=8)


def _u32_perm() -> np.ndarray:
    """Pixel permutation of the u32-packed input mode.

    ``blockify_u32`` ships each block as 16 uint32 words; the kernel
    expands them to 64 lanes by tiling the 16 words four times and
    extracting byte ``lane // 16`` -- so lane l carries pixel
    ``(l % 16) * 4 + l // 16`` (little-endian byte order).  The encode
    matrix is row-permuted to match, making the math identical to the
    byte-layout path.
    """
    lanes = np.arange(64)
    return (lanes % 16) * 4 + lanes // 16


def _make_kernel(quality: int, nb: int, bt: int, from_zz: bool,
                 img_w: int = 0, from_u32: bool = False):
    m_np, off_np = _fast_encode_matrix(quality)
    dc_comb, ac_comb, zp0, zp1, _ = entropy_ops._symbol_tables()
    eob_w0 = np.uint32(C.EOB_CODE << 28)

    assert np.all(off_np[1:] == 0.0)
    off0 = float(off_np[0])
    assert bt <= nb, "a tile must not span more than one image boundary"

    def kernel(x_ref, m_ref, out_ref, meta_ref, over_ref, carry_ref,
               sw0_ref, sw1_ref, soff_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            carry_ref[0] = 0  # DC predictor
            carry_ref[1] = 0  # global stream bit offset
            over_ref[0, 0] = 0

        if from_zz:
            zz = x_ref[...]  # (64, bt) pre-quantized zig-zag
        else:
            if from_u32:
                # u32-packed blocks (bt, 16): tile the 16 words across
                # 64 lanes and extract one byte per lane (the pixel
                # permutation this induces is folded into m above, so
                # bytes out are identical to the uint8-layout path).
                # Motivation: the host-side blockify transpose then
                # moves 4-byte words, 8x coarser than a uint8 shuffle.
                # m_ref is stacked [P; m]: P is a 0/1 un-permutation
                # matrix restoring natural pixel order with one EXACT
                # matmul (single term per output, no rounding), so the
                # main matmul keeps its summation order and fast-mode
                # bytes stay bit-identical to the uint8-layout path.
                x32 = x_ref[...]  # (bt, 16) uint32
                xt = pltpu.repeat(x32, 4, 1)  # (bt, 64) lane-tiled
                lane = jax.lax.broadcasted_iota(jnp.int32, (bt, 64), 1)
                sh = ((lane // 16) * 8).astype(jnp.uint32)
                xp = ((xt >> sh) & jnp.uint32(0xFF)).astype(
                    jnp.int32
                ).astype(jnp.float32)  # Mosaic lacks u32->f32 casts
                x = jnp.dot(xp, m_ref[0:64, :],
                            preferred_element_type=jnp.float32)
            elif img_w:
                # fused blockify from raw image rows: interpret-mode
                # only -- Mosaic cannot lower the 4-D relayout
                # ("unsupported shape cast"); kept as the oracle for
                # the u32 path and for possible future Mosaic support.
                r = bt * 64 // img_w
                raw = x_ref[...]  # (r, img_w) uint8
                x4 = raw.reshape(r // 8, 8, img_w // 8, 8)
                x = jnp.transpose(x4, (0, 2, 1, 3)).reshape(bt, 64)
                x = x.astype(jnp.int32).astype(jnp.float32)
            else:
                x = x_ref[...].astype(jnp.int32).astype(jnp.float32)
            mm = m_ref[64:128, :] if from_u32 else m_ref[...]
            y = jnp.dot(  # (bt, 64) block-major
                x, mm, preferred_element_type=jnp.float32
            )
            zzf = y.T  # (64, bt) coefficient-major
            row = jax.lax.broadcasted_iota(jnp.int32, (64, bt), 0)
            zzf = jnp.where(row == 0, zzf - off0, zzf)
            zz = jnp.round(zzf).astype(jnp.int32)

        # ---- DC DPCM along lanes with cross-tile carry ----------------
        dc = zz[0:1, :]  # (1, bt)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)
        prev = pltpu.roll(dc, 1, 1)
        prev = jnp.where(lane == 0, carry_ref[0], prev)
        gidx = t * bt + lane
        boundary = gidx % nb == 0  # (1, bt); at most one True (bt <= nb)
        prev = jnp.where(boundary, 0, prev)
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
        # slot-offset exclusive cumsum: 7 log-doubling rolls over the
        # (72, bt) scratch.  Two alternatives measured on a v5e and
        # reverted (reports/perf_breakdown_r04.md): band-gating by the
        # tile's last-nonzero bound (neutral fast, 14% worse exact --
        # per-band lax.conds cost more than the skipped rolls), and a
        # lower-triangular bf16 MXU matmul tri @ slen (bit-exact, but
        # neutral: 3671 vs ~3700 MP/s -- the staging writes, not the
        # rolls, are this block's cost).
        last = jnp.max(jnp.where(nzm, posr, -1))
        srow = jax.lax.broadcasted_iota(jnp.int32, (SROWS, bt), 0)
        csum = slen
        for d in (1, 2, 4, 8, 16, 32, 64):
            rolled = pltpu.roll(csum, d, 0)
            csum = csum + jnp.where(srow >= d, rolled, 0)
        soff_ref[...] = csum - slen  # exclusive; row SLOTS = total bits

        # ---- global stream offsets (lane cumsum + SMEM carry) ----------
        blk_bits = csum[SLOTS : SLOTS + 1, :] - slen[SLOTS : SLOTS + 1, :]
        inc = blk_bits
        d = 1
        while d < bt:
            rolled = pltpu.roll(inc, d, 1)
            inc = inc + jnp.where(lane >= d, rolled, 0)
            d *= 2
        pre = carry_ref[1] + inc - blk_bits  # exclusive global offsets
        # byte-align the image boundary (at most one per tile)
        cb = jnp.sum(jnp.where(boundary, pre, 0))
        has_b = jnp.max(boundary.astype(jnp.int32))
        delta = jnp.where(has_b > 0, ((cb + 7) & ~7) - cb, 0)
        b_lane = jnp.sum(jnp.where(boundary, lane, 0))
        off = pre + jnp.where(
            (lane >= b_lane) & (has_b > 0), delta, 0
        )  # (1, bt)
        carry_ref[1] = carry_ref[1] + jnp.sum(blk_bits) + delta

        # ---- per-block packing: rolled emit loop, globally aligned -----
        shblk = off & 31  # (1, bt): block's bit phase within its word

        # The accumulator is chunked into CHW-row bands, each updated
        # only when an iteration's slot targets can fall inside it.
        # Targets are block-LOCAL word offsets (tgt = slot bit offset
        # within the block's own payload >> 5), so a typical q=50 block
        # (~40-300 bits) touches rows 0..2-10 of the 56-row layout --
        # the upper bands exist for the worst legal block (1662 bits)
        # and are dead almost always.  Per-iteration scalar bounds from
        # the monotone slot-offset cumsum gate each band with lax.cond.
        CHW = EMIT_CHUNK
        NCH = ROW_WORDS // CHW
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (CHW, bt), 0)

        def slot_parts(k):
            w0 = sw0_ref[pl.ds(k, 1), :]
            w1 = sw1_ref[pl.ds(k, 1), :]
            so = soff_ref[pl.ds(k, 1), :] + shblk
            sh = (so & 31).astype(jnp.uint32)
            nsh = ((32 - (so & 31)) & 31).astype(jnp.uint32)
            has = (so & 31) > 0
            c0 = w0 >> sh
            c1 = jnp.where(has, w0 << nsh, jnp.uint32(0)) | (w1 >> sh)
            c2 = jnp.where(has, w1 << nsh, jnp.uint32(0))
            tgt = so >> 5  # (1, bt)
            return c0, c1, c2, tgt

        def chunk_update(parts, accs, lo, hi):
            """OR slot contributions into the bands [lo, hi) overlap."""
            out = []
            for c in range(NCH):
                active = (hi >= c * CHW) & (lo < (c + 1) * CHW)

                def upd(acc_c=accs[c], base=c * CHW):
                    a = acc_c
                    for c0, c1, c2, tgt in parts:
                        rel = tgt - base
                        a = (
                            a
                            | jnp.where(sub8 == rel, c0, jnp.uint32(0))
                            | jnp.where(sub8 == rel + 1, c1,
                                        jnp.uint32(0))
                            | jnp.where(sub8 == rel + 2, c2,
                                        jnp.uint32(0))
                        )
                    return a

                out.append(jax.lax.cond(
                    active, upd, lambda acc_c=accs[c]: acc_c
                ))
            return tuple(out)

        def emit(i, accs):
            k0 = i * EMIT_UNROLL
            parts = [slot_parts(k0 + j) for j in range(EMIT_UNROLL)]
            # scalar row bounds for this iteration's slots: soff is
            # monotone over slots, so rows span [min tgt(k0),
            # max tgt(k0 + EU - 1) + 2] across all lanes
            lo = jnp.min(soff_ref[pl.ds(k0, 1), :] + shblk) >> 5
            hi = (
                jnp.max(soff_ref[pl.ds(k0 + EMIT_UNROLL, 1), :] + shblk)
                >> 5
            ) + 2
            return chunk_update(parts, accs, lo, hi)

        # dynamic trip count: slots past the tile's last nonzero AC
        # coefficient have zero payload rows, so the loop stops there
        # (~4 iterations at quality 50 instead of 64/EMIT_UNROLL); EOB
        # (slot 64, always present) is placed by one static step.
        nit = (last + 2 + EMIT_UNROLL - 1) // EMIT_UNROLL
        accs = jax.lax.fori_loop(
            0, nit, emit,
            tuple(
                jnp.zeros((CHW, bt), jnp.uint32) for _ in range(NCH)
            ),
        )
        eob = slot_parts(SLOTS - 1)
        lo = jnp.min(soff_ref[pl.ds(SLOTS - 1, 1), :] + shblk) >> 5
        hi = (
            jnp.max(soff_ref[pl.ds(SLOTS - 1, 1), :] + shblk) >> 5
        ) + 2
        accs = chunk_update([eob], accs, lo, hi)
        acc = jnp.concatenate(list(accs), axis=0)

        out_ref[...] = acc.T
        meta_ref[...] = jnp.concatenate(
            [off.astype(jnp.uint32), blk_bits.astype(jnp.uint32)],
            axis=0,
        )

    return kernel


@functools.cache
def _build_call(quality: int, nb: int, bt: int, n: int,
                interpret: bool, from_zz: bool, img_w: int = 0,
                from_u32: bool = False):
    assert (SLOTS - 1) % EMIT_UNROLL == 0  # EOB is placed statically
    kernel = _make_kernel(quality, nb, bt, from_zz, img_w, from_u32)
    if from_u32:
        in_dtype = jnp.uint32
    elif from_zz:
        in_dtype = jnp.int32
    else:
        in_dtype = jnp.uint8
    if from_u32:
        in_spec = pl.BlockSpec((bt, 16), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)
    elif img_w:
        rows = bt * 64 // img_w
        in_spec = pl.BlockSpec((rows, img_w), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)
    elif from_zz:
        in_spec = pl.BlockSpec((64, bt), lambda t: (0, t),
                               memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec((bt, 64), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)
    m_rows = 128 if from_u32 else 64
    grid_spec = pl.GridSpec(
        grid=(n // bt,),
        in_specs=[
            in_spec,
            pl.BlockSpec((m_rows, 64), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, ROW_WORDS), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),
            pltpu.VMEM((SROWS, bt), jnp.uint32),
            pltpu.VMEM((SROWS, bt), jnp.uint32),
            pltpu.VMEM((SROWS, bt), jnp.int32),
        ],
    )
    m_np, _ = _fast_encode_matrix(quality)
    if from_u32:
        perm_np = np.zeros((64, 64), np.float64)
        perm_np[np.arange(64), _u32_perm()] = 1.0
        m_np = np.concatenate([perm_np, m_np], axis=0)  # [P; m]
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
    )

    def call(x):
        packed, meta, over = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n, ROW_WORDS), jnp.uint32),
                jax.ShapeDtypeStruct((2, n), jnp.uint32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            compiler_params=params,
            interpret=interpret,
        )(x.astype(in_dtype), jnp.asarray(m_np, jnp.float32))
        return packed, meta, over[0, 0] > 0

    return call


def encode_pallas2(
    blocks: jnp.ndarray,
    quality: int,
    nb: int,
    bt: int = 1024,
    interpret: bool = False,
    from_zz: bool = False,
    img_w: int = 0,
    from_u32: bool = False,
):
    """Fused encode to stream-aligned block rows.

    blocks: (N, 64) uint8 block-major pixels (fast mode), (64, N) int32
    coefficient-major quantized zig-zag coefficients (from_zz=True,
    e.g. from ops/pallas_exact.py), or -- with img_w set -- raw image
    rows (N * 64 / img_w, img_w) uint8, blockified inside the kernel
    (saves the standalone HBM->HBM blockify pass; requires
    bt * 64 % img_w == 0, i.e. tiles cover whole 8-row bands).

    Returns ((N, 56) uint32 packed rows, (2, N) uint32 meta, overflow
    bool): packed rows hold each block's stream words already shifted to
    their global bit alignment; meta row 0 is the global bit offset, row
    1 the bit count.  nb: blocks per image (DC reset + byte-aligned
    image boundaries).  N must be a multiple of bt and bt <= nb.
    """
    if img_w:
        if from_zz or from_u32:
            raise ValueError("img_w excludes from_zz/from_u32")
        if (bt * 64) % img_w or img_w % 8:
            raise ValueError("tile must cover whole 8-row image bands")
        n = blocks.shape[0] * img_w // 64
    elif from_u32:
        if from_zz:
            raise ValueError("from_u32 and from_zz are mutually exclusive")
        n = blocks.shape[0]
    else:
        n = blocks.shape[1] if from_zz else blocks.shape[0]
    if n % bt:
        raise ValueError(f"N={n} not a multiple of tile {bt}")
    call = _build_call(int(quality), int(nb), int(bt), n, interpret,
                       from_zz, int(img_w), bool(from_u32))
    return call(blocks)
