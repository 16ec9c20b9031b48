"""Device (XLA) chunk-parallel entropy decode of TICX-indexed streams.

The reference decoder walks one serial bit cursor through the whole
payload (reference huffman.py:66-74: bit-at-a-time prefix match inside a
per-block loop) -- the decode hot loop and THE parallelization obstacle
(SURVEY 3.2).  The TICX trailer removes the obstacle: it records the
exact payload bit offset of every ``stride``-th block, so a stream is
``C = ceil(nb/stride)`` independently decodable chunks.

This module decodes all chunks of a whole batch of streams AT ONCE on
the accelerator, with no Huffman LUT and no per-symbol host work:

1. **Chain following** (the only serial part, vectorized across chunks):
   every chunk carries a bit cursor; one ``lax.while_loop`` step decodes
   one symbol PER CHUNK -- a 2-word gather at each cursor, a 32-bit
   window build, and the canonical-code length computation done as 16
   broadcast compares against the per-length ``maxcode`` table (T.81
   Annex F.2.2.3's sequential loop, flattened into vector ops -- no
   LUT, no gather).  Steps run until every chunk has finished its
   blocks; each step records (window, kind) per chunk.
2. **Value decode** (fully parallel over all recorded slots): category /
   (run, size) from the same compare scheme, magnitude bits straight
   from the recorded windows, JPEG one's-complement sign extension
   (reference bitbuffer.py:61-65 semantics).
3. **Reassembly** (parallel scans): per-chunk running block counter
   (cumsum of DC slots) + intra-block zig-zag position via a
   reset-at-DC segmented cumsum (cummax trick), then one scatter into
   the ``(nb_total, 64)`` coefficient tensor.

Validation is explicit: a chunk is ``ok`` only if it decoded exactly its
block count, every coefficient landed in [0, 63], and its final cursor
lands exactly on the next chunk's recorded offset (or inside the final
byte-alignment pad).  Corrupt streams therefore degrade loudly to the
host decoder per image instead of silently mis-decoding (the reference's
graceful-degradation contract, codec.py:178-186, stays with the host
oracle).

Standard-table streams only -- the same constraint as the TICX trailer
itself (custom-table streams never carry one, docs/FORMAT.md).
"""

from __future__ import annotations

import functools

import numpy as np

from ..constants import (
    AC_BITS,
    AC_HUFFVAL,
    DC_BITS,
    DC_HUFFVAL,
)

# absolute per-block symbol bound: 1 DC + 63 AC values + <=3 ZRL + EOB
MAX_BLOCK_SYMBOLS = 68


@functools.cache
def _decode_tables():
    """Canonical per-length decode tables (T.81 F.2.2.3 form).

    For each table: mincode[l], maxcode[l] (last code of length l, -1
    where the length is unused), valptr[l] (first symbol index of that
    length), all indexed 1..16 (index 0 unused), plus the symbol-order
    huffval array.  Derived from the same Annex-K BITS/HUFFVAL spec
    arrays as the encoder's tables (constants.py:96-123)."""

    def build(bits, huffval):
        mincode = np.full(17, 0, np.int32)
        maxcode = np.full(17, -1, np.int32)
        valptr = np.zeros(17, np.int32)
        code = 0
        k = 0
        for l in range(1, 17):
            n = bits[l - 1]
            if n:
                valptr[l] = k
                mincode[l] = code
                maxcode[l] = code + n - 1
                code += n
                k += n
            code <<= 1
        return (
            mincode, maxcode, valptr,
            np.asarray(huffval, np.int32),
        )

    return build(DC_BITS, DC_HUFFVAL), build(AC_BITS, AC_HUFFVAL)


def _code_len(w16, maxcode):
    """Length of the canonical codeword in the high bits of w16.

    Vectorized Annex F.2.2.3: the true length is the FIRST l with
    ``w16 >> (16 - l) <= maxcode[l]`` (shorter prefixes always compare
    greater for canonical codes; unused lengths have maxcode -1 and
    never match).  Statically unrolled descending so the smallest
    matching l wins without materializing an (..., 16) intermediate.
    Garbage windows that match nothing keep the fallback 16 --
    downstream validation rejects the chunk."""
    import jax.numpy as jnp

    out = jnp.full(w16.shape, 16, jnp.int32)
    for l in range(16, 0, -1):
        if maxcode[l] < 0:  # host constant: unused code length
            continue
        out = jnp.where(w16 >> (16 - l) <= maxcode[l], l, out)
    return out


def _sign_extend(mag, size):
    """JPEG one's-complement magnitude -> signed value (size==0 -> 0)."""
    import jax.numpy as jnp

    half = jnp.int32(1) << jnp.maximum(size - 1, 0)
    neg = (mag < half) & (size > 0)
    return jnp.where(neg, mag - (jnp.int32(1) << size) + 1, mag)


def _decode_symbol(w32, tables):
    """One symbol at the head of each 32-bit window.

    Returns (code_len, symbol_value); symbol_value is the huffval entry
    (the category for DC, run<<4|size for AC).  Elementwise over w32's
    shape."""
    import jax.numpy as jnp

    mincode, maxcode, valptr, huffval = tables
    w16 = (w32 >> 16).astype(jnp.int32)
    L = _code_len(w16, maxcode)
    code = w16 >> (16 - L)
    idx = jnp.take(jnp.asarray(valptr), L) + code - jnp.take(
        jnp.asarray(mincode), L
    )
    idx = jnp.clip(idx, 0, len(huffval) - 1)
    sym = jnp.take(jnp.asarray(huffval), idx)
    return L, sym


def _window32(words_u32, pos):
    """32 payload bits starting at bit ``pos`` (big-endian bit order).

    words_u32: (W,) uint32 payload words; pos int32 array.  Gather
    indices are clipped -- out-of-range cursors (corrupt streams) read
    the tail word and fail validation later."""
    import jax.numpy as jnp

    w = words_u32.shape[0]
    widx = jnp.clip(pos >> 5, 0, w - 1)
    sh = (pos & 31).astype(jnp.uint32)
    hi = jnp.take(words_u32, widx)
    lo = jnp.take(words_u32, jnp.clip(widx + 1, 0, w - 1))
    return jnp.where(
        sh == 0, hi, (hi << sh) | (lo >> (jnp.uint32(32) - sh))
    )


def entropy_decode_chunks(
    words,
    chunk_start,
    chunk_blocks,
    chunk_block_base,
    chunk_end_lo,
    chunk_end_hi,
    nb_total: int,
    stride: int,
    max_symbols: int | None = None,
):
    """Decode all chunks of a (multi-stream) payload word array.

    words: (W,) uint32 big-endian payload words (streams byte-padded to
    word boundaries and concatenated).  chunk_start: (C,) int32 global
    bit offsets of each chunk.  chunk_blocks: (C,) blocks per chunk
    (== stride except final image chunks).  chunk_block_base: (C,)
    first global block index of each chunk.  chunk_end_lo/hi: (C,)
    inclusive bounds the final cursor must land in (exact next-chunk
    offset for interior chunks; [payload_end-7, payload_end] for each
    image's last chunk).

    max_symbols: per-chunk symbol budget sizing the slot buffers.  The
    legal worst case (stride * 68) is ~6x what natural content needs,
    and the post-chain phases cost O(budget * C), so callers run with a
    small budget first and retry at the worst case only when
    ``exhausted`` reports a chunk ran out (two-round decode).

    Returns (zz (nb_total, 64) int32 zig-zag coefficients with DPCM'd
    DC in column 0, ok (C,) bool per-chunk validation, exhausted (C,)
    bool -- ran out of budget, retry with a larger one).  Traceable
    under jit; everything stays on device.
    """
    import jax
    import jax.numpy as jnp

    dc_tab, ac_tab = _decode_tables()
    c = chunk_start.shape[0]
    worst = int(stride) * MAX_BLOCK_SYMBOLS + 2
    s_cap = min(worst, max_symbols) if max_symbols else worst

    # Chunk state lives as (8, ceil(C/8)) tiles: a 1-D (C,) int32 array
    # occupies ~C/128 VPU tiles with one sublane used each, so every
    # narrow chain op paid ~8x the tile work (the serial phase is
    # dispatch/tile-bound, reports/perf_breakdown_r04.md).  Pad chunks
    # to a sublane multiple with DEAD chunks (zero blocks decode
    # nothing and validate ok: cursor stays at start == both end
    # bounds).
    c8 = -(-c // 8) * 8
    crows, ccols = 8, c8 // 8

    def shape2d(arr, fill=0):
        flat = jnp.full((c8,), fill, jnp.int32)
        flat = flat.at[:c].set(arr.astype(jnp.int32))
        return flat.reshape(crows, ccols)

    chunk_start = shape2d(chunk_start)
    chunk_blocks = shape2d(chunk_blocks)
    chunk_block_base = shape2d(chunk_block_base)
    chunk_end_lo = shape2d(chunk_end_lo)
    chunk_end_hi = shape2d(chunk_end_hi)

    # -- phase 0: packed per-window symbol table + window array --------
    # The serial phase is bound by per-op dispatch overhead and gather
    # locality, so it must be a handful of ops over SMALL tables:
    #  * info_tab[(is_dc << 16) | w16] packs EVERYTHING about the
    #    symbol whose code heads the 16-bit window: code length (5b),
    #    magnitude size (4b), zero run (4b), EOB flag (1b), total bit
    #    advance (top bits).  512 KB, content-independent.  (Codes are
    #    <= 16 bits by construction; magnitude bits extending past the
    #    window only contribute their COUNT, which the window
    #    determines.)
    #  * ov32[j] = payload bits [16j, 16j+32) -- any 16-bit window is
    #    ONE gather + shift instead of two word gathers.  (A previous
    #    variant precomputed 224 MB of per-bit-position next tables:
    #    random HBM gathers measured SLOWER than recomputing.)
    w16_all = jnp.arange(65536, dtype=jnp.int32)
    w16_u = (w16_all << 16).astype(jnp.uint32)
    l_dc, cat = _decode_symbol(w16_u, dc_tab)
    l_ac, rs = _decode_symbol(w16_u, ac_tab)
    cat = jnp.clip(cat, 0, 15)
    info_dc = l_dc | (cat << 5) | ((l_dc + cat) << 14)
    adv_ac = l_ac + (rs & 15)
    info_ac = (
        l_ac | ((rs & 15) << 5) | ((rs >> 4) << 9)
        | jnp.where(rs == 0, 1 << 13, 0) | (adv_ac << 14)
    )
    info_tab = jnp.concatenate([info_ac, info_dc])

    hw = jnp.stack(
        [(words >> jnp.uint32(16)).astype(jnp.int32),
         (words & jnp.uint32(0xFFFF)).astype(jnp.int32)],
        axis=1,
    ).reshape(-1)  # (2W,) 16-bit cells
    ov32 = (hw << 16) | jnp.roll(hw, -1).at[-1].set(0)  # (2W,) int32

    # -- phase 1: chain following (the only serial part) ---------------
    # Per step: three small gathers, ~25 vector ops, one row write.
    # The SYMBOL VALUE decodes in-chain and the record packs
    # (value+0x8000, run, kind, eob) into one int32: narrow chain ops
    # cost ~0.2 ms each over the whole pass while every 2.4M-slot
    # post-pass gather costs ~15 ms, so trading one extra chain gather
    # (the second window cell) for all three phase-2 gathers is a
    # ~2x decode win (reports/perf_breakdown_r04.md).
    # adjacent cell pairs in one row so the chain's window needs ONE
    # gather of a contiguous 2-element slice instead of two scattered
    # single-element gathers
    ovpair = jnp.stack(
        [ov32, jnp.roll(ov32, -1).at[-1].set(0)], axis=1
    )  # (2W, 2)

    def step(state):
        i, pos, is_dc, left, pbuf = state
        live = left > 0
        cell = pos >> 4
        s = (pos & 15).astype(jnp.uint32)
        pair = jnp.take(ovpair, cell, axis=0, mode="clip").astype(
            jnp.uint32
        )
        a = pair[..., 0]
        bcell = pair[..., 1]
        w32 = jnp.where(
            s == 0, a,
            (a << s)
            | ((bcell & jnp.uint32(0xFFFF)) >> (jnp.uint32(16) - s)),
        )
        v = jnp.take(
            info_tab,
            (w32 >> 16).astype(jnp.int32)
            + (is_dc.astype(jnp.int32) << 16),
            mode="clip",
        )
        length = v & 31
        size = (v >> 5) & 15
        eob = (v & (1 << 13)) != 0
        mag_shift = jnp.clip(32 - length - size, 0, 31).astype(
            jnp.uint32
        )
        mag = (
            (w32 >> mag_shift)
            & ((jnp.uint32(1)
                << jnp.clip(size, 0, 31).astype(jnp.uint32)) - 1)
        ).astype(jnp.int32)
        value = _sign_extend(mag, size)
        kind = jnp.where(live, jnp.where(is_dc, 2, 1), 0)
        rec = (
            (value + 0x8000)
            | (((v >> 9) & 15) << 16)          # run
            | (kind << 20)
            | (jnp.where(eob, 1, 0) << 22)
        )
        pbuf = jax.lax.dynamic_update_slice(
            pbuf, rec[None], (i, 0, 0)
        )
        pos = pos + jnp.where(live, v >> 14, 0)
        hit = live & eob
        left = left - hit
        is_dc = jnp.where(live, jnp.where(is_dc, False, eob), is_dc)
        return i + 1, pos, is_dc, left, pbuf

    def cond(state):
        i, pos, is_dc, left, pbuf = state
        return (i < s_cap) & jnp.any(left > 0)

    init = (
        jnp.int32(0),
        chunk_start,
        jnp.ones((crows, ccols), bool),
        chunk_blocks,
        jnp.zeros((s_cap, crows, ccols), jnp.int32),
    )
    steps, pos_f, _, left_f, pbuf = jax.lax.while_loop(
        cond, step, init
    )
    exhausted = left_f > 0
    bad = exhausted

    # -- phase 2: unpack recorded slots (no gathers) -------------------
    kbuf = (pbuf >> 20) & 3
    is_dc = kbuf == 2
    is_ac = kbuf == 1
    valid = kbuf != 0
    value = (pbuf & 0xFFFF) - 0x8000
    run = (pbuf >> 16) & 15
    eob = is_ac & (((pbuf >> 22) & 1) != 0)

    # -- phase 3: reassembly ------------------------------------------
    # block index within chunk: running count of DC slots - 1
    blk_in_chunk = jnp.cumsum(is_dc.astype(jnp.int32), axis=0) - 1
    # zig-zag position: segmented cumsum of (run + 1) with reset at DC.
    # cum is monotone, so the running max of (cum where DC else -1)
    # is the base at the most recent DC slot.
    adv_pos = jnp.where(is_ac & ~eob, run + 1, 0)
    cum = jnp.cumsum(adv_pos, axis=0)
    base = jax.lax.cummax(jnp.where(is_dc, cum, -1), axis=0)
    zz_pos = jnp.where(is_dc, 0, cum - base)

    write = valid & ~eob
    blk = chunk_block_base[None] + blk_in_chunk
    pos_ok = (zz_pos >= 0) & (zz_pos <= 63)
    blk_ok = (blk >= 0) & (blk < nb_total)
    good = write & pos_ok & blk_ok
    # Scatter with a globally SORTED index stream so XLA can drop the
    # serial generic-scatter path (measured as the dominant decode
    # cost, reports/perf_breakdown_r04.md).  Within a chunk, valid
    # targets are strictly increasing (monotone coefficient positions
    # over ascending blocks) and chunk block ranges ascend with chunk
    # order; invalid slots (EOB, dead) repeat the chunk's LAST valid
    # index via a running max, adding 0 there -- every live chunk's
    # step-0 slot is a valid DC write, so no -1 survives except in
    # dead-pad chunks, which sit at the END of chunk order and map to
    # the discard sentinel.
    flat = jnp.where(good, blk * 64 + zz_pos, -1)
    flat = jax.lax.cummax(flat, axis=0)
    flat = jnp.where(flat < 0, nb_total * 64, flat)
    flat_cm = jnp.transpose(flat, (1, 2, 0)).reshape(-1)
    val_cm = jnp.transpose(
        jnp.where(good, value, 0), (1, 2, 0)
    ).reshape(-1)
    zz = jnp.zeros((nb_total * 64 + 1,), jnp.int32)
    zz = zz.at[flat_cm].add(
        val_cm, mode="drop", indices_are_sorted=True,
    )
    zz = zz[:-1].reshape(nb_total, 64)

    # -- validation ----------------------------------------------------
    bad = bad | jnp.any(write & ~(pos_ok & blk_ok), axis=0)
    blocks_done = jnp.sum(is_dc.astype(jnp.int32), axis=0)
    bad = bad | (blocks_done != chunk_blocks)
    bad = bad | (pos_f < chunk_end_lo) | (pos_f > chunk_end_hi)
    return zz, (~bad).reshape(-1)[:c], exhausted.reshape(-1)[:c]


def prepare_batch(streams: list[bytes]):
    """Host-side prep: uniform TICX standard-table streams -> device
    input arrays.

    Returns None if any stream is ineligible (no/invalid TICX trailer,
    custom table, payload too large for 31-bit cursors), else a dict of
    numpy arrays + metadata for :func:`entropy_decode_chunks`.
    """
    from .. import container
    from ..constants import (
        FLAG_CUSTOM_TABLE,
        FLAG_SCALED_DCT,
        HEADER_BYTES,
    )

    metas = []
    h0 = None
    for data in streams:
        try:
            h, w, q, flag = container.parse_header(data)
        except Exception:
            return None
        if flag & FLAG_CUSTOM_TABLE:
            return None
        if h0 is None:
            h0 = (h, w, q)
        elif (h, w, q) != h0:
            return None
        nb = -(-h // 8) * -(-w // 8)
        idx = container.parse_block_index(data, nb)
        if idx is None:
            return None
        off, stride, pay_end = idx
        metas.append((data, nb, off, stride, pay_end, flag))
    stride0 = metas[0][3]
    if any(m[3] != stride0 for m in metas):
        return None
    if any(m[5] != metas[0][5] for m in metas):  # uniform flags
        return None

    word_chunks = []
    starts, blocks, bases, end_lo, end_hi, img_of = [], [], [], [], [], []
    base_bits = 0
    blk_base = 0
    for i, (data, nb, off, stride, pay_end, flag) in enumerate(metas):
        payload = data[HEADER_BYTES:pay_end]
        pay_bits = len(payload) * 8
        pad = (-len(payload)) % 4
        word_chunks.append(payload + b"\x00" * pad)
        n_chunks = len(off)
        g = base_bits + off.astype(np.int64)
        starts.append(g)
        nb_in = np.full(n_chunks, stride, np.int64)
        nb_in[-1] = nb - stride * (n_chunks - 1)
        blocks.append(nb_in)
        bases.append(blk_base + np.arange(n_chunks, dtype=np.int64)
                     * stride)
        lo = np.empty(n_chunks, np.int64)
        hi = np.empty(n_chunks, np.int64)
        lo[:-1] = g[1:]
        hi[:-1] = g[1:]
        lo[-1] = base_bits + max(pay_bits - 7, 0)
        hi[-1] = base_bits + pay_bits
        end_lo.append(lo)
        end_hi.append(hi)
        img_of.append(np.full(n_chunks, i, np.int64))
        base_bits += pay_bits + pad * 8
        blk_base += nb
    # cursors and the (pos, kind) slot packing need positions < 2^28
    # bits (32 MB of payload per batch); larger batches use the host
    # entropy path
    if base_bits >= 2**28:
        return None

    raw = b"".join(word_chunks)
    words = np.frombuffer(raw, dtype=">u4").astype(np.uint32)
    return {
        "words": words,
        "chunk_start": np.concatenate(starts).astype(np.int32),
        "chunk_blocks": np.concatenate(blocks).astype(np.int32),
        "chunk_block_base": np.concatenate(bases).astype(np.int32),
        "chunk_end_lo": np.concatenate(end_lo).astype(np.int32),
        "chunk_end_hi": np.concatenate(end_hi).astype(np.int32),
        "chunk_img": np.concatenate(img_of).astype(np.int32),
        "nb_total": blk_base,
        "nb_per_image": metas[0][1],
        "stride": int(stride0),
        "shape": h0,
        "scaled_dct": bool(metas[0][5] & FLAG_SCALED_DCT)
        and not (metas[0][5] & FLAG_CUSTOM_TABLE),
    }
