"""Single-device JAX pipeline engine: image bytes <-> compressed bytes.

Orchestrates the device ops (transform + entropy) with host container
framing.  Jitted programs are cached per (block-count, quality, precision)
since XLA requires static shapes; corpus work should batch same-shaped
images (see the batch/parallel modules).

Pipeline (encode):
    host: reflect-pad -> device: blockify -> DCT -> quantize -> zigzag ->
    DPCM -> symbolize -> per-block bit packing -> (words, lengths) ->
    host: ragged stitch -> header + payload bytes.

Bit-exactness: in ``exact`` precision the transform runs in double-float
arithmetic and flags blocks whose rounding sits closer to a boundary than
float64's own error (~1 block per several thousand).  Flagged blocks are
recomputed on host with the scipy float64 golden path and re-entropy-coded,
making the output *byte-identical* to the float64 reference implementation
while everything else stays on device.

Decode runs the entropy stage on host (variable-length Huffman decode is
inherently serial, SURVEY 3.2; the native C extension accelerates it when
built) and the transform stage on device, with the same fixup trick for
truncation-boundary pixels.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from . import container, golden
from .bitstream import BitWriter, pack_ragged_words
from .constants import ZIGZAG_ORDER, string_code_tables
from .golden import CodecArrays, bits_required, run_length_encode
from .ops import entropy, transform


def _host_block_payload(dc_diff: int, ac_row: np.ndarray) -> tuple[bytes, int]:
    """Pure-python single-block entropy encode (no-compiler fallback)."""
    tables = string_code_tables()
    w = BitWriter()
    cat = int(bits_required(np.int32(dc_diff)))
    w.write_bitstring(tables["DC"][cat])
    w.write_int(int(dc_diff))
    for run, value in run_length_encode(ac_row):
        size = int(bits_required(np.int32(value)))
        w.write_bitstring(tables["AC"][(run, size)])
        w.write_int(int(value))
    return w.to_bytes(), w.bit_length()


class Engine:
    """Lazy holder of jitted pipeline stages (imports jax at init).

    On TPU backends the standard-table encode routes through the fused
    Pallas v2 kernels (pallas_pipeline.compress_batch_pallas, batch of
    one) -- the same program as the flagship batch path, so the public
    ``compress()`` entry point IS the fastest encoder (matching the
    reference, whose single entry point codec.py:133 is its fastest).
    Shapes the kernels cannot tile (block count not a multiple of 8)
    and non-TPU backends fall back to the plain XLA program.

    use_pallas: force the routing on/off (None = auto: TPU backend, or
    the TINYIMGCODEC_FORCE_PALLAS env var).  pallas_interpret: run the
    kernels in Pallas interpret mode (CPU correctness testing).
    """

    # images larger than this fall back to the XLA path (the placement
    # kernel keeps the whole output stream VMEM-resident); parallel.tiled
    # is the intended path for huge images
    _PALLAS_MAX_PIXELS = 16 << 20

    def __init__(self, precision: str = transform.EXACT,
                 use_pallas: bool | None = None,
                 pallas_interpret: bool = False):
        import jax  # deferred so host-only users never pay for it

        from .xla_cache import ensure_cache

        ensure_cache()
        self._jax = jax
        self.precision = precision
        if use_pallas is None:
            use_pallas = (
                jax.default_backend() == "tpu"
                or bool(os.environ.get("TINYIMGCODEC_FORCE_PALLAS"))
            )
        self._use_pallas = use_pallas
        self._pallas_interpret = pallas_interpret
        # TICX chunk-parallel entropy decode ON DEVICE (pure XLA --
        # gathers + canonical-code compares, ops/entropy_decode.py).
        # Default on TPU backends: it replaces the per-batch coefficient
        # upload (~2 bytes/pixel) with the compressed stream itself
        # (~0.5 byte/pixel) and frees the host cores entirely.  The env
        # var overrides in BOTH directions ("0"/"false"/"off"/"" disable
        # -- a kill switch for the device decoder on TPU).
        env = os.environ.get("TINYIMGCODEC_DEVICE_ENTROPY")
        if env is not None:
            self._device_entropy = env.strip().lower() not in (
                "", "0", "false", "off", "no"
            )
        else:
            self._device_entropy = jax.default_backend() == "tpu"
        self._encode_fn = functools.lru_cache(maxsize=32)(self._build_encode)
        self._decode_fn = functools.lru_cache(maxsize=32)(self._build_decode)
        self._arrays_fn = functools.lru_cache(maxsize=32)(self._build_arrays)
        self._devdec_fn = functools.lru_cache(maxsize=16)(
            self._build_device_decode
        )
        self._devdec_resume_fn = functools.lru_cache(maxsize=32)(
            self._build_device_resume
        )
        self._entropy_custom_cache = None

    # -- jit builders ----------------------------------------------------
    def _build_encode(self, quality: int, precision: str):
        def run(blocks):  # (nb, 8, 8) int32/uint8
            zz, flags = transform.encode_blocks(
                blocks, quality, precision, with_flags=True
            )
            dc, ac = transform.dc_dpcm(zz)
            w0, w1, bits, overflow = entropy.block_symbols(dc, ac)
            words, block_bits = entropy.pack_blocks(w0, w1, bits)
            # zz[..., 0] (un-DPCM'd DC) rides along for the host fixup:
            # tiny (nb,) transfer, needed to rebuild neighbor DC diffs.
            return words, block_bits, overflow, flags, zz[..., 0]

        return self._jax.jit(run)

    def _build_decode(self, quality: int, precision: str, scaled: bool):
        jnp = self._jax.numpy

        def run(dc_diff, ac, exc_idx, exc_val):
            # coefficients arrive narrow (int16 DC, int8/int16 AC) to cut
            # host->device bytes 2-4x; widen + patch the rare |ac|>127
            # outliers via scatter-add (padding rows add 0 at index 0).
            ac = ac.astype(jnp.int32)
            flat = ac.reshape(-1)
            flat = flat.at[exc_idx].add(exc_val.astype(jnp.int32))
            zz = transform.undo_dpcm(
                dc_diff.astype(jnp.int32), flat.reshape(ac.shape)
            )
            blocks, flags = transform.decode_blocks(
                zz, quality, precision, scaled_dct=scaled, with_flags=True
            )
            return blocks, flags

        return self._jax.jit(run)

    @staticmethod
    def _compact_coeffs(dc: np.ndarray, ac: np.ndarray):
        """int32 coeff arrays -> narrow upload form.

        Any decodable stream bounds |DC diff| by its table's max category
        (standard table: 2047) and |AC| likewise (standard: 1023), so
        int16 always holds both.  AC additionally ships as int8 plus a
        sparse exception list (value deltas, scatter-added on device)
        when outliers are rare -- 4x less tunnel/PCIe traffic on typical
        content.  Exception capacity is bucketed to powers of two so jit
        signatures stay bounded.
        """
        dc16 = np.ascontiguousarray(dc, dtype=np.int16)
        ac8 = ac.astype(np.int8)
        delta = (ac - ac8.astype(np.int32)).reshape(-1)
        idx = np.flatnonzero(delta)
        if idx.size > ac.size // 8:  # outlier-dense: plain int16 wins
            return (
                dc16, np.ascontiguousarray(ac, dtype=np.int16),
                np.zeros(0, np.int32), np.zeros(0, np.int16),
            )
        cap = 128
        while cap < idx.size:
            cap <<= 1
        exc_idx = np.zeros(cap, np.int32)
        exc_val = np.zeros(cap, np.int16)
        exc_idx[: idx.size] = idx
        exc_val[: idx.size] = delta[idx]
        return dc16, ac8, exc_idx, exc_val

    # -- fixup helpers ---------------------------------------------------
    @staticmethod
    def _host_quantize_blocks(pixel_blocks: np.ndarray, quality: int):
        """scipy float64 reference math for flagged blocks (golden path)."""
        coeffs = golden.quantize(
            golden.block_dct(pixel_blocks.astype(np.float64) - 128.0),
            quality,
        )
        return coeffs.reshape(-1, 64)[:, ZIGZAG_ORDER]

    @staticmethod
    def _reencode_rows(dc_diff: np.ndarray, ac: np.ndarray):
        """(k,) DC diffs + (k, 63) AC -> (words (k, 52), bits (k,)).

        Per-block host entropy re-encode for fixup: block payloads are
        independent, so patched blocks just replace their word rows.
        """
        from . import native
        from .ops.entropy import BLOCK_WORDS

        k = dc_diff.shape[0]
        words = np.zeros((k, BLOCK_WORDS), np.uint32)
        bits = np.zeros(k, np.int32)
        use_native = native.available()
        for i in range(k):
            if use_native:
                payload, nbits = native.entropy_encode(
                    dc_diff[i : i + 1], ac[i : i + 1]
                )
            else:
                payload, nbits = _host_block_payload(
                    int(dc_diff[i]), ac[i]
                )
            buf = np.zeros(BLOCK_WORDS * 4, np.uint8)
            buf[: len(payload)] = np.frombuffer(payload, np.uint8)
            words[i] = buf.view(">u4").astype(np.uint32)
            bits[i] = nbits
        return words, bits

    @staticmethod
    def _host_decode_blocks(
        zz_rows: np.ndarray, quality: int, scaled_dct: bool
    ) -> np.ndarray:
        coeffs = np.zeros((zz_rows.shape[0], 64), np.float64)
        coeffs[:, ZIGZAG_ORDER] = zz_rows
        coeffs = coeffs.reshape(-1, 8, 8)
        mult = transform.dequant_multipliers(quality, scaled_dct)
        pix = golden.block_idct(coeffs * mult)
        return np.clip(pix + 128.0, 0.0, 255.0).astype(np.uint8)

    # -- public API ------------------------------------------------------
    def encode_to_words(
        self, image: np.ndarray, quality: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Run the device encode; returns (words (nb,52), block_bits (nb,))."""
        padded = transform.pad_to_blocks(np.asarray(image))
        blocks = np.ascontiguousarray(
            np.asarray(transform.blockify(padded.astype(np.int32)))
        )
        words, block_bits, overflow, flags, dc_all = self._encode_fn(
            int(quality), self.precision
        )(blocks)
        if bool(overflow):
            raise ValueError(
                "coefficient magnitude exceeds the standard Huffman "
                "table range (quality too high for this input); "
                "re-encode with auto_generate_huffman_table=True -- "
                "dynamic tables extend to DC category 15 / AC size 15"
            )
        words = np.asarray(words)
        block_bits = np.asarray(block_bits)
        flags = np.asarray(flags)
        if flags.any():
            words, block_bits = self._fixup_encode(
                blocks, quality, words, block_bits,
                np.asarray(dc_all), flags,
            )
        return words, block_bits

    def _fixup_encode(
        self, blocks, quality, words, block_bits, dc_all, flags
    ):
        """Patch rounding-boundary blocks with float64 host results.

        Block payloads are independent in the packed-words layout, so only
        the flagged blocks and their DPCM successors (whose DC diff shifts
        when a flagged DC changes) are re-entropy-coded, on host.
        """
        nb = blocks.shape[0]
        idx = np.flatnonzero(flags)
        patch = np.unique(np.concatenate([idx, idx + 1]))
        patch = patch[patch < nb]
        zz_patch = self._host_quantize_blocks(blocks[patch], quality)
        dc_all = dc_all.copy()
        dc_all[patch] = zz_patch[:, 0]
        prev = np.where(patch > 0, dc_all[np.maximum(patch - 1, 0)], 0)
        dc_diff = (zz_patch[:, 0] - prev).astype(np.int32)
        new_words, new_bits = self._reencode_rows(dc_diff, zz_patch[:, 1:])
        words = words.copy()
        block_bits = block_bits.copy()
        words[patch] = new_words
        block_bits[patch] = new_bits
        return words, block_bits

    def _pallas_compatible(self, image: np.ndarray) -> bool:
        h, w = image.shape
        nb = -(-h // 8) * -(-w // 8)
        return (
            self._use_pallas
            and nb % 8 == 0
            and nb >= 8
            and h * w <= self._PALLAS_MAX_PIXELS
        )

    def compress(
        self, image: np.ndarray, quality: int = 50,
        auto_table: bool = False, block_index: bool | None = None,
        index_stride: int = container.INDEX_STRIDE,
    ) -> bytes:
        image = np.asarray(image)
        if block_index is None:
            # default ON: the TICX trailer is what makes the
            # chunk-parallel device decoder reachable from
            # default-compressed streams (round-4 verdict #2) --
            # dynamic-table streams included since round 5 (their
            # parsed tables ride the same device chain as runtime
            # tensors when standard-range, ops/entropy_decode.py)
            block_index = True
        if auto_table:
            return self._compress_auto_table(
                image, quality, block_index=block_index,
                index_stride=index_stride,
            )
        if self._pallas_compatible(image):
            from .pallas_pipeline import compress_batch_pallas

            return compress_batch_pallas(
                image[None], quality, precision=self.precision,
                block_index=block_index, index_stride=index_stride,
                interpret=self._pallas_interpret,
            )[0]
        words, block_bits = self.encode_to_words(image, quality)
        arrays = CodecArrays(
            height=image.shape[0],
            width=image.shape[1],
            quality=quality,
            dc=np.empty(0, np.int32),
            ac=np.empty((0, 63), np.int32),
        )
        header = container.make_header(arrays)
        from . import native

        if native.available():
            data = header + native.stitch(words, block_bits)
        else:
            data = header + pack_ragged_words(words, block_bits)
        if block_index:
            data = self._append_block_index(data, block_bits, index_stride)
        return data

    @staticmethod
    def _append_block_index(
        data: bytes, block_bits: np.ndarray, index_stride: int
    ) -> bytes:
        """Append the TICX trailer: payload-relative per-block offsets
        are the exclusive bit cumsum -- free from the device's
        block_bits output (identical for standard and dynamic-table
        streams, docs/FORMAT.md)."""
        offsets = np.cumsum(block_bits, dtype=np.int64) - block_bits
        return data + container.make_block_index(
            offsets, stride=index_stride
        )

    # -- dynamic-table encode ---------------------------------------------
    def _build_arrays(self, quality: int, precision: str):
        def run(blocks):  # (nb, 8, 8) int32 -> DPCM'd coefficient arrays
            zz, flags = transform.encode_blocks(
                blocks, quality, precision, with_flags=True
            )
            dc, ac = transform.dc_dpcm(zz)
            return dc, ac, flags

        return self._jax.jit(run)

    @property
    def _entropy_custom(self):
        if self._entropy_custom_cache is None:
            self._entropy_custom_cache = self._build_entropy_custom()
        return self._entropy_custom_cache

    def _build_entropy_custom(self):
        def run(dc, ac, dc_code, dc_len, ac_code, ac_len):
            w0, w1, bits, overflow = entropy.block_symbols(
                dc, ac, dc_code, dc_len, ac_code, ac_len
            )
            words, block_bits = entropy.pack_blocks(w0, w1, bits)
            return words, block_bits, overflow

        return self._jax.jit(run)

    def _compress_auto_table(
        self, image: np.ndarray, quality: int,
        block_index: bool = False,
        index_stride: int = container.INDEX_STRIDE,
    ) -> bytes:
        """Frequency-optimal tables with device transform + device entropy.

        The reference's auto_generate_huffman_table path is broken on its
        own decoder (flag endianness, SURVEY quirk 2.5-1); ours round-trips
        and matches the host container path byte-for-byte: identical
        histograms (huffman.symbol_counts) feed the identical canonical
        table builder, then entropy coding runs on device with the table
        arrays as traced inputs (one compiled program for every table).
        block_index appends the payload-relative TICX trailer (same
        layout as standard-table streams, docs/FORMAT.md), making the
        stream eligible for the chunk-parallel device decoder.
        """
        from .huffman import build_huffman_spec_from_counts, symbol_counts

        padded = transform.pad_to_blocks(image)
        blocks = np.ascontiguousarray(
            np.asarray(transform.blockify(padded.astype(np.int32)))
        )
        dc_d, ac_d, flags = self._arrays_fn(int(quality), self.precision)(
            blocks
        )
        dc = np.asarray(dc_d)
        ac = np.asarray(ac_d)
        flags = np.asarray(flags)
        if flags.any():
            # exact-precision fixup on the coefficients themselves: patch
            # rounding-uncertain blocks with the float64 golden values and
            # rebuild every DC diff from the patched absolute DCs.
            nb = blocks.shape[0]
            idx = np.flatnonzero(flags)
            dc_abs = np.cumsum(dc, dtype=np.int64).astype(np.int32)
            zz_patch = self._host_quantize_blocks(blocks[idx], quality)
            dc_abs[idx] = zz_patch[:, 0]
            ac = ac.copy()
            ac[idx] = zz_patch[:, 1:]
            dc = np.diff(dc_abs, prepend=np.int32(0)).astype(np.int32)
        spec = build_huffman_spec_from_counts(*symbol_counts(dc, ac))
        arrays = CodecArrays(
            height=image.shape[0], width=image.shape[1],
            quality=quality, dc=dc, ac=ac,
        )
        if spec.extended:
            # coefficients need DC categories >= 12 / AC sizes >= 11
            # (qualities 97-99 on high-contrast input); the device
            # entropy layout is standard-range, so emit via the host
            # container path with the extended dynamic tables --
            # same canonical builder, same bytes as container.compress.
            return container.compress_arrays(
                arrays, True, block_index=block_index, spec=spec,
                index_stride=index_stride,
            )
        words, block_bits, overflow = self._entropy_custom(
            dc, ac, *spec.device_tables()
        )
        if bool(overflow):
            # custom table exceeded the device layout's capacity bounds
            # (needs >64-bit slot payloads); rare -- same-bytes host path.
            return container.compress_arrays(
                arrays, True, block_index=block_index, spec=spec,
                index_stride=index_stride,
            )
        words = np.asarray(words)
        block_bits = np.asarray(block_bits)
        writer = BitWriter()
        writer.write_bytes(container.make_header(arrays, custom_table=True))
        container.write_huffman_table(writer, spec.string_tables())
        prefix_bits = writer.bit_length()
        from . import native
        from .bitstream import concat_bit_payload

        if native.available():
            payload = native.stitch(words, block_bits)
        else:
            payload = pack_ragged_words(words, block_bits)
        data = concat_bit_payload(
            writer.to_bytes(), prefix_bits, payload,
            int(block_bits.sum()),
        )
        if block_index:
            data = self._append_block_index(data, block_bits, index_stride)
        return data

    # -- device entropy decode (TICX chunk-parallel, pure XLA) ---------
    def _build_device_decode(self, b: int, nb: int, wlen: int,
                             quality: int, precision: str, scaled: bool,
                             stride: int, max_symbols: int | None,
                             custom: bool = False):
        """Programs for the CONTINUATION decode: a budgeted first pass
        over the full canonical batch (scatter-free matmul reassembly),
        resume passes that pick exhausted chunks up from their saved
        cursor state and decode only the REMAINING symbols (round-4's
        scheme re-decoded exhausted chunks from scratch at the
        worst-case budget -- measured ~half the corpus chunks exhaust
        the old 12-symbol budget, so that rerun dominated), an add
        merge (continuation coefficients are disjoint), and the
        transform half.  No coefficients ever cross the host link."""
        jax = self._jax
        jnp = jax.numpy

        from .ops.entropy_decode import (
            entropy_decode_chunks,
            unflatten_tables,
        )

        def entropy(words, starts, blocks_c, bases, lo, hi, *tabs):
            # tabs: 8 runtime table tensors for dynamic-table streams
            # (flatten_tables order) -- empty for the standard tables,
            # whose XLA program is pinned byte-equal to the
            # standard-only design (tables constant-fold)
            tables = unflatten_tables(tabs) if custom else None
            return entropy_decode_chunks(
                words, starts, blocks_c, bases, lo, hi,
                nb_total=b * nb, stride=stride, max_symbols=max_symbols,
                layout=(b, nb), return_state=True, tables=tables,
            )

        def merge(zz, zz_sub):
            return zz + zz_sub

        def xform(zz):
            zzb = zz.reshape(b, nb, 64)
            zz_abs = transform.undo_dpcm(zzb[..., 0], zzb[..., 1:])
            blocks, flags = transform.decode_blocks(
                zz_abs, quality, precision, scaled_dct=scaled,
                with_flags=True,
            )
            return blocks, flags, zz_abs

        return jax.jit(entropy), jax.jit(merge), jax.jit(xform)

    def _build_device_resume(self, b: int, nb: int, wlen: int,
                             quality: int, precision: str, scaled: bool,
                             stride: int, max_symbols: int | None,
                             custom: bool = False):
        """A continuation pass: picks chunks up from saved cursor state
        and decodes at most ``max_symbols`` more slot rows (None = the
        exact worst-case bound, unpaired, which always finishes)."""
        jax = self._jax

        from .ops.entropy_decode import (
            entropy_decode_chunks,
            unflatten_tables,
        )

        def resume(words, starts, blocks_c, bases, lo, hi, *rest):
            st, tabs = rest[:5], rest[5:]
            tables = unflatten_tables(tabs) if custom else None
            return entropy_decode_chunks(
                words, starts, blocks_c, bases, lo, hi,
                nb_total=b * nb, stride=stride, max_symbols=max_symbols,
                paired=max_symbols is not None, layout=None,
                resume=tuple(st), return_state=True, tables=tables,
            )

        return jax.jit(resume)

    def _decompress_batch_device(self, streams: list[bytes]):
        """Uniform TICX streams (standard OR shared dynamic tables,
        ops/entropy_decode.prepare_batch) -> (B, H, W) uint8, with
        the entropy stage on device.  Returns None when the batch is
        ineligible (caller falls back to the host entropy path); chunks
        that fail validation (corrupt streams) degrade per image to the
        host golden decoder."""
        from .ops.entropy_decode import prepare_batch

        prep = prepare_batch(streams)
        if prep is None:
            return None
        jnp = self._jax.numpy
        b = len(streams)
        h, w, quality = prep["shape"]
        nb = prep["nb_per_image"]
        scaled = bool(prep["scaled_dct"])
        # pad the word buffer to a power-of-two bucket so arbitrary
        # stream lengths reuse a handful of compiled programs
        wl = len(prep["words"])
        bucket = 1 << max(10, (wl - 1).bit_length())
        words = np.zeros(bucket, np.uint32)
        words[:wl] = prep["words"]
        stride = prep["stride"]
        dev_words = jnp.asarray(words)
        chunk_keys = ("chunk_start", "chunk_blocks", "chunk_block_base",
                      "chunk_end_lo", "chunk_end_hi")
        args = tuple(jnp.asarray(prep[k]) for k in chunk_keys)
        # dynamic-table streams: the canonical decode tables ride as
        # runtime tensors, so every table shares ONE compiled program
        # per batch shape (a per-image auto table never recompiles)
        custom = prep["tables"] is not None
        tab_args = ()
        if custom:
            from .ops.entropy_decode import flatten_tables

            tab_args = tuple(
                jnp.asarray(a) for a in flatten_tables(prep["tables"])
            )
        # Budgeted first pass + CONTINUATION: the slot buffers (and the
        # post-chain phases, O(budget * chunks)) size to the batch's
        # OWN density; chunks that exhaust the budget RESUME from their
        # saved cursor state as a pow2-padded subset, decoding only the
        # remaining symbols, and the disjoint coefficient sets merge by
        # addition on device.  Escalating budgeted resumes cover the
        # density tail; a final worst-case unpaired resume (slot bound
        # stride*68 exact) guarantees termination.
        #
        # The first-pass budget adapts to content: payload bits predict
        # symbols at ~4.2 bits/symbol (q=50 corpus: 67 bits/block over
        # ~15 slot rows; q=90: 115 over ~35 -- denser content uses
        # SHORTER codes), plus 25% tail margin, bucketed so jit
        # signatures stay bounded.  The floor 16 is the q<=50 sweet
        # spot (12, the round-4 default, exhausted HALF the corpus
        # chunks and the old from-scratch worst-case rerun dominated,
        # reports/perf_breakdown_r05.md).
        from .ops.entropy_decode import suggest_budget_rows

        # margin 1.0: with continuation, under-budgeting is cheap
        # (resumes cover exhausted subsets only), so the engine aims at
        # the density MEAN; the sharded path, which has no
        # continuation, uses the generous default margin instead
        budget = suggest_budget_rows(wl, b * nb, stride, margin=1.0)
        entropy, merge, xform = self._devdec_fn(
            b, nb, bucket, int(quality), self.precision, scaled,
            stride, budget, custom,
        )
        zz, ok, exhausted, state = entropy(dev_words, *args, *tab_args)
        ok_np, exh_np = self._jax.device_get((ok, exhausted))
        ok_np = ok_np.copy()
        state_np = None
        # geometric budget escalation: dense content (q>=90 needs ~2-3x
        # the q=50 budget) finishes in one or two cheap subset resumes
        # instead of jumping straight to the 68-row worst case
        for res_budget in (budget, 2 * budget, 4 * budget, None):
            if not exh_np.any():
                break
            fn = self._devdec_resume_fn(
                b, nb, bucket, int(quality), self.precision, scaled,
                stride, res_budget, custom,
            )
            if state_np is None:
                state_np = [np.asarray(a) for a in
                            self._jax.device_get(state)]
            idx = np.flatnonzero(exh_np)
            k2 = 1 << max(0, int(len(idx) - 1).bit_length())
            pad = k2 - len(idx)
            sub_np = {k: np.concatenate(
                [prep[k][idx], np.zeros(pad, prep[k].dtype)]
            ) for k in chunk_keys}
            # resume state subset; dead pads: left 0 (decode nothing),
            # next-is-DC 1, cursor 0 == both end bounds -> validate ok
            st = []
            for j, fill in enumerate((0, 1, 0, 0, 0)):
                st.append(np.concatenate([
                    state_np[j][idx],
                    np.full(pad, fill, state_np[j].dtype),
                ]))
            sub = tuple(jnp.asarray(sub_np[k]) for k in chunk_keys)
            zz_sub, ok_sub, ex_sub, st_sub = fn(
                dev_words, *sub, *(jnp.asarray(a) for a in st), *tab_args
            )
            zz = merge(zz, zz_sub)
            ok_np[idx] = np.asarray(ok_sub)[: len(idx)]
            ex2 = np.zeros_like(exh_np)
            ex2[idx] = np.asarray(ex_sub)[: len(idx)]
            new_state = [np.asarray(a) for a in
                         self._jax.device_get(st_sub)]
            for j in range(5):
                state_np[j] = state_np[j].copy()
                state_np[j][idx] = new_state[j][: len(idx)]
            exh_np = ex2
        blocks, flags, zz_abs = xform(zz)
        flags_np = np.asarray(flags).reshape(-1)
        if flags_np.any():
            # truncation-boundary pixels: host float64 recompute of the
            # flagged blocks (same fixup as the host-entropy path)
            idxs = np.flatnonzero(flags_np)
            rows = np.asarray(zz_abs.reshape(-1, 64)[jnp.asarray(idxs)])
            fixed = self._host_decode_blocks(rows, quality, scaled)
            blocks = (
                blocks.reshape(-1, 8, 8)
                .at[jnp.asarray(idxs)]
                .set(jnp.asarray(fixed))
                .reshape(b, nb, 8, 8)
            )
        h8 = -(-h // 8) * 8
        w8 = -(-w // 8) * 8
        imgs = np.asarray(transform.unblockify(blocks, h8, w8))
        # explicit copy: for block-aligned shapes the crop slice is the
        # whole array and ascontiguousarray would return the READ-ONLY
        # device-backed view, crashing the corrupt-chunk fallback below
        imgs = np.array(imgs[:, :h, :w])
        if not ok_np.all():
            for i in np.unique(prep["chunk_img"][~ok_np]):
                imgs[i] = container.decompress(streams[int(i)])
        return imgs

    def decompress(self, data: bytes) -> np.ndarray:
        if self._device_entropy:
            out = self._decompress_batch_device([data])
            if out is not None:
                return out[0]
        arrays = container.decompress_to_arrays(data)
        return self.decode_arrays(arrays)

    def decompress_batch(self, streams: list[bytes]):
        """Decode a batch of streams: C entropy decode per stream (the
        serial part; streams decoded concurrently -- the ctypes call
        releases the GIL), ONE batched device transform for all of them.
        TICX-indexed batches (standard or uniform standard-range
        dynamic tables) skip the host entirely on
        TPU backends (chunk-parallel device entropy decode).

        Uniform batches return a stacked ``(B, H, W)`` array.  Mixed
        shapes/qualities degrade gracefully (like decompress_stream's
        flush, round-4 verdict weak #8): streams are grouped into
        uniform runs, each decoded through the batched path, and a LIST
        of (H, W) arrays is returned in input order."""
        if self._device_entropy:
            out = self._decompress_batch_device(streams)
            if out is not None:
                return out
        from concurrent.futures import ThreadPoolExecutor

        if len(streams) > 1:
            workers = min(len(streams), os.cpu_count() or 1)
            with ThreadPoolExecutor(workers) as pool:
                arrays = list(pool.map(
                    # per-stream threads already saturate the cores;
                    # nesting TICX index-parallelism inside them would
                    # oversubscribe and run SLOWER than serial cursors
                    lambda d: container.decompress_to_arrays(
                        d, index_workers=1
                    ),
                    streams,
                ))
        else:
            arrays = [container.decompress_to_arrays(d) for d in streams]
        a0 = arrays[0]
        mixed = any(
            (a.height, a.width, a.quality, a.scaled_dct)
            != (a0.height, a0.width, a0.quality, a0.scaled_dct)
            for a in arrays[1:]
        )
        if mixed:
            # group consecutive uniform runs, decode each batched
            out: list[np.ndarray] = []
            run: list[bytes] = []
            key = None
            for data, a in zip(streams, arrays):
                k = (a.height, a.width, a.quality, a.scaled_dct)
                if key is not None and k != key:
                    dec = self.decompress_batch(run)
                    out.extend(np.asarray(dec))
                    run = []
                key = k
                run.append(data)
            dec = self.decompress_batch(run)
            out.extend(np.asarray(dec))
            if len({o.shape for o in out}) == 1:
                # same shapes, mixed qualities: keep the stacked-array
                # contract (a list only when shapes genuinely differ)
                return np.stack(out)
            return out
        dc = np.stack([a.dc for a in arrays])
        ac = np.stack([a.ac for a in arrays])
        fn = self._decode_fn(
            int(a0.quality), self.precision, bool(a0.scaled_dct)
        )
        blocks, flags = fn(*self._compact_coeffs(dc, ac))
        blocks = np.array(blocks)
        flags = np.asarray(flags)
        if flags.any():
            for i in np.flatnonzero(flags.any(axis=-1)):
                idx = np.flatnonzero(flags[i])
                zz = np.zeros((len(idx), 64), np.int32)
                dci = np.cumsum(arrays[i].dc.astype(np.int64)).astype(
                    np.int32
                )
                zz[:, 0] = dci[idx]
                zz[:, 1:] = arrays[i].ac[idx]
                blocks[i, idx] = self._host_decode_blocks(
                    zz, a0.quality, a0.scaled_dct
                )
        h8 = -(-a0.height // 8) * 8
        w8 = -(-a0.width // 8) * 8
        imgs = np.asarray(transform.unblockify(blocks, h8, w8))
        return imgs[:, : a0.height, : a0.width]

    def decode_arrays(self, arrays: CodecArrays) -> np.ndarray:
        fn = self._decode_fn(
            int(arrays.quality), self.precision, bool(arrays.scaled_dct)
        )
        blocks, flags = fn(*self._compact_coeffs(arrays.dc, arrays.ac))
        blocks = np.array(blocks)  # writable copy (fixup patches in place)
        if bool(flags.any()):
            idx = np.flatnonzero(np.asarray(flags))
            zz = np.zeros((len(idx), 64), np.int32)
            dc = np.cumsum(arrays.dc.astype(np.int64)).astype(np.int32)
            zz[:, 0] = dc[idx]
            zz[:, 1:] = arrays.ac[idx]
            blocks[idx] = self._host_decode_blocks(
                zz, arrays.quality, arrays.scaled_dct
            )
        h8 = -(-arrays.height // 8) * 8
        w8 = -(-arrays.width // 8) * 8
        img = transform.unblockify(blocks, h8, w8)
        return np.asarray(img)[: arrays.height, : arrays.width]
