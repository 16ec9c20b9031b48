"""Single-dispatch Pallas encode pipeline: image batch -> one byte stream.

Chains the fused encode kernel (ops/pallas_encode.py) and the device
BitWriter (ops/pallas_stitch.py) in one jitted program: uint8 images in
HBM -> per-image byte-aligned compressed streams, with exactly one small
host pull (stream words + image offsets + status).  This is the
throughput path used by the benchmark on real hardware; correctness
parity with the XLA/host paths is pinned by tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import container
from .golden import CodecArrays
from .ops import transform
from .ops.pallas_encode import encode_pallas
from .ops.pallas_stitch import stitch_pallas
from .xla_cache import ensure_cache


@functools.cache
def _build(b: int, h: int, w: int, quality: int, cap_words: int,
           bt: int, interpret: bool, precision: str, version: str):
    ensure_cache()
    nb = (h // 8) * (w // 8)

    if version == "v2":
        from .ops.pallas_encode2 import encode_pallas2
        from .ops.pallas_place import assemble_cm

        def run(images):  # (B, H, W) uint8
            blocks = transform.blockify(images).reshape(b * nb, 64)
            if precision == transform.EXACT:
                from .ops.pallas_exact import exact_transform_pallas_cm

                zz_cm = exact_transform_pallas_cm(
                    blocks.astype(jnp.int32).T, quality,
                    bt=min(bt, 512), interpret=interpret,
                )
                packed, meta, overflow = encode_pallas2(
                    zz_cm, quality, nb=nb, bt=bt, interpret=interpret,
                    from_zz=True,
                )
            else:
                packed, meta, overflow = encode_pallas2(
                    blocks, quality, nb=nb, bt=bt, interpret=interpret,
                )
            stream, starts, total, cap_over = assemble_cm(
                packed, meta, nb=nb, cap_words=cap_words, bt=bt,
                interpret=interpret,
            )
            status = (
                jnp.where(cap_over, 2, 0) | jnp.where(overflow, 4, 0)
            )
            return stream, starts, total, status

        return jax.jit(run)

    def run(images):  # (B, H, W) uint8
        blocks = transform.blockify(images)
        if precision == transform.EXACT:
            # double-float pallas transform (reference-grade rounding;
            # exact ties resolved by correct round-half-even on device),
            # then the entropy kernel consumes the coefficients
            from .ops.pallas_exact import exact_transform_pallas

            zz = exact_transform_pallas(
                blocks.reshape(b * nb, 64), quality, bt=bt,
                interpret=interpret,
            )
            words, bits, overflow = encode_pallas(
                zz, quality, nb=nb, bt=bt, interpret=interpret,
                from_zz=True,
            )
        else:
            words, bits, overflow = encode_pallas(
                blocks.reshape(b * nb, 64), quality, nb=nb, bt=bt,
                interpret=interpret,
            )
        stream, starts, total, status = stitch_pallas(
            words, bits, nb=nb, cap_words=cap_words, bt=bt,
            interpret=interpret,
        )
        status = status | jnp.where(overflow, 4, 0)
        return stream, starts, total, status

    return jax.jit(run)


def compress_batch_pallas(
    images,
    quality: int = 50,
    bits_per_pixel_budget: float = 4.0,
    bt: int = 1024,
    interpret: bool = False,
    staged=None,
    precision: str = transform.FAST,
    version: str = "v2",
) -> list[bytes]:
    """(B, H, W) uint8 same-shaped images -> list of compressed bytes.

    Single device.  ``staged`` may carry a pre-transferred device array to
    keep the host link out of hot loops.  precision: "fast" (f32) or
    "exact" (double-float transform; reference-grade rounding with exact
    ties correctly rounded on device).  version: "v2" (coefficient-major
    kernels, ops/pallas_encode2.py + ops/pallas_place.py) or "v1"
    (block-major + sequential device BitWriter).
    """
    if staged is not None:
        dev_images = staged
        b, h, w = np.asarray(dev_images).shape if images is None else (
            images.shape
        )
    else:
        images = np.ascontiguousarray(np.asarray(images), dtype=np.uint8)
        if images.shape[1] % 8 or images.shape[2] % 8:
            images = transform.pad_to_blocks(images)
        dev_images = images
        b, h, w = images.shape
    nb = (h // 8) * (w // 8)
    n = b * nb
    # tiles must divide the block count and not span an image boundary
    while n % bt or bt > nb:
        bt //= 2
        if bt < 8:
            raise ValueError(f"total blocks {n} not tileable")
    cap_words = -(-int(b * h * w * bits_per_pixel_budget) // 32)

    fn = _build(b, h, w, int(quality), cap_words, bt, interpret,
                precision, version)
    stream, starts, total, status = jax.device_get(fn(dev_images))
    if int(status) & (2 | 4):
        if int(status) & 4:
            raise ValueError("coefficient out of Huffman table range")
        # capacity overflow: retry with worst case
        cap_words = n * 52
        fn = _build(b, h, w, int(quality), cap_words, bt, interpret,
                    precision, version)
        stream, starts, total, status = jax.device_get(fn(dev_images))
        if int(status) & 2:
            raise ValueError("stream capacity overflow (worst case!)")

    header = container.make_header(
        CodecArrays(
            height=h, width=w, quality=quality,
            dc=np.empty(0, np.int32), ac=np.empty((0, 63), np.int32),
        )
    )
    raw = stream.astype(">u4").tobytes()
    out = []
    for i in range(b):
        s = int(starts[i]) // 8
        e = int(starts[i + 1]) // 8 if i + 1 < b else -(-int(total) // 8)
        out.append(header + raw[s:e])
    return out
