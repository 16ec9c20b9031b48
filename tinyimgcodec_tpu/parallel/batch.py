"""Data-parallel batch encode: images sharded over the mesh batch axis.

The reference's corpus "benchmark" is a serial Python loop over 49 images
(tests/benchmark.py:12); here the whole batch is one SPMD program: a
(B, nb, 8, 8) block tensor sharded over devices on the batch axis, every
stage batched, and per-image payload streams stitched on device (one
small transfer per image) or on host (byte-conformant fixup mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import container
from ..bitstream import pack_ragged_words
from ..golden import CodecArrays
from ..ops import entropy, transform
from ..xla_cache import ensure_cache
from .tiled import _MeshKey


def _batch_body(blocks, *, quality, precision, axis):
    """(b_local, nb, 8, 8) -> per-image packed words + metadata."""
    zz, flags = transform.encode_blocks(
        blocks, quality, precision, with_flags=True
    )
    dc, ac = transform.dc_dpcm(zz)
    w0, w1, bits, overflow = entropy.block_symbols(dc, ac)
    words, block_bits = entropy.pack_blocks(w0, w1, bits)
    overflow = jax.lax.pmax(overflow.astype(jnp.int32), axis) > 0
    return words, block_bits, flags, zz[..., 0], overflow


def _stream_body(blocks, *, quality, precision, out_words, axis):
    """Like _batch_body but stitches each image's stream on device."""
    words, block_bits, flags, dc, overflow = _batch_body(
        blocks, quality=quality, precision=precision, axis=axis
    )
    stitch = jax.vmap(
        lambda w, b: entropy.stitch_words(w, b, out_words)
    )
    streams, totals = stitch(words, block_bits)
    local_over = jnp.any(totals > out_words * 32)
    over = jax.lax.pmax(local_over.astype(jnp.int32), axis) > 0
    return streams, totals, flags, dc, overflow | over


ENSURE = ensure_cache  # imported for side-effect availability


@functools.cache
def _build(mesh_key, quality: int, precision: str, out_words: int | None):
    mesh = mesh_key.mesh
    axis = mesh.axis_names[0]
    if out_words is None:
        body = functools.partial(
            _batch_body, quality=quality, precision=precision, axis=axis
        )
    else:
        body = functools.partial(
            _stream_body, quality=quality, precision=precision,
            out_words=out_words, axis=axis,
        )
    out_specs = (P(axis), P(axis), P(axis), P(axis), P())
    return jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=(P(axis),), out_specs=out_specs
        )
    )


def _blockify_batch(images: np.ndarray, n: int):
    images = np.asarray(images)
    b, h, w = images.shape
    padded = transform.pad_to_blocks(images)
    blocks = np.asarray(transform.blockify(padded.astype(np.int32)))
    b_pad = -(-b // n) * n
    if b_pad != b:
        blocks = np.concatenate(
            [blocks, np.zeros((b_pad - b, *blocks.shape[1:]), np.int32)]
        )
    return blocks, b


def compress_batch(
    images: np.ndarray,
    quality: int = 50,
    mesh: Mesh | None = None,
    precision: str = transform.EXACT,
    assemble: str = "host",
    bits_per_pixel_budget: float = 6.0,
) -> list[bytes]:
    """(B, H, W) same-shaped grayscale images -> list of compressed bytes.

    assemble="host": byte-identical to the reference encoder (float64
    fixup of rounding-boundary blocks).  assemble="device": per-image
    streams stitched on device (minimal host transfer; exact ties
    resolved by correct rounding -- see parallel.tiled notes).
    """
    from ..engine import Engine
    from .mesh import make_mesh

    if mesh is None:
        mesh = make_mesh()
    n = mesh.devices.size
    images = np.asarray(images)
    b, h, w = images.shape
    blocks, b_real = _blockify_batch(images, n)
    nb = blocks.shape[1]
    key = _MeshKey(mesh)

    def header_for(i):
        return container.make_header(
            CodecArrays(
                height=h, width=w, quality=quality,
                dc=np.empty(0, np.int32), ac=np.empty((0, 63), np.int32),
            )
        )

    if assemble == "device":
        out_words = max(
            -(-int(nb * 64 * bits_per_pixel_budget) // 32), 64
        )
        fn = _build(key, int(quality), precision, out_words)
        streams, totals, flags, dc, overflow = fn(blocks)
        if bool(overflow):
            out_words = nb * entropy.BLOCK_WORDS
            fn = _build(key, int(quality), precision, out_words)
            streams, totals, flags, dc, overflow = fn(blocks)
            if bool(overflow):
                raise ValueError("coefficient out of Huffman table range")
        streams = np.asarray(streams)
        totals = np.asarray(totals)
        out = []
        for i in range(b_real):
            t = int(totals[i])
            payload = streams[i, : -(-t // 32)].astype(">u4")
            out.append(header_for(i) + payload.tobytes()[: -(-t // 8)])
        return out

    fn = _build(key, int(quality), precision, None)
    words, block_bits, flags, dc_all, overflow = fn(blocks)
    if bool(overflow):
        raise ValueError("coefficient out of Huffman table range")
    words = np.asarray(words)
    block_bits = np.asarray(block_bits)
    flags = np.asarray(flags)
    dc_all = np.asarray(dc_all)
    from .. import native

    eng = Engine(precision) if flags[:b_real].any() else None
    out = []
    for i in range(b_real):
        w_i, bits_i = words[i], block_bits[i]
        if flags[i].any():
            w_i, bits_i = eng._fixup_encode(
                blocks[i], quality, w_i, bits_i, dc_all[i], flags[i]
            )
        if native.available():
            out.append(header_for(i) + native.stitch(w_i, bits_i))
        else:
            out.append(header_for(i) + pack_ragged_words(w_i, bits_i))
    return out
