"""Top-level one-call codec API.

``compress``/``decompress`` mirror the reference's byte-level entry points
(reference codec.py:133-189) but route through the TPU pipeline when
available (``tinyimgcodec_tpu.engine``), falling back to the host golden
path.  Selection can be forced with ``backend=``.
"""

from __future__ import annotations

import numpy as np

from . import container

_ENGINES: dict = {}
_ENGINE_FAILED = False


def _get_engine(precision: str = "exact"):
    """Lazily construct the JAX pipeline engine (imports jax on demand)."""
    global _ENGINE_FAILED
    if _ENGINE_FAILED:
        return None
    if precision not in _ENGINES:
        try:
            from .engine import Engine

            _ENGINES[precision] = Engine(precision)
        except Exception:
            _ENGINE_FAILED = True
            return None
    return _ENGINES[precision]


def compress(
    image: np.ndarray,
    quality: int = 50,
    auto_generate_huffman_table: bool = False,
    backend: str = "auto",
    precision: str = "exact",
) -> bytes:
    """Grayscale image (H, W) -> compressed bytes.

    backend: "auto" (TPU/JAX when available), "jax", or "host".
    precision: "exact" (byte-identical to the float64 reference) or
    "fast" (f32 transform; rare rounding ties may differ).
    """
    image = np.asarray(image)
    if image.ndim != 2:
        raise ValueError("expected a 2-D grayscale image")
    if backend in ("auto", "jax") and not auto_generate_huffman_table:
        engine = _get_engine(precision)
        if engine is not None:
            return engine.compress(image, quality)
        if backend == "jax":
            raise RuntimeError("JAX engine unavailable")
    return container.compress(image, quality, auto_generate_huffman_table)


def decompress(data: bytes, backend: str = "auto",
               precision: str = "exact") -> np.ndarray:
    """Compressed bytes -> uint8 image (H, W)."""
    if backend in ("auto", "jax"):
        engine = _get_engine(precision)
        if engine is not None:
            return engine.decompress(data)
        if backend == "jax":
            raise RuntimeError("JAX engine unavailable")
    return container.decompress(data)
