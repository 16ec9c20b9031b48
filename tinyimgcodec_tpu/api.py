"""Top-level one-call codec API.

``compress``/``decompress`` mirror the reference's byte-level entry points
(reference codec.py:133-189) but route through the TPU pipeline when
available (``tinyimgcodec_tpu.engine``), falling back to the host golden
path.  Selection can be forced with ``backend=``.

All knobs are validated through :class:`tinyimgcodec_tpu.config.CodecConfig`
at this boundary (the reference silently NaNs at quality=100, SURVEY quirk
2.5-6; here it raises).
"""

from __future__ import annotations

import warnings

import numpy as np

from . import container
from .config import CodecConfig

_ENGINES: dict = {}
_ENGINE_FAILED = False
_ENGINE_ERROR: BaseException | None = None


def _get_engine(precision: str = "exact"):
    """Lazily construct the JAX pipeline engine (imports jax on demand).

    On failure the original exception is kept (re-raised for
    ``backend="jax"``) and a RuntimeWarning is emitted once, so a TPU
    misconfiguration degrades loudly instead of silently running the
    ~1500x-slower host path.
    """
    global _ENGINE_FAILED, _ENGINE_ERROR
    if _ENGINE_FAILED:
        return None
    if precision not in _ENGINES:
        try:
            from .engine import Engine

            _ENGINES[precision] = Engine(precision)
        except Exception as e:
            _ENGINE_FAILED = True
            _ENGINE_ERROR = e
            warnings.warn(
                "JAX codec engine unavailable; falling back to the slow "
                f"host path ({type(e).__name__}: {e})",
                RuntimeWarning,
                stacklevel=3,
            )
            return None
    return _ENGINES[precision]


def _engine_unavailable_error() -> RuntimeError:
    err = RuntimeError("JAX engine unavailable (backend='jax' requested)")
    if _ENGINE_ERROR is not None:
        err.__cause__ = _ENGINE_ERROR
    return err


def compress(
    image: np.ndarray,
    quality: int = 50,
    auto_generate_huffman_table: bool = False,
    backend: str = "auto",
    precision: str = "exact",
    block_index: bool = False,
    config: CodecConfig | None = None,
) -> bytes:
    """Grayscale image (H, W) -> compressed bytes.

    backend: "auto" (TPU/JAX when available), "jax", or "host".
    precision: "exact" (byte-identical to the float64 reference) or
    "fast" (f32 transform; rare rounding ties may differ).
    block_index: append the TICX block-offset trailer so decoders can
    entropy-decode chunks in parallel (reference decoders ignore it).
    config: a validated CodecConfig; overrides the loose kwargs.
    """
    if config is None:
        config = CodecConfig(
            quality=quality,
            precision=precision,
            auto_huffman_table=auto_generate_huffman_table,
            block_index=block_index,
        )
    if backend not in ("auto", "jax", "host"):
        raise ValueError(f"unknown backend {backend!r}")
    image = np.asarray(image)
    if image.ndim != 2:
        raise ValueError("expected a 2-D grayscale image")
    if backend in ("auto", "jax"):
        engine = _get_engine(config.precision)
        if engine is not None:
            return engine.compress(
                image, config.quality,
                auto_table=config.auto_huffman_table,
                block_index=config.block_index,
            )
        if backend == "jax":
            raise _engine_unavailable_error()
    return container.compress(
        image, config.quality, config.auto_huffman_table,
        block_index=config.block_index,
    )


def decompress(data: bytes, backend: str = "auto",
               precision: str = "exact") -> np.ndarray:
    """Compressed bytes -> uint8 image (H, W)."""
    if backend not in ("auto", "jax", "host"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend in ("auto", "jax"):
        engine = _get_engine(precision)
        if engine is not None:
            return engine.decompress(data)
        if backend == "jax":
            raise _engine_unavailable_error()
    return container.decompress(data)
