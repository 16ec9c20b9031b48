"""Native C extension tests: stitch + entropy encode/decode vs host golden."""

import os

import numpy as np
import pytest

from tests.conftest import synthetic_image
from tinyimgcodec_tpu import container, golden, native
from tinyimgcodec_tpu.bitstream import pack_ragged_words
from tinyimgcodec_tpu.constants import HEADER_BYTES

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C compiler available"
)


def test_stitch_matches_numpy():
    rng = np.random.RandomState(0)
    n, stride = 64, 8
    words = rng.randint(0, 1 << 32, size=(n, stride), dtype=np.uint64).astype(
        np.uint32
    )
    bits = rng.randint(0, stride * 32 + 1, size=n).astype(np.int32)
    # zero invalid tail bits so both paths see identical data
    lane = np.arange(stride * 32)
    bitmask = lane[None, :] < bits[:, None]
    b = np.unpackbits(words.astype(">u4").view(np.uint8), axis=1) * bitmask
    words = np.packbits(b, axis=1).view(">u4").astype(np.uint32)
    assert native.stitch(words, bits) == pack_ragged_words(words, bits)


def test_entropy_decode_roundtrip(small_image):
    data = container.compress(small_image, 50)
    arrays = container.decompress_to_arrays(data)
    dc, ac = native.entropy_decode(
        data[HEADER_BYTES:], arrays.nblocks
    )
    assert np.array_equal(dc, arrays.dc)
    assert np.array_equal(ac, arrays.ac)


@pytest.mark.parametrize("quality", [10, 50, 90])
def test_entropy_encode_matches_host(quality):
    img = synthetic_image(64, 80, seed=31)
    arrays = golden.encode_arrays(img, quality)
    payload, nbits = native.entropy_encode(arrays.dc, arrays.ac)
    assert payload == container.compress(img, quality)[HEADER_BYTES:]
    assert (nbits + 7) // 8 == len(payload)


def test_entropy_decode_truncated():
    img = synthetic_image(64, 64, seed=32)
    data = container.compress(img, 50)
    payload = data[HEADER_BYTES:]
    half = payload[: len(payload) // 2]
    dc, ac = native.entropy_decode(half, 64)
    ref = container.decompress_to_arrays(data[: HEADER_BYTES + len(half)])
    # early fully-decoded blocks must match; tail is zero-filled
    full = container.decompress_to_arrays(data)
    n_ok = next(
        (i for i in range(64) if not np.array_equal(ac[i], full.ac[i])), 64
    )
    assert n_ok > 10  # got a meaningful prefix
    assert np.all(dc[n_ok + 1 :] == 0)


def test_entropy_decode_garbage_no_crash():
    rng = np.random.RandomState(4)
    junk = rng.bytes(512)
    dc, ac = native.entropy_decode(junk, 100)
    assert dc.shape == (100,) and ac.shape == (100, 63)


def test_native_sanitizer_selftest(tmp_path):
    """Build native/selftest.c with ASan+UBSan and run it (SURVEY 5:
    host native code gets sanitizers; device XLA programs need none).

    The C harness round-trips the entropy coder, checks the stitcher
    against a naive bit appender, feeds corrupt/truncated payloads, and
    probes capacity edges -- any out-of-bounds access or UB aborts the
    subprocess via the sanitizer runtime.
    """
    import subprocess
    import sys as _sys

    from tinyimgcodec_tpu.constants import (
        AC_CODE, AC_CODELEN, DC_CODE, DC_CODELEN,
    )
    from tinyimgcodec_tpu.native import _DIR, _default_luts

    src_dir = _DIR
    exe = tmp_path / "selftest"
    cc = os.environ.get("CC", "cc")
    build = subprocess.run(
        [cc, "-O1", "-g", "-fsanitize=address,undefined",
         "-fno-sanitize-recover=all",
         os.path.join(src_dir, "selftest.c"),
         os.path.join(src_dir, "codec_native.c"),
         os.path.join(src_dir, "embedded.c"),
         "-o", str(exe)],
        capture_output=True,
    )
    if build.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: {build.stderr[:200]}")

    (dc_lut, ac_lut) = _default_luts()
    blob = b"".join([
        np.ascontiguousarray(DC_CODE, np.uint32).tobytes(),
        np.ascontiguousarray(DC_CODELEN, np.uint8).tobytes(),
        np.ascontiguousarray(AC_CODE.reshape(-1), np.uint32).tobytes(),
        np.ascontiguousarray(AC_CODELEN.reshape(-1), np.uint8).tobytes(),
        dc_lut[0].tobytes(), dc_lut[1].tobytes(),
        ac_lut[0].tobytes(), ac_lut[1].tobytes(),
    ])
    tables = tmp_path / "tables.bin"
    tables.write_bytes(blob)
    run = subprocess.run(
        [str(exe), str(tables)], capture_output=True, timeout=120
    )
    assert run.returncode == 0, (
        run.stdout.decode(errors="replace")
        + run.stderr.decode(errors="replace")
    )
    assert b"selftest OK" in run.stdout
