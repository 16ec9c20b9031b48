#!/usr/bin/env python3
"""Multi-process scaling-efficiency benchmark (BASELINE >=0.8 target).

Weak-scaling harness for the distributed encode path: N processes, each
owning one device (CPU here; on a pod, one process per host), assemble a
global 1-D mesh via ``jax.distributed`` and run the sharded pallas-free
encode pipeline (``parallel.batch._build``) over a batch of
``--per-proc`` images each.  The pipeline's overflow check is a
cross-process ``pmax``, so every timed step includes a real collective
-- the same program structure as a multi-host TPU job (SURVEY 2.4,
BASELINE config 5); the reference has no distributed anything to
compare against, so efficiency is measured against our own N=1.

Efficiency(N) = MP/s(N) / (N * MP/s(1))   [weak scaling: per-process
workload fixed, total grows with N].

Writes ``reports/scaling.json``.  On this 2-core dev box, N>2 rows are
oversubscribed (more processes than cores) and understate a pod's
efficiency; the record carries ``cores`` so readers can judge, and the
same harness runs unchanged on a pod (drop ``--cpu``, let TPU runtime
autodetect).

Usage:
    python scripts/scaling_bench.py [--procs 1,2,4,8] [--per-proc 4]
    python scripts/scaling_bench.py _worker <coord> <n> <pid> <outdir> \
        <per_proc> <size> <reps>          (internal)
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker():
    coord, n, pid, outdir, per, size, reps = sys.argv[2:9]
    n, pid, per, size, reps = map(int, (n, pid, per, size, reps))
    sys.path.insert(0, REPO)

    # one core per process (XLA's CPU thread pool would otherwise let
    # the N=1 baseline use every core, skewing efficiency downward)
    try:
        ncores = os.cpu_count() or 1
        os.sched_setaffinity(0, {pid % ncores})
    except (AttributeError, OSError):
        pass

    import jax

    jax.config.update("jax_platforms", "cpu")
    if n > 1:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=n, process_id=pid
        )
    assert jax.device_count() == n, jax.devices()

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tinyimgcodec_tpu import corpus
    from tinyimgcodec_tpu.parallel.batch import _build
    from tinyimgcodec_tpu.parallel.mesh import make_mesh
    from tinyimgcodec_tpu.parallel.tiled import _MeshKey

    mesh = make_mesh()
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    local = corpus.synthetic_corpus(per, size)
    images = jax.make_array_from_process_local_data(
        sharding, local, (n * per, size, size)
    )

    fn = _build(_MeshKey(mesh), 50, "fast", None)

    def run_once():
        out = fn(images)
        # overflow is pmax-reduced + replicated: reading it syncs all
        # processes, so wall time includes the collective every step
        return bool(np.asarray(out[-1].addressable_data(0)))

    run_once()  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        assert not run_once()
        times.append(time.perf_counter() - t0)
    rec = {"pid": pid, "times": times}
    with open(os.path.join(outdir, f"proc_{pid}.json"), "w") as f:
        json.dump(rec, f)
    print(f"proc {pid}/{n} median {sorted(times)[len(times)//2]:.4f}s",
          flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_config(n: int, per: int, size: int, reps: int, outdir: str):
    os.makedirs(outdir, exist_ok=True)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        # one XLA compute thread per process: honest core accounting
        # when processes > cores is impossible, but at least uniform
        XLA_FLAGS="--xla_cpu_multi_thread_eigen=false "
                  "--xla_force_host_platform_device_count=1",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "_worker",
             coord, str(n), str(pid), outdir, str(per), str(size),
             str(reps)],
            env=env, cwd=REPO,
        )
        for pid in range(n)
    ]
    deadline = time.time() + 600
    for p in procs:
        p.wait(timeout=max(1, deadline - time.time()))
        if p.returncode != 0:
            raise RuntimeError(f"worker failed (rc={p.returncode})")
    per_proc = []
    for pid in range(n):
        with open(os.path.join(outdir, f"proc_{pid}.json")) as f:
            per_proc.append(json.load(f)["times"])
    # per rep, the slowest process bounds the step (collective barrier)
    step = [max(t[i] for t in per_proc)
            for i in range(len(per_proc[0]))]
    med = sorted(step)[len(step) // 2]
    mp = n * per * size * size / 1e6
    return mp / med


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    procs = [int(x) for x in args.get("--procs", "1,2,4,8").split(",")]
    per = int(args.get("--per-proc", "4"))
    size = int(args.get("--size", "512"))
    reps = int(args.get("--reps", "5"))

    import tempfile

    rows = []
    base = None
    for n in procs:
        with tempfile.TemporaryDirectory() as td:
            mps = _run_config(n, per, size, reps, td)
        if base is None:
            base = mps / n  # MP/s per process at the first (ref) point
        eff = mps / (n * base)
        rows.append({"procs": n, "mps": round(mps, 3),
                     "efficiency": round(eff, 3)})
        print(f"N={n}: {mps:.2f} MP/s, efficiency {eff:.3f}", flush=True)

    record = {
        "benchmark": "weak_scaling_sharded_encode",
        "platform": "cpu-virtual-mesh",
        "cores": os.cpu_count(),
        "per_proc_images": per,
        "image_size": size,
        "quality": 50,
        "note": (
            "N processes x 1 device each over jax.distributed; CPU "
            "stand-in for hosts. Rows with procs > cores are "
            "oversubscribed and understate pod efficiency. Same "
            "harness runs unchanged on a TPU pod."
        ),
        "rows": rows,
    }
    out = os.path.join(REPO, "reports", "scaling.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "_worker":
        _worker()
    else:
        main()
