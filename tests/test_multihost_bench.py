"""Smoke test for the pod scaling-efficiency harness
(`benchmarks/run.py --multihost`, BASELINE config 5): two OS processes form
a real `jax.distributed` group over the CPU transport and run the fused
value_and_grad weak-scaling step; process 0 must emit one valid JSON record
with the per-chip throughput and the efficiency ratio."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_multihost_bench_two_process_cpu():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, os.path.join(repo, "benchmarks", "run.py"),
           "--multihost", "--coordinator", coord, "--num-processes", "2",
           "--mh-grid", "16,16", "--mh-points", "501", "--mh-poses", "6",
           "--baseline", "1.0"]
    procs = [subprocess.Popen(cmd + ["--process-id", str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env, text=True, cwd=repo)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost bench worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)

    # exactly one process (id 0) prints the record
    lines = [ln for out in outs for ln in out.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert rec["n_processes"] == 2
    assert rec["n_chips"] == 8
    assert rec["mesh"] == {"poses": 2, "points": 4}
    assert rec["n_points"] == 501 and rec["batch"] == 6
    assert rec["splats_per_s_per_chip"] > 0
    assert rec["efficiency_vs_1chip"] == pytest.approx(
        rec["splats_per_s_per_chip"], rel=1e-6)  # baseline 1.0
