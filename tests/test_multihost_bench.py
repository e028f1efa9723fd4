"""Smoke test for the pod scaling-efficiency harness
(`benchmarks/run.py --multihost`, BASELINE config 5): first a real 1-chip
baseline row, then two OS processes forming a `jax.distributed` group over
the CPU transport running the fused value_and_grad weak-scaling step;
process 0 must emit one valid JSON record whose efficiency ratio is the
measured per-chip throughput against the measured 1-chip baseline — the
one field the harness exists to produce."""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_group(repo, n_procs, device_count, baseline=None):
    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["XLA_FLAGS"] = \
        f"--xla_force_host_platform_device_count={device_count}"
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, os.path.join(repo, "benchmarks", "run.py"),
           "--multihost", "--coordinator", coord,
           "--num-processes", str(n_procs),
           "--mh-grid", "16,16", "--mh-points", "501", "--mh-poses", "6"]
    if baseline is not None:
        cmd += ["--baseline", repr(baseline)]
    procs = [subprocess.Popen(cmd + ["--process-id", str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env, text=True, cwd=repo)
             for i in range(n_procs)]
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
    return json.loads(lines[0])


def test_multihost_bench_two_process_cpu():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # 1-chip baseline row: same total problem on a single-device mesh
    base = _run_group(repo, n_procs=1, device_count=1)
    assert base["n_chips"] == 1
    assert base["splats_per_s_per_chip"] > 0

    rec = _run_group(repo, n_procs=2, device_count=4,
                     baseline=base["splats_per_s_per_chip"])
    assert rec["n_processes"] == 2
    assert rec["n_chips"] == 8
    assert rec["mesh"] == {"poses": 2, "points": 4}
    assert rec["n_points"] == 501 and rec["batch"] == 6
    assert rec["splats_per_s_per_chip"] > 0
    # the ratio must be computed from the measured baseline and land in a
    # physically plausible band (8 virtual CPU "chips" time-share the same
    # cores as the 1-chip baseline, so anywhere in (0, 1.5) is sane; the
    # >= 0.85 north-star claim needs >= 2 real hosts, BASELINE.md)
    assert rec["efficiency_vs_1chip"] == pytest.approx(
        rec["splats_per_s_per_chip"] / base["splats_per_s_per_chip"],
        rel=1e-2, abs=1e-4)  # the harness rounds the ratio to 4 decimals
    assert 0 < rec["efficiency_vs_1chip"] < 1.5
