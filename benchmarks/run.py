"""Benchmark suite over the reference's headline table
(`/root/reference/README.md:185-197`, mirrored in BASELINE.md).

Prints one JSON line per config plus a summary table.  Timing is
tunnel-safe: K data-dependent chained dispatches of a single-step jit, two
K values linear-fitted (see bench.py for why `block_until_ready` cannot be
trusted on remote-tunnelled devices).

Usage: python benchmarks/run.py [--configs small2d,large2d,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from benchmarks.timing import per_iter as _per_iter
from benchmarks.timing import per_iter_stats as _per_iter_stats

# (name, n_points, batch, grid, n_in, A100 fwd ms, A100 bwd ms[, weighted])
#
# Headline rows time the DEFAULT-weight call — the reference's timing
# table benchmarks `raster(points, rotation, translation)` whose weights
# are lazy FillArray Ones (`src/interface.jl:87-92`), so its A100 numbers
# never paid for a per-point weight either; backends take the uniform
# fast path exactly as a user's default call would.  The `_pw` variants
# re-time the big 2D rows with a random per-point weight (one extra sort
# payload plane on the binned backend) for coverage.
CONFIGS = [
    ("64sq_2d_1e4", 10_000, 64, (64, 64), 2, None, None),  # BASELINE cfg 2
    ("128sq_1e4", 10_000, 64, (128, 128), 3, 15.0, 1.0),
    ("1024sq_1e4", 10_000, 64, (1024, 1024), 3, 16.0, 2.0),
    ("128sq_1e5", 100_000, 64, (128, 128), 3, 153.0, 9.0),
    ("1024sq_1e5", 100_000, 64, (1024, 1024), 3, 154.0, 10.0),
    # no vs_a100 on the weighted rows: the A100 reference timed the
    # default-weight call, so the ratio would be apples-to-oranges
    ("128sq_1e5_pw", 100_000, 64, (128, 128), 3, None, None, True),
    ("1024sq_1e5_pw", 100_000, 64, (1024, 1024), 3, None, None, True),
    # documented fast mode (~2e-3): no vs_a100 (the A100 rows are
    # f32-faithful); the _bf16 suffix selects the backend (run_config)
    ("128sq_1e5_bf16", 100_000, 64, (128, 128), 3, None, None),
    ("1024sq_1e5_bf16", 100_000, 64, (1024, 1024), 3, None, None),
    ("128cube_1e5", 100_000, 1, (128, 128, 128), 3, None, None),
    # BASELINE cfg 4 at its stated size: 1M points, full gradients
    ("128cube_1e6", 1_000_000, 1, (128, 128, 128), 3, None, None),
    ("1024cube_1e5", 100_000, 1, (1024, 1024, 1024), 3, 24.0, 17.0),
]


def _args_for(n_points, batch, grid, n_in):
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    pts = jax.random.normal(ks[0], (n_points, n_in), jnp.float32) * 0.4
    n_out = len(grid)
    rot = np.zeros((batch, n_out, n_in), np.float32)
    angles = np.linspace(0, 2 * np.pi, batch, endpoint=False)
    for i, a in enumerate(angles):
        c, s = np.cos(a), np.sin(a)
        r = np.eye(n_in, dtype=np.float32)
        r[0, 0], r[0, -1], r[-1, 0], r[-1, -1] = c, -s, s, c
        rot[i] = r[:n_out]
    rot = jnp.asarray(rot)
    tr = jax.random.normal(ks[1], (batch, n_out), jnp.float32) * 0.1
    bg = jnp.zeros((batch,), jnp.float32)
    ow = jnp.ones((batch,), jnp.float32)
    pw = jax.random.uniform(ks[2], (n_points,), jnp.float32, 0.5, 2.0)
    return pts, rot, tr, bg, ow, pw


def run_config(name, n_points, batch, grid, n_in, ref_fwd, ref_bwd,
               weighted=False, with_grad=False):
    import jax
    import jax.numpy as jnp

    import dprast
    from dprast.ops import dispatch

    if name.endswith("_bf16"):
        backend_f = backend_b = "binned_bf16"
    else:
        backend_f, backend_b = dispatch.resolve_pair("auto", len(grid),
                                                     grid, n_points)
    args = _args_for(n_points, batch, grid, n_in)
    voxels = batch
    for s in grid:
        voxels *= s
    if voxels <= 2 ** 27:
        g = jax.random.normal(jax.random.PRNGKey(7), (batch,) + tuple(grid),
                              jnp.float32)
    else:
        # device-resident outer-product cotangent: threefry at >1e9
        # elements stalls the remote compiler, and a host transfer at
        # gigabyte sizes cannot cross the tunnel
        plane = jax.random.normal(jax.random.PRNGKey(7),
                                  (batch,) + tuple(grid[:-1]), jnp.float32)
        g = jax.jit(lambda p: p[..., None]
                    * jnp.ones((grid[-1],), jnp.float32) * 0.1)(plane)
    g.block_until_ready()

    pts, rot, tr, bg, ow, pw = args
    if not weighted:
        pw = jnp.ones((n_points,), jnp.float32)
    fwd = lambda c: dispatch.fwd_fn(backend_f)(
        grid, pts, rot, tr + c * 1e-30, bg, ow, pw,
        pw_uniform=not weighted).ravel()[0]

    def bwd(c, gg):
        res = dispatch.bwd_fn(backend_b)(
            grid, pts, rot, tr + c * 1e-30, bg, ow, pw, gg,
            pw_uniform=not weighted)
        # force the three gradients the reference's bwd rows compute
        # (`raster_pullback!(ds, points, rotation, translation)`,
        # README.md:185-197); the weight gradients may dead-code away
        # exactly as the reference never computed them on these rows
        return (res.translation.ravel()[0] + res.points.ravel()[0]
                + res.rotation.ravel()[0])
    rec = {"config": name,
           "backend": (backend_f if backend_f == backend_b
                       else f"{backend_f}+{backend_b}")}
    splats = n_points * batch * 2 ** len(grid)
    # report partially: a compile failure in one direction (e.g. the dev
    # tunnel's payload cap) must not discard the other's measurement
    try:
        t_fwd, s_fwd = _per_iter_stats(fwd)
        rec["t_fwd_ms"] = round(t_fwd * 1e3, 3)
        rec["t_fwd_ms_pm"] = round(s_fwd * 1e3, 3)
    except Exception as e:
        t_fwd = None
        rec["fwd_error"] = str(e)[:120]
    try:
        t_bwd, s_bwd = _per_iter_stats(bwd, g)
        rec["t_bwd_ms"] = round(t_bwd * 1e3, 3)
        rec["t_bwd_ms_pm"] = round(s_bwd * 1e3, 3)
    except Exception as e:
        t_bwd = None
        rec["bwd_error"] = str(e)[:120]
    if with_grad:
        # the actual training-loop cost: one fused value_and_grad step
        # through the public API / custom_vjp (the binned backend's
        # pullback reuses the forward's sorted frame there, skipping the
        # binning prep — cheaper than the standalone fwd + bwd sum
        # above).  The pose perturbation stops XLA hoisting iterations /
        # dead-coding the forward's fold.  The COTANGENT side is
        # perturbed only on the binned backward: its grid-sized unfold
        # depends on the cotangent alone and would hoist out of the
        # loop (under-measuring real training, where the cotangent
        # changes every step).  On the xla backward every cotangent
        # consumer also depends on the pose, so nothing can hoist — and
        # perturbing would bill a full-grid read+write materialisation
        # (~10 ms at 1024^3) that a real value_and_grad of this loss
        # never pays (its cotangent IS `gg`, used in place).
        perturb_g = backend_b.startswith("binned")

        api_backend = "binned_bf16" if name.endswith("_bf16") else "auto"

        def gstep(c, gg):
            def loss_fn(tr_):
                out = dprast.raster(grid, pts, rot, tr_, bg, ow,
                                    pw if weighted else None,
                                    backend=api_backend)
                gg_eff = gg + c * 1e-30 if perturb_g else gg
                return jnp.sum(out * gg_eff)
            val, grads = jax.value_and_grad(loss_fn)(tr + c * 1e-30)
            return val * 1e-30 + grads.ravel()[0]
        try:
            t_gr, s_gr = _per_iter_stats(gstep, g)
            rec["t_grad_ms"] = round(t_gr * 1e3, 3)
            rec["t_grad_ms_pm"] = round(s_gr * 1e3, 3)
        except Exception as e:
            rec["grad_error"] = str(e)[:120]
    if t_fwd is not None and t_bwd is not None:
        rec["splats_per_s"] = splats / (t_fwd + t_bwd)
        if ref_fwd is not None:
            rec["vs_a100"] = round((ref_fwd + ref_bwd) / 1e3
                                   / (t_fwd + t_bwd), 2)
    print(json.dumps(rec), flush=True)
    return rec


def run_multihost(args):
    """Pod-ready weak-scaling benchmark (BASELINE config 5 harness).

    Launch the SAME command on every host (or pass --coordinator /
    --num-processes / --process-id explicitly, e.g. for the two-process
    CPU-transport validation in tests/test_multihost_bench.py).  Work
    scales with the mesh: poses with the "poses" axis, points with the
    "points" axis, so per-chip work is constant and

        efficiency = per-chip splats/s  /  --baseline (the 1-chip row)

    is the >=85% north-star number (BASELINE.md) the day >=2 real hosts
    exist.  At BASELINE config 5's size run it as
    ``--multihost --mh-points 100000000 --mh-poses 1024`` with a points
    axis of >=8 shards (the binned per-shard point-id cap is 2^24).
    Process 0 prints one JSON line.
    """
    import jax

    # a JAX_PLATFORMS env override must be applied via the config BEFORE
    # the backend initialises — pre-registered platform plugins (e.g. the
    # axon TPU tunnel) otherwise outrank the env var
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from dprast.parallel import multihost

    multihost.initialize(args.coordinator, args.num_processes,
                         args.process_id)

    import jax.numpy as jnp

    from dprast.parallel import raster_sharded

    mesh = multihost.pod_mesh()
    n_chips = jax.device_count()
    n_poses_sh = mesh.shape["poses"]
    n_points_sh = mesh.shape["points"]
    grid = tuple(int(x) for x in args.mh_grid.split(","))
    b = args.mh_poses if args.mh_poses else 64 * n_poses_sh
    p = args.mh_points if args.mh_points else 100_000 * n_points_sh

    rng = np.random.default_rng(0)          # identical data everywhere
    pts = jnp.asarray(rng.standard_normal((p, 3)) * 0.4, jnp.float32)
    angles = np.linspace(0, 2 * np.pi, b, endpoint=False)
    rot = np.zeros((b, len(grid), 3), np.float32)
    rot[:, 0, 0] = np.cos(angles)
    rot[:, 0, 2] = -np.sin(angles)
    rot[:, 1, 1] = 1.0
    if len(grid) == 3:
        # full rotation: without the third row every point collapses
        # onto one z-plane — a degenerate, tile-imbalanced 3D workload
        rot[:, 2, 0] = np.sin(angles)
        rot[:, 2, 2] = np.cos(angles)
    rot = jnp.asarray(rot)
    tr = jnp.asarray(rng.standard_normal((b, len(grid))) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((b,) + grid), jnp.float32)

    def loss_fn(pts_, tr_, g_):
        out = raster_sharded(grid, pts_, rot, tr_, mesh=mesh)
        return jnp.sum(out * g_)

    def step(c, g_):
        val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            pts, tr + c * 1e-30, g_ + c * 1e-30)
        return val * 1e-30 + grads[0].ravel()[0]

    t = _per_iter(step, g)
    splats = p * b * 2 ** len(grid)
    per_chip = splats / t / n_chips
    rec = {"multihost": True, "n_processes": jax.process_count(),
           "n_chips": n_chips,
           "mesh": {k: int(v) for k, v in mesh.shape.items()},
           "grid": list(grid), "n_points": p, "batch": b,
           "t_step_ms": round(t * 1e3, 3),
           "splats_per_s_per_chip": per_chip}
    if args.baseline:
        rec["efficiency_vs_1chip"] = round(per_chip / args.baseline, 4)
    if jax.process_index() == 0:
        print(json.dumps(rec), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=None,
                    help="comma-separated subset of config names")
    ap.add_argument("--multihost", action="store_true",
                    help="weak-scaling fused-step benchmark over the pod "
                    "mesh (see run_multihost)")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--mh-grid", default="128,128")
    ap.add_argument("--mh-points", type=int, default=None,
                    help="total points (default 1e5 per points-shard)")
    ap.add_argument("--mh-poses", type=int, default=None,
                    help="total poses (default 64 per poses-shard)")
    ap.add_argument("--baseline", type=float, default=None,
                    help="1-chip splats/s for the efficiency ratio")
    ap.add_argument("--out", default=None,
                    help="also append result rows to this JSON-lines file")
    ap.add_argument("--grad", action="store_true",
                    help="also time the fused jax.grad training step")
    ap.add_argument("--platform", default=None, choices=["cpu"],
                    help="run on XLA:CPU (the reference's CPU columns) "
                    "instead of the default TPU device")
    args = ap.parse_args()
    if args.multihost:
        run_multihost(args)
        return
    if args.platform == "cpu":
        import jax
        # the env var alone does not beat pre-registered platform
        # plugins (the axon tunnel); the config update does
        jax.config.update("jax_platforms", "cpu")
    want = set(args.configs.split(",")) if args.configs else None
    rows = []
    for cfg in CONFIGS:
        if want and cfg[0] not in want:
            continue
        try:
            rows.append(run_config(*cfg, with_grad=args.grad))
        except Exception as e:  # keep going; report the failure
            rows.append({"config": cfg[0], "error": str(e)[:200]})
            print(json.dumps(rows[-1]), flush=True)
    if args.out:
        import datetime
        with open(args.out, "a") as f:
            for r in rows:
                f.write(json.dumps(dict(
                    r, date=datetime.date.today().isoformat())) + "\n")
    print(f"\n{'config':<14} {'backend':<8} {'fwd ms':>9} {'bwd ms':>9} "
          f"{'splats/s':>12} {'vs A100':>8}")
    for r in rows:
        fwd = r.get("t_fwd_ms")
        bwd = r.get("t_bwd_ms")
        sps = r.get("splats_per_s")
        print(f"{r['config']:<14} {r['backend']:<8} "
              f"{fwd if fwd is not None else '-':>9} "
              f"{bwd if bwd is not None else '-':>9} "
              f"{f'{sps:.3e}' if sps else '-':>12} "
              f"{r.get('vs_a100', '-'):>8}")


if __name__ == "__main__":
    main()
