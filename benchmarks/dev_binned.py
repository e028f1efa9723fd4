"""Dev harness for the binned backend: agreement vs the scatter oracle.

CPU interpret mode by default; pass --tpu to run compiled on the device.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

p = argparse.ArgumentParser()
p.add_argument("--tpu", action="store_true")
p.add_argument("--grid", default="256,256")
p.add_argument("--points", type=int, default=400)
p.add_argument("--batch", type=int, default=3)
p.add_argument("--chunk", type=int, default=128)
p.add_argument("--fwd-only", action="store_true")
args = p.parse_args()

if not args.tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

if not args.tpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dprast.ops import core, splat_binned  # noqa: E402
from dprast.utils.testing import raster_numpy, raster_pullback_numpy  # noqa: E402
from dprast.utils.testing import fixtures  # noqa: E402

grid = tuple(int(x) for x in args.grid.split(","))
fx = fixtures(seed=3, n_points=args.points, batch_size=args.batch, n_in=3,
              n_out=len(grid))
fargs = tuple(jnp.asarray(v, jnp.float32) for v in fx.values())

out_b = splat_binned.raster_fwd(grid, *fargs, chunk=args.chunk)
out_x = jnp.asarray(raster_numpy(grid, *[np.asarray(a) for a in fargs]))
scale = max(float(jnp.max(jnp.abs(out_x))), 1.0)
err = float(jnp.max(jnp.abs(out_b - out_x))) / scale
print(f"fwd  max normalized err: {err:.3e}")
assert err < 1e-5, "forward mismatch"

if not args.fwd_only:
    g = jnp.asarray(np.random.default_rng(7).standard_normal(out_x.shape),
                    jnp.float32)
    pb_b = splat_binned.raster_pullback(grid, *fargs, g, chunk=args.chunk)
    pb_x_d = raster_pullback_numpy(grid, *[np.asarray(a) for a in fargs],
                                   np.asarray(g))
    pb_x = [jnp.asarray(pb_x_d[k]) for k in pb_b._fields]
    worst = 0.0
    for name, a, b in zip(pb_b._fields, pb_b, pb_x):
        sc = max(float(jnp.max(jnp.abs(b))), 1.0)
        e = float(jnp.max(jnp.abs(a - b))) / sc
        worst = max(worst, e)
        print(f"bwd  {name:13s} max normalized err: {e:.3e}")
    assert worst < 1e-5, "backward mismatch"
print("OK")
