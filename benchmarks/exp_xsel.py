"""r5 experiment: trim the backward kernel's x-selection VPU work.

The shipped kernel materialises ``bx``/``dbx`` (the weighted x one-hot
and its derivative, each (cols_e, chunk)) and reduces three products.
The candidate computes four MASKED row sums instead —
``a = Σ v1·lo, b = Σ v1·hi, c0 = Σ dp·lo, c1 = Σ dp·hi`` — and finishes
with (1, C) lane-row math: algebraically identical (same selected
elements, ulp-level fp reassociation), ~25% fewer VPU ops in the
reduction block.  Matters only if Mosaic does not overlap that VPU
block with the gather matmuls.  Timed at the single-tile flagship
config (128²×64×1e5), where the kernel IS the backward.

Usage: python benchmarks/exp_xsel.py
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dprast.ops.splat_binned import (_SPLIT_TERMS, _bwd_kernel,
                                     _default_chunk, _keys_and_local,
                                     _planes_bwd, _prep_direct,
                                     tile_shape_for)
from benchmarks.timing import per_iter


def _kernel_absums(st_ref, lane_ref, g_ref, buf_ref, *, ts, chunk, n_out):
    """Single-tile 2D variant with masked-row-sum x selection."""
    rows_e = ts[0]
    cols_e = ts[1]
    gt = g_ref[0]                                         # (cols_e, rows_e)
    lane = lane_ref[0]
    rows = [lane[0:1, :], lane[0:1, :] + 1]
    dly = lane[1:2, :]
    g_terms = []
    rem = gt
    for _ in range(_SPLIT_TERMS):
        t_i = rem.astype(jnp.bfloat16)
        g_terms.append(t_i)
        rem = rem - t_i.astype(jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    iota_r = lax.broadcasted_iota(jnp.int32, (rows_e, chunk), 0)

    def gather_row(r):
        o = (iota_r == r.astype(jnp.int32)).astype(jnp.bfloat16)
        acc = None
        for t_i in g_terms:
            part = lax.dot_general(t_i, o, dims,
                                   preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        return acc

    p0, p1 = [gather_row(r) for r in rows]
    v1 = (1 - dly) * p0 + dly * p1
    dp = p1 - p0
    ix0 = lane[-2:-1, :].astype(jnp.int32)
    dlx = lane[-1:, :]
    iota = lax.broadcasted_iota(jnp.int32, (cols_e, chunk), 0)
    lo = iota == ix0
    hi = iota == ix0 + 1
    a = jnp.sum(jnp.where(lo, v1, 0.0), axis=0, keepdims=True)
    b = jnp.sum(jnp.where(hi, v1, 0.0), axis=0, keepdims=True)
    c0 = jnp.sum(jnp.where(lo, dp, 0.0), axis=0, keepdims=True)
    c1 = jnp.sum(jnp.where(hi, dp, 0.0), axis=0, keepdims=True)
    omx = 1 - dlx
    gw = a * omx + b * dlx
    duy = c0 * omx + c1 * dlx
    dux = b - a
    buf_ref[0] = jnp.concatenate([duy, dux, gw], axis=0)


def main():
    grid = (128, 128)
    n_out = 2
    p, b = 100_000, 64
    chunk = _default_chunk(grid, p)
    ts = tile_shape_for(grid)

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    pts = jax.random.normal(ks[0], (p, 3), jnp.float32) * 0.4
    rot = jnp.tile(jnp.eye(3)[:n_out][None], (b, 1, 1))
    tr = jax.random.normal(ks[1], (b, n_out), jnp.float32) * 0.1

    def prep(tr_):
        _, locs, _ = _keys_and_local(grid, ts, pts, rot, tr_)
        ptidx = jnp.broadcast_to(
            jnp.arange(p, dtype=jnp.float32)[None, :], locs[0].shape)
        return jax.vmap(lambda *pls: _prep_direct(
            list(pls), [0.0] * n_out + [float(p)], chunk))(*locs, ptidx)

    data, slot_tile = jax.jit(prep)(tr)
    data.block_until_ready()
    s_pad = data.shape[-1]
    n_slots = s_pad // chunk
    print(f"grid={grid} chunk={chunk} s_pad={s_pad} n_slots={n_slots}",
          flush=True)

    g = jax.random.normal(ks[3], (b,) + grid, jnp.float32)
    g_in = jax.jit(lambda g_: jnp.swapaxes(g_, 1, 2))(g)
    g_in.block_until_ready()
    lane_b = jax.jit(lambda cd: _planes_bwd(cd, ts, n_out))(data[:, :n_out])
    lane_b.block_until_ready()

    def run(kern_fn, lane_, g_, st_, extra):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_slots),
            in_specs=[pl.BlockSpec((1, lane_.shape[1], chunk),
                                   lambda bb, s, st: (bb, 0, s),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, ts[1], ts[0]),
                                   lambda bb, s, st: (bb, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, n_out + 1, chunk),
                                   lambda bb, s, st: (bb, 0, s),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            functools.partial(kern_fn, ts=ts, chunk=chunk, n_out=n_out,
                              **extra),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, n_out + 1, s_pad),
                                           jnp.float32),
        )(st_, lane_, g_)

    base = jax.jit(lambda l, gg, st: run(_bwd_kernel, l, gg, st,
                                         dict(halo=False)))(
        lane_b, g_in, slot_tile)
    cand = jax.jit(lambda l, gg, st: run(_kernel_absums, l, gg, st, {}))(
        lane_b, g_in, slot_tile)
    err = float(jnp.max(jnp.abs(base - cand)))
    sc = float(jnp.max(jnp.abs(base)))
    print(f"max abs diff {err:.3e} (scale {sc:.3e})", flush=True)

    t0 = per_iter(lambda c, l, gg, st: run(
        _bwd_kernel, l + c * 1e-30, gg, st,
        dict(halo=False)).ravel()[0], lane_b, g_in, slot_tile)
    print(f"kernel shipped (bx/dbx)   {t0*1e3:8.2f} ms", flush=True)
    t1 = per_iter(lambda c, l, gg, st: run(
        _kernel_absums, l + c * 1e-30, gg, st, {}).ravel()[0],
        lane_b, g_in, slot_tile)
    print(f"kernel a/b masked sums    {t1*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
