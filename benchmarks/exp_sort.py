"""Design-space micro-benchmarks for the binned backend's data movement
(the round-3 perf target: the binning sort + pullback unsort are ~30 ms
of the 48 ms 1024^2 backward; `profile_binned.py`).

Measures, at the flagship-large shape (B=64, s_pad~121k, P=1e5):
  - lax.sort cost vs payload-operand count (the current design's unit)
  - take_along_axis gather (permutation apply) per plane
  - scatter (.at[].set / .add) as the sort replacement
  - blocked-cumsum rank computation (counting-sort prep without a sort)

Usage: python benchmarks/exp_sort.py [--points 100000] [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from benchmarks.timing import per_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--spad", type=int, default=120_832)
    ap.add_argument("--nt", type=int, default=81)
    args = ap.parse_args()
    b, p, s_pad, nt = args.batch, args.points, args.spad, args.nt
    print(f"B={b} P={p} s_pad={s_pad} nt={nt}", flush=True)

    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    key_f = jax.random.uniform(ks[0], (b, s_pad), jnp.float32, 0, p)
    planes = [jax.random.normal(ks[1 + i], (b, s_pad), jnp.float32)
              for i in range(4)]
    # a realistic permutation: s_pad -> first p rows
    perm = jax.vmap(lambda k: jax.random.permutation(k, s_pad)[:p])(
        jax.random.split(ks[5], b))                   # (b, p) int32 unique
    perm = perm.astype(jnp.int32)
    vals_p = [jax.random.normal(ks[6], (b, p), jnp.float32)
              for _ in range(3)]
    tile_key = jax.random.randint(ks[7], (b, p), 0, nt, jnp.int32)

    # -- sort cost vs operand count ------------------------------------
    # is_stable=False matches the production sorts (unique packed keys /
    # unstable unsort).  r4 measured, 4 x (16, 121k) chunked: key-only
    # 2.9 ms, key+1 4.3, key+3 11.4 — payload count, not row count, is
    # the lever (hence the pw_uniform payload drop in splat_binned).
    for k in range(0, 5):
        def f(c, kf, *pls):
            ops = lax.sort((kf + c * 1e-30,) + pls, dimension=1,
                           num_keys=1, is_stable=False)
            return sum(o.ravel()[0] for o in ops)
        t = per_iter(f, key_f, *planes[:k])
        print(f"sort key+{k} payloads      {t*1e3:8.2f} ms", flush=True)

    # -- gather: apply a known permutation -----------------------------
    for k in (1, 2, 3):
        def g(c, pm, *pls):
            outs = [jnp.take_along_axis(pl_ + c * 1e-30, pm, axis=1)
                    for pl_ in pls]
            return sum(o.ravel()[0] for o in outs)
        t = per_iter(g, perm, *planes[:k])
        print(f"gather (take_along) x{k}   {t*1e3:8.2f} ms", flush=True)

    # gather via one batched gather of a stacked (b, k, s_pad) operand
    stacked = jnp.stack(planes[:3], axis=1)
    def g_stk(c, pm, st):
        out = jnp.take_along_axis(st + c * 1e-30, pm[:, None, :], axis=2)
        return out.ravel()[0]
    t = per_iter(g_stk, perm, stacked)
    print(f"gather stacked (b,3,s)     {t*1e3:8.2f} ms", flush=True)

    # -- scatter: set rows at unique destinations ----------------------
    for k in (1, 3):
        def sc(c, pm, *vps):
            outs = [jnp.zeros((b, s_pad), jnp.float32).at[
                jnp.arange(b)[:, None], pm].set(v + c * 1e-30)
                for v in vps[:k]]
            return sum(o.ravel()[0] for o in outs)
        t = per_iter(sc, perm, *vals_p)
        print(f"scatter set x{k}            {t*1e3:8.2f} ms", flush=True)

    def sca(c, pm, v):
        out = jnp.zeros((b, s_pad), jnp.float32).at[
            jnp.arange(b)[:, None], pm].add(v + c * 1e-30)
        return out.ravel()[0]
    t = per_iter(sca, perm, vals_p[0])
    print(f"scatter add x1             {t*1e3:8.2f} ms", flush=True)

    # -- counting-sort rank: blocked one-hot cumsum over tiles ---------
    # rank[i] = #{j < i : key[j] == key[i]};  blocks of L points
    for L in (512, 1024):
        nb = -(-p // L)
        p_pad = nb * L
        def rank_f(c, tk):
            tkp = jnp.pad(tk, ((0, 0), (0, p_pad - p)),
                          constant_values=nt)
            oh = (tkp.reshape(b, nb, L)[..., None]
                  == jnp.arange(nt)[None, None, None, :])  # (b,nb,L,nt)
            ohf = oh.astype(jnp.float32) + c * 1e-30
            blk = ohf.sum(axis=2)                          # (b,nb,nt)
            offs = jnp.cumsum(blk, axis=1) - blk           # excl, blocks
            within = jnp.cumsum(ohf, axis=2) - ohf         # excl, in-block
            rank = (jnp.take_along_axis(
                (offs[:, :, None, :] + within),
                tkp.reshape(b, nb, L, 1).clip(0, nt - 1), axis=3))
            return rank.ravel()[0]
        t = per_iter(rank_f, tile_key)
        print(f"rank blocked-cumsum L={L:<5} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
