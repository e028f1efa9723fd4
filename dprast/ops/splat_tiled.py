"""Tile-binned Pallas backend for LARGE 2D grids (e.g. 1024²).

The one-hot matmul formulation (`dprast.ops.splat_matmul`,
`dprast.ops.pallas_splat`) does O(H·W) MXU work per point·pose, which is
wasteful once the grid no longer fits a single MXU tile pair: at 1024² it
is 64x the work of 128².  This backend restores O(T_y·T_x) per point·pose
by binning splat candidates to 128x128 output tiles and rendering each
tile from only its own candidates — the TPU-native analogue of the
reference relying on global-memory atomics to make large grids "free"
(`ext/DiffPointRasterisationCUDAExt.jl`; the reference never needed
binning because atomic scatters don't care about output size).

Pipeline (all inside jit):

1. transform points (full precision), take the 4 stencil-corner tiles of
   each point as *candidates*, dedup per point, drop out-of-grid corners
   (reference drop semantics, `src/raster.jl:62`).
2. bin candidates to tiles with ONE `argsort` per pose plus pure gathers
   (no XLA scatters — TPU scatters serialise).  Each tile's segment is
   padded to a multiple of the kernel chunk so Pallas instances never
   read or write another tile's rows.
3. Pallas kernel, grid (poses, tiles): each instance owns one 128x128
   output tile in VMEM, DMAs its candidate rows from HBM chunk by chunk,
   and renders them with the same exact-one-hot bf16-split matmuls as
   `pallas_splat` (coordinates shifted to tile-local frame).
4. backward: same structure; per-candidate point-gradient rows are
   DMA-written back to HBM in slot order, gathered back to candidate
   order in XLA (slots are computed with a gather-only inverse — no
   scatter), and reduced over the 4 candidate copies and poses.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dprast.ops.core import PullbackResult

TILE = 128          # 2D output tile edge (both axes)
_CHUNK = 512        # candidate rows per DMA/matmul step
_PACKW = 8          # packed row: [u..., w, pts...] padded to 8 lanes


def tile_shape_for(grid_size):
    """Per-axis tile shape.  2D: 128x128.  3D: a (t_z, t_y) plane tile of
    at most 128 flattened rows (the MXU M dimension) x a full-lane x tile;
    for very large x the tile widens so the tile COUNT stays tractable
    (segment padding scales with it)."""
    if len(grid_size) == 2:
        return (TILE, TILE)
    gz, gy, gx = grid_size
    tz = 8 if gz % 8 == 0 else gz
    ty = min(128 // tz, gy)
    while gy % ty:
        ty -= 1
    tx = gx if gx <= 1024 else 1024
    while gx % tx:
        tx -= 128 if tx > 128 else 1
    return (tz, ty, tx)


def supported(n_out: int, grid_size=None) -> bool:
    """Capability: tile-aligned 2D/3D grids.  (The auto-dispatch
    additionally prefers this backend only for grids where per-point work
    dominates — see `dispatch.resolve`.)"""
    if n_out not in (2, 3):
        return False
    if grid_size is not None:
        ts = tile_shape_for(grid_size)
        if any(g % t for g, t in zip(grid_size, ts)):
            return False
        if len(grid_size) == 3 and ts[0] * ts[1] > 128:
            return False
    return True


def _interpret_default() -> bool:
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover - defensive
        return True


def _transform_u(points, rotation, translation, grid_size):
    """(B, P, 2) fractional 0-based grid coords, full precision."""
    q = jnp.einsum("boi,pi->bpo", rotation, points,
                   precision=lax.Precision.HIGHEST)
    q = q + translation[:, None, :]
    scale = jnp.asarray(grid_size, q.dtype) / 2
    return (q + 1) * scale - 0.5


def _candidates(u, grid_size, tile_shape):
    """Per pose: candidate tile ids for the 2^n stencil corners of each
    point, deduplicated, out-of-grid corners -> sentinel NT.

    u: (P, n) -> tid (2^n * P,) int32 in [0, NT].
    """
    n = len(grid_size)
    nts = [g // t for g, t in zip(grid_size, tile_shape)]
    nt = math.prod(nts)
    r0 = (jnp.ceil(u) - 1).astype(jnp.int32)            # (P, n)
    tids = []
    for k in range(2 ** n):
        shift = [(k >> (n - 1 - i)) & 1 for i in range(n)]
        ok = jnp.ones(u.shape[0], bool)
        t = jnp.zeros(u.shape[0], jnp.int32)
        for i in range(n):
            c = r0[:, i] + shift[i]
            ok = ok & (c >= 0) & (c < grid_size[i])
            t = t * nts[i] + c // tile_shape[i]
        t = jnp.where(ok, t, nt)
        for prev in tids:
            t = jnp.where(t == prev, nt, t)
        tids.append(t)
    return jnp.stack(tids, axis=1).reshape(-1)          # (2^n P,)


def _bin_one_pose(tid, nt, chunk, s_pad):
    """Sort-free-gather binning for one pose.

    Returns (src_cand (S_pad,) int32, valid (S_pad,) bool,
             chunk_offsets (NT+1,) int32, slot_of_cand (4P,) int32).
    Only ONE argsort; everything else is searchsorted/gather/cumsum.
    """
    n4p = tid.shape[0]
    order = jnp.argsort(tid)                            # (4P,)
    sorted_tid = tid[order]
    seg_start = jnp.searchsorted(sorted_tid,
                                 jnp.arange(nt + 1, dtype=tid.dtype))
    counts = jnp.diff(seg_start)                        # (NT,)
    padded = -(-counts // chunk) * chunk
    poffs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(padded).astype(jnp.int32)])

    # dest -> src (gather form): slot s belongs to tile t, local rank r.
    s = jnp.arange(s_pad, dtype=jnp.int32)
    t_of_s = jnp.searchsorted(poffs, s, side="right").astype(jnp.int32) - 1
    t_of_s = jnp.clip(t_of_s, 0, nt - 1)
    r = s - poffs[t_of_s]
    valid = r < counts[t_of_s]
    src_sorted = jnp.clip(seg_start[t_of_s] + r, 0, n4p - 1)
    src_cand = order[src_sorted]

    # cand -> slot (for the backward unsort), also gather-only:
    # rank within segment = position in sorted order - segment start.
    rank_sorted = jnp.arange(n4p, dtype=jnp.int32) - seg_start[sorted_tid]
    slot_sorted = jnp.where(sorted_tid < nt,
                            poffs[jnp.clip(sorted_tid, 0, nt - 1)]
                            + rank_sorted,
                            s_pad)
    # invert the sort permutation with a second argsort-free trick:
    # slot_of_cand[order] = slot_sorted  <=>  gather via inverse; the
    # inverse permutation is itself obtained by argsort(order), but we can
    # avoid it: sorting (order, slot_sorted) pairs by `order` is exactly a
    # gather of slot_sorted at inv(order).  One extra argsort is the
    # simplest correct form:
    inv = jnp.argsort(order)
    slot_of_cand = slot_sorted[inv]
    return src_cand, valid, (poffs // chunk).astype(jnp.int32), slot_of_cand


def _pack_fwd(u, pw_ow, src_cand, valid, n_cand):
    """(S_pad, PACKW) rows [u..., w, 0...]; invalid slots w=0, u=-8
    (maps every corner out of any tile)."""
    n = u.shape[1]
    p_idx = src_cand // n_cand
    cols = [jnp.where(valid, u[p_idx, i], -8.0) for i in range(n)]
    cols.append(jnp.where(valid, pw_ow[p_idx], 0.0))
    cols += [jnp.zeros_like(cols[0])] * (_PACKW - len(cols))
    return jnp.stack(cols, axis=1)


def _onehot_pair_cols(u_col, n, off):
    """f32 one-hot-pair factor (C, n) for tile-local coords, from global
    fractional coords u (C,1) and tile origin `off` (traced scalar)."""
    r0f = jnp.ceil(u_col) - 1
    dl = u_col - r0f
    r0 = r0f.astype(jnp.int32) - off
    i = lax.broadcasted_iota(jnp.int32, (u_col.shape[0], n), 1)
    a = jnp.where(i == r0, 1 - dl, 0.0) + jnp.where(i == r0 + 1, dl, 0.0)
    da = jnp.where(i == r0 + 1, 1.0, 0.0) - jnp.where(i == r0, 1.0, 0.0)
    return a, da, dl, r0


def _fwd_kernel(offs_ref, data_ref, out_ref, scratch, sem, *, grid_size,
                chunk):
    h, w = grid_size
    ntx = w // TILE
    b = pl.program_id(0)
    t = pl.program_id(1)
    oy = (t // ntx) * TILE
    ox = (t % ntx) * TILE
    c0 = offs_ref[0, 0, t]
    c1 = offs_ref[0, 0, t + 1]
    bf16, f32 = jnp.bfloat16, jnp.float32

    out_ref[0] = jnp.zeros((TILE, TILE), f32)

    def body(i, _):
        dma = pltpu.make_async_copy(
            data_ref.at[b, pl.ds((c0 + i) * chunk, chunk), :], scratch, sem)
        dma.start()
        dma.wait()
        uy = scratch[:, 0:1]
        ux = scratch[:, 1:2]
        wv = scratch[:, 2:3]
        # y-side: stacked exact one-hot, transposed for the MXU via the
        # row orientation of r0cat.
        r0yf = jnp.ceil(uy) - 1
        dly = uy - r0yf
        r0y = r0yf.astype(jnp.int32) - oy                 # (C, 1) local
        r0cat = jnp.concatenate([r0y, r0y + 1], axis=0)   # (2C, 1)
        iota_t = lax.broadcasted_iota(jnp.int32, (TILE, 2 * chunk), 0)
        o_t = (iota_t == r0cat.reshape(1, -1)).astype(bf16)  # (TILE, 2C)
        bx, _, _, _ = _onehot_pair_cols(ux, TILE, ox)     # (C, TILE) f32
        b_stack = jnp.concatenate(
            [(1 - dly) * wv * bx, dly * wv * bx], axis=0)  # (2C, TILE)
        b_hi = b_stack.astype(bf16)
        b_lo = (b_stack - b_hi.astype(f32)).astype(bf16)
        dims = (((1,), (0,)), ((), ()))
        s = (lax.dot_general(o_t, b_hi, dims, preferred_element_type=f32)
             + lax.dot_general(o_t, b_lo, dims, preferred_element_type=f32))
        out_ref[0] = out_ref[0] + s
        return 0

    lax.fori_loop(0, c1 - c0, body, 0)


def raster_fwd(grid_size, points, rotation, translation, background,
               out_weight, point_weight, *, chunk: int = _CHUNK,
               interpret: bool | None = None):
    """Forward rasterisation for tile-aligned 2D/3D grids
    -> (B, *grid_size)."""
    assert supported(len(grid_size), grid_size), \
        f"tiled backend needs tile-aligned 2D/3D grid, got {grid_size}"
    if interpret is None:
        interpret = _interpret_default()
    n_out = len(grid_size)
    ts = tile_shape_for(grid_size)
    nts = tuple(g // t for g, t in zip(grid_size, ts))
    nt = math.prod(nts)
    n_cand = 2 ** n_out
    bsz = rotation.shape[0]
    p = points.shape[0]
    s_pad = n_cand * p + nt * chunk
    f32 = jnp.float32

    pts32 = points.astype(f32)
    u = _transform_u(pts32, rotation.astype(f32), translation.astype(f32),
                     grid_size)                          # (B, P, n_out)
    tid = jax.vmap(_candidates, in_axes=(0, None, None))(u, grid_size, ts)
    src, valid, offs, _ = jax.vmap(
        lambda t: _bin_one_pose(t, nt, chunk, s_pad))(tid)
    pw_ow = point_weight.astype(f32)[None, :] \
        * out_weight.astype(f32)[:, None]                # (B, P)
    data = jax.vmap(lambda uu, po, sc, va: _pack_fwd(uu, po, sc, va,
                                                     n_cand))(
        u, pw_ow, src, valid)                            # (B, S_pad, 8)

    if n_out == 2:
        kernel = functools.partial(_fwd_kernel, grid_size=grid_size,
                                   chunk=chunk)
        out_spec = pl.BlockSpec(
            (1,) + ts, lambda b, t: (b, t // nts[1], t % nts[1]),
            memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_fwd_kernel_3d, grid_size=grid_size,
                                   tile=ts, chunk=chunk)
        out_spec = pl.BlockSpec(
            (1,) + ts,
            lambda b, t: (b, t // (nts[1] * nts[2]),
                          (t // nts[2]) % nts[1], t % nts[2]),
            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, 1, nt + 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz,) + tuple(grid_size), f32),
        scratch_shapes=[pltpu.VMEM((chunk, _PACKW), f32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(offs[:, None, :], data)
    out = out + background.astype(f32).reshape((bsz,) + (1,) * n_out)
    dtype = jnp.result_type(points, rotation, translation)
    return out.astype(dtype)


def _fwd_kernel_3d(offs_ref, data_ref, out_ref, scratch, sem, *, grid_size,
                   tile, chunk):
    """3D forward: the (z, y) pair fuses into a stacked EXACT one-hot over
    the flattened (t_z * t_y) tile rows (4 shift combos); x carries the
    split coefficients, exactly like the 2D y/x split."""
    gz, gy, gx = grid_size
    tz, ty, tx = tile
    nty, ntx = gy // ty, gx // tx
    b = pl.program_id(0)
    t = pl.program_id(1)
    oz = (t // (nty * ntx)) * tz
    oy = ((t // ntx) % nty) * ty
    ox = (t % ntx) * tx
    c0 = offs_ref[0, 0, t]
    c1 = offs_ref[0, 0, t + 1]
    bf16, f32 = jnp.bfloat16, jnp.float32

    acc0 = jnp.zeros((tz * ty, tx), f32)

    def body(i, acc):
        dma = pltpu.make_async_copy(
            data_ref.at[b, pl.ds((c0 + i) * chunk, chunk), :], scratch, sem)
        dma.start()
        dma.wait()
        uz = scratch[:, 0:1]
        uy = scratch[:, 1:2]
        ux = scratch[:, 2:3]
        wv = scratch[:, 3:4]

        r0zf = jnp.ceil(uz) - 1
        dlz = uz - r0zf
        r0z = r0zf.astype(jnp.int32) - oz
        r0yf = jnp.ceil(uy) - 1
        dly = uy - r0yf
        r0y = r0yf.astype(jnp.int32) - oy

        # stacked flattened zy one-hot: 4 shift combos, EXACT in bf16.
        # rows outside the tile in either axis never match (idx -> -1).
        idxs, coefs = [], []
        for sz in (0, 1):
            for sy in (0, 1):
                z = r0z + sz
                y = r0y + sy
                ok = (z >= 0) & (z < tz) & (y >= 0) & (y < ty)
                idxs.append(jnp.where(ok, z * ty + y, -1))
                cz = dlz if sz else 1 - dlz
                cy = dly if sy else 1 - dly
                coefs.append(cz * cy * wv)
        idx_cat = jnp.concatenate(idxs, axis=0)           # (4C, 1)
        iota_r = lax.broadcasted_iota(jnp.int32, (tz * ty, 4 * chunk), 0)
        o_t = (iota_r == idx_cat.reshape(1, -1)).astype(bf16)

        bx, _, _, _ = _onehot_pair_cols(ux, tx, ox)       # (C, tx) f32
        b_stack = jnp.concatenate([c * bx for c in coefs], axis=0)
        b_hi = b_stack.astype(bf16)
        b_lo = (b_stack - b_hi.astype(f32)).astype(bf16)
        dims = (((1,), (0,)), ((), ()))
        s = (lax.dot_general(o_t, b_hi, dims, preferred_element_type=f32)
             + lax.dot_general(o_t, b_lo, dims, preferred_element_type=f32))
        return acc + s

    acc = lax.fori_loop(0, c1 - c0, body, acc0)
    out_ref[0] = acc.reshape(tz, ty, tx)


def _pack_bwd(u, pts, pw, src_cand, valid, n_cand):
    """(S_pad, PACKW) rows [u..., pw, pts...]; invalid slots pw=0,
    u=-8."""
    n = u.shape[1]
    p_idx = src_cand // n_cand
    cols = [jnp.where(valid, u[p_idx, i], -8.0) for i in range(n)]
    cols.append(jnp.where(valid, pw[p_idx], 0.0))
    cols += [pts[p_idx, i] for i in range(pts.shape[1])]
    cols += [jnp.zeros_like(cols[0])] * (_PACKW - len(cols))
    return jnp.stack(cols, axis=1)


def _bwd_kernel(offs_ref, ow_ref, rot_ref, data_ref, g_ref,
                dcand_ref, dt_ref, dr_ref, dow_ref,
                scratch_in, scratch_out, sem_in, sem_out, *,
                grid_size, chunk, n_in):
    h, w = grid_size
    ntx = w // TILE
    b = pl.program_id(0)
    t = pl.program_id(1)
    oy = (t // ntx) * TILE
    ox = (t % ntx) * TILE
    c0 = offs_ref[0, 0, t]
    c1 = offs_ref[0, 0, t + 1]
    ow = ow_ref[0, 0, 0]
    rot = rot_ref[0]                                     # (2, n_in)
    g = g_ref[0]                                         # (TILE, TILE) f32
    bf16, f32 = jnp.bfloat16, jnp.float32
    g_hi = g.astype(bf16)
    g_lo = (g - g_hi.astype(f32)).astype(bf16)

    def body(i, carry):
        acc_t, acc_r, acc_ow = carry
        dma = pltpu.make_async_copy(
            data_ref.at[b, pl.ds((c0 + i) * chunk, chunk), :], scratch_in,
            sem_in)
        dma.start()
        dma.wait()
        uy = scratch_in[:, 0:1]
        ux = scratch_in[:, 1:2]
        pw = scratch_in[:, 2:3]
        pts = scratch_in[:, 3:3 + n_in]                  # (C, n_in)

        r0yf = jnp.ceil(uy) - 1
        dly = uy - r0yf
        r0y = r0yf.astype(jnp.int32) - oy                # (C, 1) local
        r0cat = jnp.concatenate([r0y, r0y + 1], axis=0)  # (2C, 1)
        iota_c = lax.broadcasted_iota(jnp.int32, (2 * chunk, TILE), 1)
        o = (iota_c == r0cat).astype(bf16)               # (2C, TILE)
        dims = (((1,), (0,)), ((), ()))
        res = (lax.dot_general(o, g_hi, dims, preferred_element_type=f32)
               + lax.dot_general(o, g_lo, dims,
                                 preferred_element_type=f32))  # (2C, TILE)
        p0, p1 = res[:chunk], res[chunk:]
        v1 = (1 - dly) * p0 + dly * p1
        diff = p1 - p0
        bx, db, _, _ = _onehot_pair_cols(ux, TILE, ox)
        gw = jnp.sum(v1 * bx, axis=1, keepdims=True)     # (C, 1)
        dy = jnp.sum(diff * bx, axis=1, keepdims=True)
        dx = jnp.sum(v1 * db, axis=1, keepdims=True)

        coeff = ow * pw
        scaled = jnp.concatenate([dy * (h / 2), dx * (w / 2)],
                                 axis=1) * coeff          # (C, 2)
        d_p = lax.dot_general(scaled, rot, (((1,), (0,)), ((), ())),
                              precision=lax.Precision.HIGHEST,
                              preferred_element_type=f32)  # (C, n_in)
        scratch_out[:, 0:n_in] = d_p
        scratch_out[:, n_in:n_in + 1] = gw * ow           # d_pw
        wr = pltpu.make_async_copy(
            scratch_out, dcand_ref.at[b, pl.ds((c0 + i) * chunk, chunk), :],
            sem_out)
        wr.start()
        wr.wait()

        acc_t = acc_t + jnp.sum(scaled, axis=0, keepdims=True)   # (1, 2)
        acc_r = acc_r + lax.dot_general(
            scaled, pts, (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=f32)                   # (2, n_in)
        acc_ow = acc_ow + jnp.sum(gw * pw)
        return acc_t, acc_r, acc_ow

    acc_t = jnp.zeros((1, 2), f32)
    acc_r = jnp.zeros((2, n_in), f32)
    acc_ow = jnp.zeros((), f32)
    acc_t, acc_r, acc_ow = lax.fori_loop(0, c1 - c0, body,
                                         (acc_t, acc_r, acc_ow))
    dt_ref[0, 0] = acc_t
    dr_ref[0, 0] = acc_r
    dow_ref[0, 0] = acc_ow.reshape(1, 1)


def _bwd_kernel_3d(offs_ref, ow_ref, rot_ref, data_ref, g_ref,
                   dcand_ref, dt_ref, dr_ref, dow_ref,
                   scratch_in, scratch_out, sem_in, sem_out, *,
                   grid_size, tile, chunk, n_in):
    gz, gy, gx = grid_size
    tz, ty, tx = tile
    nty, ntx = gy // ty, gx // tx
    b = pl.program_id(0)
    t = pl.program_id(1)
    oz = (t // (nty * ntx)) * tz
    oy = ((t // ntx) % nty) * ty
    ox = (t % ntx) * tx
    c0 = offs_ref[0, 0, t]
    c1 = offs_ref[0, 0, t + 1]
    ow = ow_ref[0, 0, 0]
    rot = rot_ref[0]                                     # (3, n_in)
    bf16, f32 = jnp.bfloat16, jnp.float32
    g = g_ref[0].reshape(tz * ty, tx)                    # flattened zy rows
    g_hi = g.astype(bf16)
    g_lo = (g - g_hi.astype(f32)).astype(bf16)

    def body(i, carry):
        acc_t, acc_r, acc_ow = carry
        dma = pltpu.make_async_copy(
            data_ref.at[b, pl.ds((c0 + i) * chunk, chunk), :], scratch_in,
            sem_in)
        dma.start()
        dma.wait()
        uz = scratch_in[:, 0:1]
        uy = scratch_in[:, 1:2]
        ux = scratch_in[:, 2:3]
        pw = scratch_in[:, 3:4]
        pts = scratch_in[:, 4:4 + n_in]                  # (C, n_in)

        r0zf = jnp.ceil(uz) - 1
        dlz = uz - r0zf
        r0z = r0zf.astype(jnp.int32) - oz
        r0yf = jnp.ceil(uy) - 1
        dly = uy - r0yf
        r0y = r0yf.astype(jnp.int32) - oy

        idxs = []
        for sz in (0, 1):
            for sy in (0, 1):
                z = r0z + sz
                y = r0y + sy
                ok = (z >= 0) & (z < tz) & (y >= 0) & (y < ty)
                idxs.append(jnp.where(ok, z * ty + y, -1))
        idx_cat = jnp.concatenate(idxs, axis=0)          # (4C, 1)
        iota_c = lax.broadcasted_iota(jnp.int32, (4 * chunk, tz * ty), 1)
        o = (iota_c == idx_cat).astype(bf16)             # (4C, tz*ty)
        dims = (((1,), (0,)), ((), ()))
        res = (lax.dot_general(o, g_hi, dims, preferred_element_type=f32)
               + lax.dot_general(o, g_lo, dims,
                                 preferred_element_type=f32))  # (4C, tx)
        p00 = res[:chunk]
        p01 = res[chunk:2 * chunk]
        p10 = res[2 * chunk:3 * chunk]
        p11 = res[3 * chunk:]
        cz0, cz1 = 1 - dlz, dlz
        cy0, cy1 = 1 - dly, dly
        v1 = cz0 * (cy0 * p00 + cy1 * p01) + cz1 * (cy0 * p10 + cy1 * p11)
        dzv = (cy0 * p10 + cy1 * p11) - (cy0 * p00 + cy1 * p01)
        dyv = cz0 * (p01 - p00) + cz1 * (p11 - p10)

        bx, db, _, _ = _onehot_pair_cols(ux, tx, ox)
        gw = jnp.sum(v1 * bx, axis=1, keepdims=True)     # (C, 1)
        du_z = jnp.sum(dzv * bx, axis=1, keepdims=True)
        du_y = jnp.sum(dyv * bx, axis=1, keepdims=True)
        du_x = jnp.sum(v1 * db, axis=1, keepdims=True)

        coeff = ow * pw
        scaled = jnp.concatenate(
            [du_z * (gz / 2), du_y * (gy / 2), du_x * (gx / 2)],
            axis=1) * coeff                               # (C, 3)
        d_p = lax.dot_general(scaled, rot, (((1,), (0,)), ((), ())),
                              precision=lax.Precision.HIGHEST,
                              preferred_element_type=f32)  # (C, n_in)
        scratch_out[:, 0:n_in] = d_p
        scratch_out[:, n_in:n_in + 1] = gw * ow           # d_pw
        wr = pltpu.make_async_copy(
            scratch_out, dcand_ref.at[b, pl.ds((c0 + i) * chunk, chunk), :],
            sem_out)
        wr.start()
        wr.wait()

        acc_t = acc_t + jnp.sum(scaled, axis=0, keepdims=True)   # (1, 3)
        acc_r = acc_r + lax.dot_general(
            scaled, pts, (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=f32)                   # (3, n_in)
        acc_ow = acc_ow + jnp.sum(gw * pw)
        return acc_t, acc_r, acc_ow

    acc = (jnp.zeros((1, 3), f32), jnp.zeros((3, n_in), f32),
           jnp.zeros((), f32))
    acc_t, acc_r, acc_ow = lax.fori_loop(0, c1 - c0, body, acc)
    dt_ref[0, 0] = acc_t
    dr_ref[0, 0] = acc_r
    dow_ref[0, 0] = acc_ow.reshape(1, 1)


def raster_pullback(grid_size, points, rotation, translation, background,
                    out_weight, point_weight, ds_dout, *,
                    chunk: int = _CHUNK,
                    interpret: bool | None = None) -> PullbackResult:
    """Analytic pullback for tile-aligned 2D/3D grids -> PullbackResult."""
    assert supported(len(grid_size), grid_size), \
        f"tiled backend needs tile-aligned 2D/3D grid, got {grid_size}"
    if interpret is None:
        interpret = _interpret_default()
    n_out = len(grid_size)
    ts = tile_shape_for(grid_size)
    nts = tuple(g // t for g, t in zip(grid_size, ts))
    nt = math.prod(nts)
    n_cand = 2 ** n_out
    bsz = rotation.shape[0]
    p, n_in = points.shape
    assert n_in + n_out + 2 <= _PACKW, f"n_in={n_in} exceeds packed row"
    s_pad = n_cand * p + nt * chunk
    f32 = jnp.float32

    pts32 = points.astype(f32)
    rot32 = rotation.astype(f32)
    u = _transform_u(pts32, rot32, translation.astype(f32), grid_size)
    tid = jax.vmap(_candidates, in_axes=(0, None, None))(u, grid_size, ts)
    src, valid, offs, slot = jax.vmap(
        lambda t: _bin_one_pose(t, nt, chunk, s_pad))(tid)
    pw32 = point_weight.astype(f32)
    data = jax.vmap(lambda uu, sc, va: _pack_bwd(uu, pts32, pw32, sc, va,
                                                 n_cand))(
        u, src, valid)                                   # (B, S_pad, 8)
    g = ds_dout.astype(f32)

    if n_out == 2:
        kernel = functools.partial(_bwd_kernel, grid_size=grid_size,
                                   chunk=chunk, n_in=n_in)
        g_spec = pl.BlockSpec(
            (1,) + ts, lambda b, t: (b, t // nts[1], t % nts[1]),
            memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(_bwd_kernel_3d, grid_size=grid_size,
                                   tile=ts, chunk=chunk, n_in=n_in)
        g_spec = pl.BlockSpec(
            (1,) + ts,
            lambda b, t: (b, t // (nts[1] * nts[2]),
                          (t // nts[2]) % nts[1], t % nts[2]),
            memory_space=pltpu.VMEM)

    dcand, dt_k, dr_k, dow_k = pl.pallas_call(
        kernel,
        grid=(bsz, nt),
        in_specs=[
            pl.BlockSpec((1, 1, nt + 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_out, n_in), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            g_spec,
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 1, n_out), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_out, n_in), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, s_pad, _PACKW), f32),
            jax.ShapeDtypeStruct((bsz, nt, 1, n_out), f32),
            jax.ShapeDtypeStruct((bsz, nt, n_out, n_in), f32),
            jax.ShapeDtypeStruct((bsz, nt, 1, 1), f32),
        ],
        scratch_shapes=[pltpu.VMEM((chunk, _PACKW), f32),
                        pltpu.VMEM((chunk, _PACKW), f32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(offs[:, None, :], out_weight.astype(f32)[:, None, None], rot32,
      data, g)

    # unsort: gather each candidate's gradient row, sum the <=2^n candidate
    # copies per point, then sum over poses.  Pure gathers, no scatters.
    def unsort_one(dc, sl):
        rows = jnp.take(dc, sl, axis=0, mode="fill", fill_value=0.0)
        return rows.reshape(p, n_cand, _PACKW).sum(axis=1)  # (P, PACKW)

    per_pose = jax.vmap(unsort_one)(dcand, slot)         # (B, P, PACKW)
    d_points = jnp.sum(per_pose[..., :n_in], axis=0)
    d_pw = jnp.sum(per_pose[..., n_in], axis=0)

    dtype = jnp.result_type(points, rotation, ds_dout)
    return PullbackResult(
        points=d_points.astype(dtype),
        rotation=jnp.sum(dr_k, axis=1).astype(dtype),
        translation=jnp.sum(dt_k[:, :, 0, :], axis=1).astype(dtype),
        background=jnp.sum(g.reshape(bsz, -1), axis=-1).astype(dtype),
        out_weight=jnp.sum(dow_k[:, :, 0, 0], axis=1).astype(dtype),
        point_weight=d_pw.astype(dtype),
    )
