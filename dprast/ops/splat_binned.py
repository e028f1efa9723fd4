"""Slot-scheduled Pallas backend: tile-binned splat for ANY tile-aligned
2D/3D grid, including the single-tile (<=128^2) flagship case.

This is the second-generation TPU design (it replaced the round-1
run-loop "tiled" backend, whose manual-DMA kernels Mosaic could not
compile at scale).  The reference
solves the same problem with global-memory atomics
(`src/raster.jl:64`, `ext/DiffPointRasterisationCUDAExt.jl:19-210`); on TPU
there are no atomics, so conflicts are eliminated structurally:

- **Binning**: points are sorted by the tile containing their reference
  voxel (ONE candidate per point).  Per-tile segments are padded to whole
  `chunk` multiples with inert filler rows, giving a static *slot* frame:
  slot `s` covers rows ``[s*chunk, (s+1)*chunk)`` and belongs to exactly
  one tile.
- **Scalar prefetch**: a per-pose ``slot -> tile`` table drives every
  BlockSpec index map (`pltpu.PrefetchScalarGridSpec`).  The kernels are
  straight-line: all I/O is pipelined block I/O, no manual DMA, no
  run-tables — the structural properties that make Mosaic compilation
  robust and let the pipeline double-buffer automatically.
- **MXU-quantised tiles**: body tiles are sized so the +1-voxel splat
  halo lands EXACTLY on the MXU/VREG quanta — 2D body 127x127 extends to
  a 128x128 window, 3D body 7x15x127 extends to (8,16,128) = 128 rows x
  128 lanes flattened.  (The first-generation layout extended 128-wide
  tiles by a full 8-row / 128-lane alignment block, so every kernel
  matmul padded to 256 lanes x 256 contraction rows — 2-4x the MXU work
  for the same splats.)  A body tile need not divide the grid: the grid
  is virtually padded to ``ceil(g/t)*t + 1`` per axis, which lifts the
  old tile-alignment restriction — ANY 2D/3D grid is supported (bounded
  only by the tile count / padding-ratio dispatch rules).
- **Forward**: one instance per (pose, slot) accumulates into its tile's
  extended 128x128 VMEM window; consecutive slots of the same tile
  revisit the same output block.  The fold then sums the overlapping
  windows into the dense grid — on TPU 2D grids a Pallas band kernel
  (`_fold_pl_2d`, with the per-pose ``out*ow + bg`` epilogue fused into
  its writes), elsewhere one strided ``lax.pad`` add per axis
  (`_fold`, separable, zero gathers) — the scatter-free replacement for
  atomics.
- **Backward**: pure gather.  The unfold extracts the per-tile extended
  cotangent windows (the exact adjoint of the fold: on TPU 2D grids the
  band-fetch DMA kernel `_unfold_pl_2d`, elsewhere `_unfold`'s strided
  slices);
  each instance reads ONE (128, 128) window, selects per-point stencil
  values with an exact one-hot matmul, and writes raw per-row gradients
  ``(du_axis..., gw)``.  Out-of-grid neighbours read the zero padding —
  the reference's OOB-drop semantics with no validity masks at all.  All
  pose-gradient contractions (translation/rotation/weight sums, the Rᵀ
  rotation of point gradients, the ptidx unsort) happen OUTSIDE the
  kernel in XLA — the kernel stays minimal, which is both faster and
  compile-robust.
- **Precision**: coordinates come from the compensated double-f32
  pipeline (`geometry.grid_coords_2f`) and are stored tile-local as
  31-bit fixed point (uniform 2^-23 resolution at any grid size);
  matmuls use an exact one-hot operand against a 2-term bf16 split of
  the value operand (see `_SPLIT_TERMS`).  Measured end-to-end error vs
  the f64 oracle: <= ~3e-6 — well under the 1e-5 reference-parity
  target.

Reference semantics: `src/raster.jl:85-108` (splat), `src/raster_pullback.jl`
(the six analytic gradients).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dprast.ops import geometry
from dprast.ops.core import PullbackResult

TILE = 128
# bf16 split terms for the value operand of the kernel matmuls: 2 keeps
# the end-to-end error ~3e-6 vs the f64 oracle (inside the 1e-5 parity
# contract; measured on v5e at 256^2/1024^2/128^3, tests_tpu/) and saves
# one full MXU pass per matmul vs the exact-to-f32 3-term split.
_SPLIT_TERMS = 2


def tile_shape_for(grid_size):
    """Per-axis BODY tile shape; the kernel window is body + 1 halo voxel
    per axis.  Sizes are chosen so the window sits exactly on the MXU
    quanta: 2D (127, 127) -> 128x128; 3D (7, 15, 127) -> (8*16, 128)
    flattened rows x lanes.  A small 2D grid (both axes <= 128) is a
    single halo-free tile (no binning, no padding)."""
    if len(grid_size) == 2:
        gy, gx = grid_size
        if gy <= TILE and gx <= TILE:
            return (gy, gx)
        return (TILE - 1, TILE - 1)
    return (7, 15, TILE - 1)


def n_tiles(grid_size, ts=None):
    ts = ts or tile_shape_for(grid_size)
    return math.prod(-(-g // t) for g, t in zip(grid_size, ts))


def supported(n_out: int, grid_size=None, n_points=None) -> bool:
    """CAPABILITY check: any 2D/3D grid up to the tile-count bound, point
    counts below 2^24 (point ids ride float32 planes through the binning
    sort and the pullback unsort — beyond 2^24 neighbouring ids collide
    and gradients would silently permute).  Whether the backend is the
    *fastest* choice for a configuration is a separate question —
    `profitable()` — so an explicitly requested ``backend="binned"`` is
    honoured whenever it can run correctly."""
    if n_out not in (2, 3):
        return False
    if n_points is not None and n_points >= (1 << 24):
        return False
    if grid_size is None:
        return True
    if any(g < 1 for g in grid_size):
        return False
    return n_tiles(grid_size) <= 4096


def profitable(n_out: int, grid_size, n_points=None) -> bool:
    """Auto-dispatch profitability on top of :func:`supported`: the slot
    frame's ~nt*chunk inert padding rows must not dwarf the real work.
    Measured on v5e at 10^5 points: 512^3 binned bwd lost to the scatter
    oracle at ~10x padding, while 1024^2 at 10^4 points (~4x padding)
    stays ~2x ahead of it (the oracle's cost scales with splats, not
    voxels)."""
    if not supported(n_out, grid_size, n_points):
        return False
    chunk = _default_chunk(grid_size, n_points)
    if n_points is not None and n_tiles(grid_size) * chunk > \
            8 * max(n_points, 1024):
        return False
    return True


def _single_tile(grid_size) -> bool:
    return len(grid_size) == 2 and n_tiles(grid_size) == 1


def _out_struct(shape, dtype, *like):
    """Kernel out_shape declaring itself axis-INVARIANT.

    Every pallas_call in this backend runs on `vma_erase`d operands and
    re-asserts the true union on its result via `geometry.vma_assert`
    (see `geometry.vma_erase` for why the variance types cannot flow
    THROUGH a pallas_call in jax 0.9.0: index-map re-evaluation and the
    interpret-mode block slicing each reject one side of the mixed-vma
    ops).  Under shard_map (check_vma=True) pallas demands an explicit
    vma on the out struct; outside, the empty set is dropped."""
    del like
    try:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset())
    except TypeError:  # pragma: no cover - older ShapeDtypeStruct
        return jax.ShapeDtypeStruct(shape, dtype)


def _interpret_default() -> bool:
    return not geometry.on_tpu()


def _default_chunk(grid_size, n_points=None) -> int:
    # large chunks amortise per-instance overhead; small ones waste less
    # slot padding — which the binning sort, the unsort AND the kernels
    # all pay for.  Measured on v5e at 1024^2 x 64 x 1e5: chunk 256 beats
    # 512 (prep 18->12 ms, unsort 28->17 ms, kernels +~2 ms) and 128
    # (whose forward kernel pays +7 ms of per-instance overhead).  When
    # the point count is so small that the ~nt*chunk padding rows would
    # outnumber the real rows (e.g. 1e4 points into 1024^2's 81 tiles),
    # halve the chunk — padding, not per-instance overhead, dominates
    # there.
    if _single_tile(grid_size):
        return 1024
    if n_points is not None and n_tiles(grid_size) * 256 > 2 * n_points:
        return 128
    return 256


# ---------------------------------------------------------------------------
# binning prep
# ---------------------------------------------------------------------------


_FIX = 23  # fixed-point fraction bits for encoded local coordinates


def _keys_and_local(grid_size, ts, points, rotation, translation):
    """Per (pose, point): flat tile key (sentinel nt if no grid overlap)
    and one encoded-coordinate plane per axis.

    Coordinates are stored tile-local as 31-bit fixed point,
    ``enc = (r0_local + 2) << 23 | round(dl * 2^23)`` (bitcast to f32 so
    all planes stack into one array) — uniform 2^-23 precision regardless
    of grid size, unlike a raw f32 local coordinate whose ulp at |u|~64
    is already 7.6e-6.  ``dl == 1`` carries into the integer part, which
    the kernel-side decode undoes, preserving the reference's
    ``dl in (0, 1]`` convention exactly.  Invalid (no-overlap) points get
    ``enc = 0`` — decoded r0 = -3, inert in every kernel because the
    one-hot never matches.
    """
    n = len(grid_size)
    nts = [-(-g // t) for g, t in zip(grid_size, ts)]
    nt = math.prod(nts)
    u_hi, u_lo = geometry.grid_coords_2f(points, rotation, translation,
                                         grid_size)
    r0, dl = geometry.reference_voxel_and_deltas_2f(u_hi, u_lo)
    key = jnp.zeros(r0.shape[:2], jnp.int32)
    overlap = jnp.ones(r0.shape[:2], bool)
    locs = []
    for i in range(n):
        g, t = grid_size[i], ts[i]
        ri = r0[..., i]
        overlap &= (ri + 1 >= 0) & (ri <= g - 1)
        ti = jnp.clip(ri, 0, g - 1) // t
        key = key * nts[i] + ti
        r_loc = ri - ti * t                                # in [-1, t-1]
        enc = ((r_loc + 2) << _FIX) + jnp.round(
            dl[..., i] * (1 << _FIX)).astype(jnp.int32)
        enc = jnp.where(overlap, enc, 0)
        locs.append(lax.bitcast_convert_type(enc, jnp.float32))
    key = jnp.where(overlap, key, nt)
    return key, locs, nt


def _decode_coord(col):
    """Decode encoded-coordinate planes (any shape, f32-bits) ->
    (r0_local int32, dl f32) with ``dl in (0, 1]``.  Runs in XLA on the
    frame planes (the kernels receive pre-decoded values)."""
    enc = lax.bitcast_convert_type(col, jnp.int32)
    i_part = enc >> _FIX
    frac = enc - (i_part << _FIX)
    zero = frac == 0
    dl = jnp.where(zero, 1.0,
                   frac.astype(jnp.float32) * (2.0 ** -_FIX))
    r0 = i_part - 2 - zero.astype(jnp.int32)
    return r0, dl


def _prep_binned(key, planes, fills, nt, chunk, min_chunk_per_tile,
                 pack_idx=False):
    """Sort `planes` (list of (P,) f32) into the padded slot frame.

    Returns (data (len(planes), s_pad) f32, slot_tile (n_slots + 1,) i32)
    — the trailing entry is ``n_live``, the count of slots that carry
    frame rows (the kernels skip all compute for the static-bound slack
    slots past it; rows there are no-overlap reals and excess fillers,
    both zero-gradient by construction).  Filler rows get per-plane
    `fills` values — callers pass coordinates that never match a
    one-hot.  Runs per pose under vmap.

    ONE stable sort builds the frame: per-tile segment counts come from a
    cheap compare-reduce over the *unsorted* keys, which lets filler rows
    be emitted up front with interleaving keys — reals of tile t sort as
    ``2t``, exactly the right number of fillers as ``2t+1``, everything
    else (no-overlap points at key ``nt``, excess fillers) past the frame
    at ``>= 2*nt``.  (The previous two-sort design — sort by tile, derive
    slots, sort by slot — paid the full bitonic cost twice; gathers and
    scatters are far slower than sort on TPU, so sorting fewer times, not
    replacing the sort, is the lever.)

    With ``pack_idx=True`` the last plane must be the point-id plane
    (values ``0..p-1``, fill ``p``); when the combined bits fit an int32
    it rides INSIDE the sort key (``key * P2 + id``) instead of being a
    payload operand — variadic sort cost scales with operand count, and
    this drops one of them (measured v5e, 1024^2 x 64: ~19 -> ~15 ms).
    Falls back to carrying it as a payload when the bits don't fit.
    """
    p = key.shape[0]
    s_pad = _slot_frame_size(p, nt, chunk)
    n_slots = s_pad // chunk

    p2 = 1 << max(int(p).bit_length(), 1)
    packed = pack_idx and (2 * nt + 1) * p2 + p < 2 ** 31
    if packed:
        planes = planes[:-1]

    iota_t = jnp.arange(nt, dtype=jnp.int32)
    if nt <= 128:
        # broadcast compare-reduce: O(nt*p) but regular VPU work — faster
        # than a scatter at small tile counts (the measured regimes)
        counts = jnp.sum(key[None, :] == iota_t[:, None], axis=1,
                         dtype=jnp.int32)                 # (nt,)
    else:
        # histogram by MATMUL: counts[64*hi + lo] = sum_p 1[key>>6 == hi]
        # * 1[key&63 == lo] — two exact {0,1} one-hots contracted on the
        # MXU, O(p * (nt/64 + 64)) one-hot builds + an (nh, p)@(p, 64)
        # dot.  Exact: products are 0/1 and per-bin sums stay under 2^24.
        # Replaces an `.at[key].add` scatter that measured ~7 ms at
        # (nt=342, p=1e6) on v5e — TPU scatters serialise.  The sentinel
        # key == nt lands past the slice.  The one-hot operands are built
        # in point-axis chunks: at the supported extremes (p near 2^24,
        # nt up to 4096) a single (nh, p) + (64, p) bf16 pair is several
        # GB per pose inside a 16-pose vmap chunk — partial counts cost
        # the same MXU work with O(chunk) operand memory.
        nh = -(-(nt + 1) // 64)
        p_hist = 1 << 20
        iot_h = jnp.arange(nh, dtype=jnp.int32)[:, None]
        iot_l = jnp.arange(64, dtype=jnp.int32)[:, None]
        c2 = None
        for c0 in range(0, p, p_hist):
            kc = lax.slice_in_dim(key, c0, min(c0 + p_hist, p))
            hi = (kc >> 6)[None, :] == iot_h
            lo = (kc & 63)[None, :] == iot_l
            part = lax.dot_general(hi.astype(jnp.bfloat16),
                                   lo.astype(jnp.bfloat16),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            c2 = part if c2 is None else c2 + part
        counts = c2.reshape(-1)[:nt].astype(jnp.int32)
    padded = -(-counts // chunk) * chunk
    if min_chunk_per_tile:
        padded = jnp.maximum(padded, chunk)
    poffs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                             jnp.cumsum(padded).astype(jnp.int32)])
    # filler rows: exactly padded-counts of tile t keyed to sort directly
    # after tile t's real rows; the rest past every real key
    f_k = jnp.tile(jnp.arange(chunk, dtype=jnp.int32), nt)
    f_needed = jnp.repeat(padded - counts, chunk)
    f_tile = jnp.repeat(iota_t, chunk)
    f_key = jnp.where(f_k < f_needed, 2 * f_tile + 1, 2 * nt + 1)
    # top the input up to >= s_pad rows (p + nt*chunk falls short when p
    # is not a chunk multiple); short input would silently truncate the
    # frame and leave kernel output rows unwritten
    n_extra = max(s_pad - p - nt * chunk, 0)
    keys2 = jnp.concatenate([2 * key, f_key,
                             jnp.full((n_extra,), 2 * nt + 1, jnp.int32)])
    if packed:
        sub = jnp.concatenate([jnp.arange(p, dtype=jnp.int32),
                               jnp.full((nt * chunk + n_extra,), p,
                                        jnp.int32)])
        keys2 = keys2 * p2 + sub
    cat = [jnp.concatenate([planes[i],
                            jnp.full((nt * chunk + n_extra,), fills[i],
                                     jnp.float32)])
           for i in range(len(planes))]
    # packed keys are unique -> drop the stability tiebreaker (XLA
    # implements is_stable by sorting an extra hidden iota operand;
    # measured v5e, (64, 121k) key+3: 17.0 -> 13.8 ms)
    sorted2 = lax.sort((keys2,) + tuple(cat), dimension=0, num_keys=1,
                       is_stable=not packed)
    data = [c[:s_pad] for c in sorted2[1:]]
    if packed:
        data.append((sorted2[0][:s_pad] % p2).astype(jnp.float32))
    data = jnp.stack(data, axis=0)
    assert data.shape[-1] == s_pad, (data.shape, s_pad)
    # row i of the frame belongs to tile #(count of poffs[t+1] <= i)
    starts = jnp.arange(n_slots, dtype=jnp.int32) * chunk
    tile_of = jnp.sum((starts[:, None] >= poffs[None, 1:nt + 1])
                      .astype(jnp.int32), axis=1)
    slot_tile = jnp.minimum(tile_of, nt - 1)
    n_live = poffs[nt] // chunk
    return data, jnp.concatenate([slot_tile, n_live[None]])


_SORT_BATCH = 16


def _prep_binned_all(key, planes, fills, nt, chunk, min_chunk, pack_idx):
    """`_prep_binned` over the pose axis, in vmap chunks of <= 16 poses.

    XLA's TPU sort has TWO batch-size cliffs (all measured v5e at
    ~1e5-row key+3 sequences): the (1, n) dim-1 form lowers to a ~10x
    slower implementation than the identical 1-D (n,) sort (26.8 vs
    2.9 ms at 1.09M rows) — so B == 1 calls `_prep_binned` squeezed —
    and throughput degrades past ~16 batch rows (one (64, n) sort
    15.8 ms vs 4 x (16, n) 12.2 ms) — so larger batches vmap in
    chunks."""
    b = key.shape[0]
    if b == 1:
        data, st = _prep_binned(key[0], [pl_[0] for pl_ in planes], fills,
                                nt, chunk, min_chunk, pack_idx=pack_idx)
        return data[None], st[None]
    fn = jax.vmap(
        lambda k, *pls: _prep_binned(k, list(pls), fills, nt, chunk,
                                     min_chunk, pack_idx=pack_idx))
    if b <= _SORT_BATCH:
        return fn(key, *planes)
    outs = [fn(key[i:i + _SORT_BATCH],
               *(pl_[i:i + _SORT_BATCH] for pl_ in planes))
            for i in range(0, b, _SORT_BATCH)]
    return (jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]))


def _slot_frame_size(p, nt, chunk):
    return -(-p // chunk) * chunk + nt * chunk


def _prep_direct(planes, fills, chunk):
    """Single-tile fast path: no binning, no sorts — rows keep the
    original point order (so the backward needs no unsort either).
    Matches `_prep_binned`'s slot-table layout: trailing n_live entry
    (every slot is live here)."""
    p = planes[0].shape[0]
    p_pad = -(-p // chunk) * chunk
    data = jnp.stack(
        [jnp.concatenate([pl_, jnp.full((p_pad - p,), fills[i],
                                        jnp.float32)])
         for i, pl_ in enumerate(planes)], axis=0)
    n_slots = p_pad // chunk
    return data, jnp.concatenate([jnp.zeros((n_slots,), jnp.int32),
                                  jnp.full((1,), n_slots, jnp.int32)])




# ---------------------------------------------------------------------------
# kernel-feed planes
#
# The kernels do NO per-point decoding: any op on a (C, 1)-shaped value
# wastes 127/128 VPU lanes, and on the first-generation kernels that
# layout tax — not MXU work — dominated (measured v5e, 1024^2:
# 35 ms/kernel vs a ~6 ms MXU floor).  Instead XLA computes, from the
# sorted frame, exactly the planes each kernel consumes in the
# orientation it consumes them:
#
# - lane planes (B, L, s_pad): per-point hat parameters / row targets,
#   lane-major — all row-matrix construction broadcasts them as (1, C)
#   rows over sublanes.
# - sublane planes (B, s_pad, M): the x one-hot target, read as (C, 1)
#   columns that only ever broadcast against (C, cols_e) iota compares —
#   never scalar (C, 1) math.
#
# Planes carry small integers as exact f32 (no in-kernel bitcasts).
# ---------------------------------------------------------------------------


def _flat_rows_3d(iz0, dlz, iy0, dly, ts):
    """The 4 (sz, sy) stencil flat-row targets (tz+1, ty+1 layout; invalid
    -> -9, never matching) and their y/z weight products, in branch order
    (0,0), (0,1), (1,0), (1,1).  Used by the BACKWARD lane planes (the
    backward gathers per stencil row with exact one-hots; the forward
    builds its weighted row matrix as a hat function instead)."""
    tz, ty = ts[0], ts[1]
    rows, wzy = [], []
    for sz in (0, 1):
        for sy in (0, 1):
            z = iz0 + sz
            y = iy0 + sy
            ok = (z >= 0) & (z <= tz) & (y >= 0) & (y <= ty)
            rows.append(jnp.where(ok, (z * (ty + 1) + y), -9)
                        .astype(jnp.float32))
            wzy.append((dlz if sz else 1 - dlz) * (dly if sy else 1 - dly))
    return rows, wzy


def _planes_fwd(coord, w, ts, n_out):
    """Lane-plane stack (B, L, s_pad) f32 for the forward kernel from
    the frame's encoded coordinate planes ``coord`` (B, n_out, s_pad)
    and the per-row weight plane ``w`` (B, s_pad) — or ``w=None`` on the
    uniform-weight fast path (`pw_uniform`): the weight row is dropped
    entirely and the scalar ``out_weight * point_weight`` factor is
    applied once per pose AFTER the fold (the splat is linear in the
    weight), which also drops one payload plane from the binning sort
    (sort cost scales steeply with operand count: measured v5e at
    4 x (16, 121k) rows, key+3 = 11.4 ms vs key+2 ~8.5).

    lane: the decoded row-axis hat parameters plus the point weight and
    the x interpolation delta — 2D ``[iy0, dly, w, dlx]``, 3D
    ``[iz0, dlz, iy0, dly, w, dlx]``.  The kernel builds the WEIGHTED
    row matrix directly as a hat function,
    ``m[r] = relu(1 - |(r0 - r) + dl|) * w`` — ``r0 - r`` is an exact
    small integer and ``dl`` an exact f32, so the construction is exact
    to f32 like the one-hot-compare form it replaced, but covers BOTH
    stencil rows (and, separably, all four 3D (z, y) branches) in one
    expression: no per-branch one-hot compares, no precomputed
    coefficient planes at all (the replaced design shipped 4S pre-split
    bf16 value rows per point through HBM; measured v5e, 1024², the
    hat form cut fwd kernel+planes time ~2x).  Inert filler rows decode
    to ``r0 = -3`` and never reach ``|.| < 1``.
    The x-target ``ix0`` rides as the LAST lane row; the kernel builds
    the two TRANSPOSED (cols_e, C) x one-hot masks lane-major straight
    from that row (`_x_selects`) and consumes them with an NT
    ``dot_general`` whose contraction runs over the lane axis — the
    point axis never leaves the lanes.  (The rejected alternatives: a
    separate (B, s_pad, 1) sublane-plane operand cost XLA a 5.9 ms
    lane->sublane relayout copy at 1024^2 x 64 x 1e5, and an in-kernel
    (1, C) -> (C, 1) transpose measured ~7 ms across the grid.)  The x
    side stays a pure {0, 1} one-hot, so every matmul keeps the exact
    bf16-split contract."""
    f32 = jnp.float32
    ix0, dlx = _decode_coord(coord[:, n_out - 1])
    w_rows = [] if w is None else [w]
    if n_out == 2:
        iy0, dly = _decode_coord(coord[:, 0])
        lane = [iy0.astype(f32), dly] + w_rows + [dlx]
    else:
        iz0, dlz = _decode_coord(coord[:, 0])
        iy0, dly = _decode_coord(coord[:, 1])
        lane = [iz0.astype(f32), dlz, iy0.astype(f32), dly] + w_rows + [dlx]
    lane.append(ix0.astype(f32))
    return jnp.stack(lane, axis=1)


def _planes_bwd(coord, ts, n_out):
    """lane planes (B, Mb, s_pad) for the backward kernel from the frame's
    encoded coordinate planes ``coord`` (B, n_out, s_pad).

    2D: ``[iy0, dly, ix0, dlx]``; 3D: ``[r00, r01, r10, r11, dlz, dly,
    ix0, dlx]`` (flat stencil rows as in the forward lane planes).  The
    backward kernel works in the TRANSPOSED orientation (resT = gT @
    o_rows), so every per-point plane stays on the lane axis throughout."""
    f32 = jnp.float32
    ix0, dlx = _decode_coord(coord[:, n_out - 1])
    if n_out == 2:
        iy0, dly = _decode_coord(coord[:, 0])
        sub = [iy0.astype(f32), dly]
    else:
        iz0, dlz = _decode_coord(coord[:, 0])
        iy0, dly = _decode_coord(coord[:, 1])
        rows, _ = _flat_rows_3d(iz0, dlz, iy0, dly, ts)
        sub = rows + [dlz, dly]
    sub += [ix0.astype(f32), dlx]
    return jnp.stack(sub, axis=1)


def _x_selects(ix0_row, chunk, cols_e):
    """(lo, hi) TRANSPOSED masks (cols_e, C) of the two x-neighbour
    columns, built lane-major straight from the (1, C) ix0 lane row and
    consumed by an NT contraction (both matmul operands keep the point
    axis on lanes).  The alternatives both lose: shipping ix0 as a
    (B, s_pad, 1) sublane-plane operand costs XLA a 5.9 ms lane->sublane
    relayout copy, and transposing the row to a (C, 1) column in-kernel
    costs ~7 ms across the grid (measured v5e, 1024^2 x 64 x 1e5: NT
    kernel 12.8 ms vs 15.8 / 22.6 for those two)."""
    ix0 = ix0_row.astype(jnp.int32)
    iota = lax.broadcasted_iota(jnp.int32, (cols_e, chunk), 0)
    return iota == ix0, iota == ix0 + 1


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(st_ref, lane_ref, ext_ref, *, ts, chunk, halo,
                n_out, with_w=True, skip_dead=True, terms=_SPLIT_TERMS):
    # slots past n_live (the slot table's trailing entry) carry only
    # no-overlap reals / excess fillers: skip ALL compute and writes.
    # Their output index is tile nt-1 == the last live slot's tile (every
    # tile owns >= one live chunk), so the resident block is untouched
    # and correct at writeback.  Interpret mode keeps the branch-free
    # form (the rows are inert by data anyway; Pallas CPU lowering
    # rejects kernels whose trace captures constants).
    if not skip_dead:
        _fwd_kernel_live(st_ref, lane_ref, ext_ref, ts=ts,
                         chunk=chunk, halo=halo, n_out=n_out,
                         with_w=with_w, terms=terms)
        return
    b = pl.program_id(0)
    s = pl.program_id(1)
    live = s < st_ref[b, pl.num_programs(1)]

    @pl.when(live)
    def _():
        _fwd_kernel_live(st_ref, lane_ref, ext_ref, ts=ts,
                         chunk=chunk, halo=halo, n_out=n_out,
                         with_w=with_w, terms=terms)


def _fwd_kernel_live(st_ref, lane_ref, ext_ref, *, ts, chunk,
                     halo, n_out, with_w=True, terms=_SPLIT_TERMS):
    b = pl.program_id(0)
    s = pl.program_id(1)
    t_cur = st_ref[b, s]
    t_prev = st_ref[b, jnp.maximum(s - 1, 0)]
    first = jnp.logical_or(s == 0, t_cur != t_prev)

    cols_e = ts[-1] + (1 if halo else 0)
    lane = lane_ref[0]                                    # (L, C) f32
    iw = 1 if with_w else 0          # lane-row offset of the weight row
    if n_out == 2:
        rows_e = ts[0] + (1 if halo else 0)
        iy0 = lane[0:1, :].astype(jnp.int32)
        dly = lane[1:2, :]
        dlx = lane[2 + iw:3 + iw, :]
        iota_r = lax.broadcasted_iota(jnp.int32, (rows_e, chunk), 0)
        m = jnp.maximum(1.0 - jnp.abs((iy0 - iota_r).astype(jnp.float32)
                                      + dly), 0.0)        # (rows_e, C)
        if with_w:
            m = m * lane[2:3, :]
    else:
        # flattened (z, y) stencil rows; ty+1 is a power of two by tile
        # design so row -> (z, y) is a shift + mask
        rows_e = (ts[0] + 1) * (ts[1] + 1)
        tyq = ts[1] + 1
        assert tyq & (tyq - 1) == 0, ts  # row -> (z, y) must be shift+mask
        iz0 = lane[0:1, :].astype(jnp.int32)
        dlz = lane[1:2, :]
        iy0 = lane[2:3, :].astype(jnp.int32)
        dly = lane[3:4, :]
        dlx = lane[4 + iw:5 + iw, :]
        iota_r = lax.broadcasted_iota(jnp.int32, (rows_e, chunk), 0)
        z_r = iota_r >> (tyq.bit_length() - 1)
        y_r = iota_r & (tyq - 1)
        hz = jnp.maximum(1.0 - jnp.abs((iz0 - z_r).astype(jnp.float32)
                                       + dlz), 0.0)
        hy = jnp.maximum(1.0 - jnp.abs((iy0 - y_r).astype(jnp.float32)
                                       + dly), 0.0)
        m = hz * hy
        if with_w:
            m = m * lane[4:5, :]

    # pure {0,1} one-hot x columns (C, cols_e); all VALUES ride the row
    # side as (1, C) sublane broadcasts — nothing value-like ever
    # needs a (C, 1) lane-broadcast (bf16 selects against i32-layout
    # masks are a relayout Mosaic rejects; mask->bf16 casts + multiplies
    # are native)
    lo, hi = _x_selects(lane[-1:, :], chunk, cols_e)
    xs = [lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)]
    cxs = [1.0 - dlx, dlx]

    # NT contraction: the point axis is the minor (lane) dim of BOTH
    # operands; Mosaic's internal handling beats materialising either
    # operand in the point-on-sublanes layout (see _x_selects)
    dims = (((1,), (1,)), ((), ()))
    acc = None
    for j in (0, 1):
        mj = m * cxs[j]
        # in-kernel exact `terms`-term split (Mosaic does not run XLA's
        # excess-precision elision, so the astype round-trip is safe
        # here, unlike in splat_matmul); terms=1 is the documented
        # ~2e-3 fast mode (backend "binned_bf16"), terms=2 the faithful
        # default
        rem = mj
        for t_i in range(terms):
            half = rem.astype(jnp.bfloat16)
            if t_i + 1 < terms:
                rem = rem - half.astype(jnp.float32)
            part = lax.dot_general(half, xs[j], dims,
                                   preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part

    @pl.when(first)
    def _():
        ext_ref[0, 0] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        ext_ref[0, 0] = ext_ref[0, 0] + acc


def _fold(ext, grid_size, ts, halo):
    """Sum the per-tile extended windows back into the dense grid (the
    scatter-free completion of the forward).  ext (B, nt, rows_e, cols_e)
    -> (B, *grid_size).

    Separable: per axis, the window bodies tile ``ceil(g/t)*t`` positions
    contiguously (a reshape) and the +1 halo slivers land at positions
    ``t, 2t, ...`` — exactly one strided interior `lax.pad` per axis.
    Positions past the real grid (the virtual padding and the last tile's
    halo) are sliced off at the end == reference OOB-drop semantics."""
    n = len(grid_size)
    b = ext.shape[0]
    nts = [-(-g // t) for g, t in zip(grid_size, ts)]
    if not halo:
        return ext.reshape((b,) + tuple(grid_size))
    shape = (b,) + tuple(nts) + tuple(t + 1 for t in ts)
    x = ext.reshape(shape)
    perm = [0]
    for i in range(n):
        perm += [1 + i, 1 + n + i]
    x = x.transpose(perm)          # (B, m0, t0+1, m1, t1+1, ...)
    for i in range(n):
        # axes before i are already merged: m_i sits at axis 1 + i
        ax = 1 + i
        t, m = ts[i], nts[i]
        zero = jnp.array(0, x.dtype)
        body = lax.slice_in_dim(x, 0, t, axis=ax + 1)
        ns = body.shape[:ax] + (m * t,) + body.shape[ax + 2:]
        body = body.reshape(ns)
        cfg = [(0, 0, 0)] * len(ns)
        cfg[ax] = (0, 1, 0)
        body = lax.pad(body, zero, cfg)                # (.., m*t + 1, ..)
        halo_s = lax.slice_in_dim(x, t, t + 1, axis=ax + 1)
        halo_s = halo_s.reshape(ns[:ax] + (m,) + ns[ax + 1:])
        cfg[ax] = (t, 0, t - 1)                        # -> positions k*t
        halo_s = lax.pad(halo_s, zero, cfg)
        x = body + halo_s
    for i in range(n):
        x = lax.slice_in_dim(x, 0, grid_size[i], axis=1 + i)
    return x


def _fold_pl_2d(ext, grid_size, ts, ow=None, bg=None):
    """TPU Pallas replacement for :func:`_fold` in 2D (same output,
    pre-slice): ext (B, nt, 128, 128) -> (B, nI*128, wp) where
    ``nI = ceil(gy/128)``, ``wp = align128(gx)``; the caller slices to
    the grid.  With per-pose ``ow``/``bg`` (f32 (B,)) the epilogue
    ``x * ow[b] + bg[b]`` fuses into the band write — a separate XLA
    elementwise pass would re-read and re-write the full grid
    (~0.65 ms at 1024^2 x 64).  Measured v5e, 1024^2 x 64: 5.3 ms (XLA
    strided pad-adds, which materialise several full-size
    intermediates) -> ~2 ms.

    One instance per aligned 128-row output band: it reads the two
    window rows overlapping the band (two in-specs over the SAME ext
    array — XLA passes one buffer twice, no copy), assembles each into a
    width-wp strip with static column placements (windows overlap by one
    column per axis; the += on the shared column realises the halo sum),
    then shifts both strips into band position with one dynamic sublane
    roll each — band row i needs strip-A row ``i + off`` and strip-B row
    ``i + off - t0``; the strips sit above 128 zero rows so the roll
    wrap-around implements the edge zero-fill."""
    t0, t1 = ts
    gy, gx = grid_size
    bsz = ext.shape[0]
    n0, n1 = -(-gy // t0), -(-gx // t1)
    n_i = -(-gy // 128)
    wp = -(-gx // 128) * 128
    exr = ext.reshape(bsz, n0, n1, t0 + 1, t1 + 1)
    with_epilogue = ow is not None
    if not with_epilogue:
        ow = jnp.ones((bsz,), jnp.float32)
        bg = jnp.zeros((bsz,), jnp.float32)

    def kern(a_ref, b_ref, ow_ref, bg_ref, o_ref, scr):
        b = pl.program_id(0)
        i = pl.program_id(1)
        ty_a = (128 * i) // t0
        ty_b = jnp.minimum(ty_a + 1, n0 - 1)
        off = 128 * i - t0 * ty_a

        # rows [128, 256) and [384, 512) of the persistent scratch are the
        # zero halves the rolls wrap into; written once per kernel launch
        @pl.when(jnp.logical_and(b == 0, i == 0))
        def _():
            scr[128:256] = jnp.zeros((128, wp), jnp.float32)
            scr[384:512] = jnp.zeros((128, wp), jnp.float32)

        def assemble(x_ref, half):
            r0 = half * 256
            for k in range(n1):
                wk = min(128, wp - t1 * k)
                if wk <= 0:
                    continue
                w = x_ref[0, 0, k][:, :wk]
                c = t1 * k
                if k == 0:
                    scr[r0:r0 + 128, c:c + wk] = w
                else:
                    # column c is the previous window's halo column: add
                    scr[r0:r0 + 128, c:c + 1] = (scr[r0:r0 + 128, c:c + 1]
                                                 + w[:, :1])
                    if wk > 1:
                        scr[r0:r0 + 128, c + 1:c + wk] = w[:, 1:]

        assemble(a_ref, 0)
        assemble(b_ref, 1)
        sa = scr[0:256]
        sb = scr[256:512]
        out_a = pltpu.roll(sa, lax.rem(256 - off, 256), axis=0)[:128]
        out_b = pltpu.roll(sb, t0 - off, axis=0)[:128]
        out_b = jnp.where(ty_b > ty_a, out_b, 0.0)
        if with_epilogue:
            o_ref[0] = (out_a + out_b) * ow_ref[b] + bg_ref[b]
        else:
            o_ref[0] = out_a + out_b

    out = pl.pallas_call(
        kern,
        grid=(bsz, n_i),
        in_specs=[
            pl.BlockSpec((1, 1, n1, t0 + 1, t1 + 1),
                         lambda b, i: (b, (128 * i) // t0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1, t0 + 1, t1 + 1),
                         lambda b, i: (b, jnp.minimum((128 * i) // t0 + 1,
                                                      n0 - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz,), lambda b, i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bsz,), lambda b, i: (0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 128, wp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((bsz, n_i * 128, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((512, wp), jnp.float32)],
    )(geometry.vma_erase(exr), geometry.vma_erase(exr),
      geometry.vma_erase(ow.astype(jnp.float32)),
      geometry.vma_erase(bg.astype(jnp.float32)))
    return geometry.vma_assert(out, geometry.vma_union(ext, ow, bg))


def _band_pl_ok(grid_size, ts) -> bool:
    """The band-based Pallas fold AND unfold apply: 2D multi-tile with
    full-width strips that fit VMEM (fold scratch 512 x wp x 4 B; unfold
    scratch depth x 136 x wp x 4 B + an n1-window out block).  Wider
    grids fall back to the XLA forms — `supported()` admits e.g.
    (256, 8128), whose wp = 8192 band would blow the ~16 MB budget."""
    if len(grid_size) != 2:
        return False
    n1 = -(-grid_size[1] // ts[1])
    wp = -(-grid_size[1] // 128) * 128
    return wp <= 2048 and n1 * (ts[0] + 1) * (ts[1] + 1) * 4 <= 2 ** 20


def _unfold(x, grid_size, ts, transposed=False):
    """Extract the per-tile extended cotangent windows — the exact adjoint
    of :func:`_fold`.  x (B, *grid) -> (B, nt, rows_e, cols_e) with
    ``window[t] = x_pad[t*ts : t*ts + ts + 1]`` per axis (zero padding
    outside the grid: out-of-grid stencil neighbours gather 0).

    With ``transposed=True`` the windows come out as (B, nt, cols_e,
    rows_e) — the orientation the backward kernel consumes — at no extra
    cost (the axis order is picked in the final transpose either way)."""
    n = len(grid_size)
    b = x.shape[0]
    nts = [-(-g // t) for g, t in zip(grid_size, ts)]
    pad = [(0, 0)] + [(0, nts[i] * ts[i] + 1 - grid_size[i])
                      for i in range(n)]
    xp = jnp.pad(x, pad)
    for i in range(n):
        ax = 1 + 2 * i             # spatial axis i's current position
        t, m = ts[i], nts[i]
        body = lax.slice_in_dim(xp, 0, m * t, axis=ax)
        body = body.reshape(body.shape[:ax] + (m, t) + body.shape[ax + 1:])
        halo_s = lax.slice_in_dim(xp, t, m * t + 1, stride=t, axis=ax)
        halo_s = halo_s.reshape(halo_s.shape[:ax] + (m, 1)
                                + halo_s.shape[ax + 1:])
        xp = jnp.concatenate([body, halo_s], axis=ax + 1)
    sub_axes = [2 + 2 * i for i in range(n)]
    if transposed:
        sub_axes = sub_axes[-1:] + sub_axes[:-1]
    perm = [0] + [1 + 2 * i for i in range(n)] + sub_axes
    xp = xp.transpose(perm)        # (B, m0.., t0+1..)
    rows = math.prod(t + 1 for t in ts[:-1])
    if transposed:
        return xp.reshape(b, math.prod(nts), ts[-1] + 1, rows)
    return xp.reshape(b, math.prod(nts), rows, ts[-1] + 1)


def _unfold_pl_2d(g_cot, grid_size, ts):
    """TPU Pallas replacement for ``_unfold(..., transposed=True)`` in
    2D: band-fetch DMA + static window carving (measured v5e,
    1024^2 x 64: XLA strided-slice/concat form 6.2 ms -> per-tile DMA
    kernel 2.9 -> this band form 1.8; the XLA form materialises ~4
    intermediate copies of the 340 MB window array).

    HBM slices must start on the (8, 128) tile quanta, but windows sit
    at multiples of the 127-voxel body tile.  One DMA per
    (pose, tile-ROW) fetches a full-width (136, wp) band (vs one
    (136, 256) aligned fetch per tile, whose neighbour overlap read
    2.1x the bytes and issued 9x the DMAs at 1024^2).  The band's
    sublane shift is the only dynamic roll (`pltpu.roll`); every
    window's x-origin is compile-time, so the n1 windows are carved
    with STATIC lane slices + static rolls, masked to zero outside the
    grid (the reference's OOB-drop semantics), transposed, and written
    as the (cols_e, rows_e) blocks the backward kernel consumes.
    Four-deep buffered: each instance issues its DMA three bands ahead.
    """
    t0, t1 = ts
    gy, gx = grid_size
    bsz = g_cot.shape[0]
    n0, n1 = -(-gy // t0), -(-gx // t1)
    fh = 136
    hp = max(-(-gy // 8) * 8, fh)
    wp = max(-(-gx // 128) * 128, 256)
    if (hp, wp) != (gy, gx):                # no-op for 1024^2-like grids
        g_cot = jnp.pad(g_cot, ((0, 0), (0, hp - gy), (0, wp - gx)))

    depth = 4
    total = bsz * n0

    def kern(g_hbm, out_ref, scr, sem):
        bb = pl.program_id(0)
        ty = pl.program_id(1)
        flat = bb * n0 + ty
        slot = lax.rem(flat, depth)

        def dma(fl, sl):
            bn = fl // n0
            tyn = lax.rem(fl, n0)
            yn = jnp.minimum(8 * ((tyn * t0) // 8), hp - fh)
            return pltpu.make_async_copy(
                g_hbm.at[bn, pl.ds(pl.multiple_of(yn, 8), fh)],
                scr.at[sl], sem.at[sl])

        @pl.when(flat == 0)
        def _():
            for k in range(min(depth - 1, total)):
                dma(flat + k, lax.rem(slot + k, depth)).start()

        @pl.when(flat + depth - 1 < total)
        def _():
            dma(flat + depth - 1, lax.rem(slot + depth - 1, depth)).start()

        dma(flat, slot).wait()
        y0 = ty * t0
        ya = jnp.minimum(8 * (y0 // 8), hp - fh)
        dy = y0 - ya
        band = pltpu.roll(scr[slot], lax.rem(fh - dy, fh), axis=0)
        ri = lax.broadcasted_iota(jnp.int32, (t0 + 1, t1 + 1), 0)
        ci = lax.broadcasted_iota(jnp.int32, (t0 + 1, t1 + 1), 1)
        rmask = ri < gy - y0
        for tx in range(n1):
            x0 = tx * t1
            xa = min(128 * (x0 // 128), wp - 256)   # static
            dx = x0 - xa                            # static, < 256
            # The static roll below can wrap lanes from seg's LOW end into
            # the carved window whenever dx + t1 + 1 > 256 (only possible
            # on clamped edge bands, xa == wp - 256).  Those wrapped lanes
            # correspond to grid columns >= xa + 256 >= gx, so the
            # ``ci < gx - x0`` mask zeroes exactly the wrapped region —
            # the invariant a tile-size / fetch-width change must keep:
            assert dx + t1 + 1 <= 256 or gx <= xa + 256, (tx, dx, xa, gx)
            seg = band[:, xa:xa + 256]
            if dx:
                seg = pltpu.roll(seg, 256 - dx, axis=1)
            w = seg[:t0 + 1, :t1 + 1]
            w = jnp.where(rmask & (ci < gx - x0), w, 0.0)
            out_ref[0, 0, tx] = w.T

    out = pl.pallas_call(
        kern,
        grid=(bsz, n0),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 1, n1, t1 + 1, t0 + 1),
                               lambda bb, ty: (bb, ty, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=_out_struct((bsz, n0, n1, t1 + 1, t0 + 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((depth, fh, wp), jnp.float32),
                        pltpu.SemaphoreType.DMA((depth,))],
    )(geometry.vma_erase(g_cot))
    out = out.reshape(bsz, n0 * n1, t1 + 1, t0 + 1)
    return geometry.vma_assert(out, geometry.vma_union(g_cot))


def raster_fwd(grid_size, points, rotation, translation, background,
               out_weight, point_weight, *, chunk: int | None = None,
               interpret: bool | None = None, pw_uniform: bool = False,
               terms: int = _SPLIT_TERMS):
    """Forward rasterisation -> (B, *grid_size).

    ``pw_uniform=True`` is the STATIC promise that every `point_weight`
    entry equals ``point_weight[0]`` (the API sets it when the argument
    was defaulted or scalar — the reference's lazy `Ones` FillArray,
    `src/interface.jl:368-394`): the weight plane is dropped from the
    binning sort and the scalar factor is applied post-fold.

    ``terms`` is the bf16 split depth of the kernels' value operands:
    2 (default) keeps the ≤1e-5 parity contract; 1 is the documented
    ~2e-3 fast mode (backend ``"binned_bf16"``) that halves the kernel
    matmuls — the binned analogue of ``matmul_bf16``."""
    out, _ = _fwd_impl(grid_size, points, rotation, translation, background,
                       out_weight, point_weight, chunk=chunk,
                       interpret=interpret, with_residuals=False,
                       pw_uniform=pw_uniform, terms=terms)
    return out


def raster_fwd_res(grid_size, points, rotation, translation, background,
                   out_weight, point_weight, *, chunk: int | None = None,
                   interpret: bool | None = None, pw_uniform: bool = False,
                   terms: int = _SPLIT_TERMS):
    """Forward + reusable binning residuals ``(data, slot_tile)``.

    `jax.grad` goes through this pair (see `dprast.ad`): the sorted slot
    frame additionally carries the point-id plane, so the pullback skips
    its entire binning prep (keys + the big sort — ~27 ms of a 88 ms
    backward at 1024², measured v5e).  The reference's
    recompute-not-cache choice (`src/raster_pullback.jl:20-22`) is the
    right call for its gather loop; here the binning is a quarter of the
    backward, and caching it is the standard remat trade."""
    return _fwd_impl(grid_size, points, rotation, translation, background,
                     out_weight, point_weight, chunk=chunk,
                     interpret=interpret, with_residuals=True,
                     pw_uniform=pw_uniform, terms=terms)


def _fwd_impl(grid_size, points, rotation, translation, background,
              out_weight, point_weight, *, chunk, interpret,
              with_residuals, pw_uniform=False, terms=_SPLIT_TERMS):
    n_out = len(grid_size)
    assert supported(n_out, grid_size, points.shape[0]), \
        f"binned backend does not support grid={grid_size} " \
        f"P={points.shape[0]}"
    # the API short-circuits P == 0 to the background image before
    # dispatch; a direct backend call must not reach the uniform path's
    # point_weight[0] read (or build an empty slot frame) with no points
    assert points.shape[0] > 0, "binned backend requires n_points > 0"
    if interpret is None:
        interpret = _interpret_default()
    if chunk is None:
        chunk = _default_chunk(grid_size, points.shape[0])
    ts = tile_shape_for(grid_size)
    nt = n_tiles(grid_size, ts)
    halo = not _single_tile(grid_size)
    bsz = rotation.shape[0]
    p = points.shape[0]
    f32 = jnp.float32

    key, locs, _ = _keys_and_local(grid_size, ts, points, rotation,
                                   translation)
    planes = list(locs)
    fills = [0.0] * n_out                          # enc 0 = inert
    if not pw_uniform:
        # per-row weight plane carries the POINT weight only; the per-pose
        # out_weight factor is applied once after the fold (the splat is
        # linear in it) — on the uniform fast path the whole plane is
        # dropped from the sort and the scalar point weight joins that
        # post-fold factor instead
        planes.append(jnp.broadcast_to(
            point_weight.astype(f32)[None, :], key.shape))
        fills.append(0.0)                          # filler weight = 0
    # the point-id plane always rides the sort (packed into the key when
    # the bits fit): the forward itself does not need it, but unique keys
    # let the sort drop its stability tiebreaker — cheaper than the
    # id-free stable sort it replaces
    planes.append(jnp.broadcast_to(
        jnp.arange(p, dtype=f32)[None, :], key.shape))
    fills.append(float(p))       # fillers sort past every real point
    if halo:
        data, slot_tile = _prep_binned_all(key, planes, fills, nt, chunk,
                                           True, pack_idx=True)
    else:
        data, slot_tile = jax.vmap(
            lambda *pls: _prep_direct(list(pls), fills, chunk)
        )(*locs, *planes[n_out:])
    w_plane = None if pw_uniform else data[:, n_out]
    lane = _planes_fwd(data[:, :n_out], w_plane, ts, n_out)

    s_pad = data.shape[-1]
    n_slots = s_pad // chunk
    if n_out == 2:
        rows_e = ts[0] + (1 if halo else 0)
    else:
        rows_e = (ts[0] + 1) * (ts[1] + 1)
    cols_e = ts[-1] + (1 if halo else 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_slots),
        in_specs=[
            pl.BlockSpec((1, lane.shape[1], chunk),
                         lambda b, s, st: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, rows_e, cols_e),
            lambda b, s, st: (b, st[b, s], 0, 0),
            memory_space=pltpu.VMEM),
    )
    vma = geometry.vma_union(slot_tile, lane)
    ext = pl.pallas_call(
        functools.partial(_fwd_kernel, ts=ts, chunk=chunk, halo=halo,
                          n_out=n_out, with_w=not pw_uniform,
                          skip_dead=not interpret, terms=terms),
        grid_spec=grid_spec,
        out_shape=_out_struct((bsz, nt, rows_e, cols_e), f32),
        interpret=interpret,
    )(geometry.vma_erase(slot_tile), geometry.vma_erase(lane))
    ext = geometry.vma_assert(ext, vma)

    ow_eff = out_weight.astype(f32)
    if pw_uniform:
        # all entries equal by the static contract; fold the scalar in
        ow_eff = ow_eff * point_weight.astype(f32)[0]
    bg_f = background.astype(f32)
    if halo and not interpret and _band_pl_ok(grid_size, ts):
        # the x*ow + bg epilogue rides the fold kernel's band writes
        out = _fold_pl_2d(ext, grid_size, ts, ow_eff,
                          bg_f)[:, :grid_size[0], :grid_size[1]]
    else:
        out = _fold(ext, grid_size, ts, halo)
        out = (out * ow_eff.reshape((bsz,) + (1,) * n_out)
               + bg_f.reshape((bsz,) + (1,) * n_out))
    dtype = jnp.result_type(points, rotation, translation)
    out = out.astype(dtype)
    if not with_residuals:
        return out, None
    return out, (data, slot_tile)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------




def _bwd_kernel(st_ref, lane_ref, g_ref, buf_ref, *, ts, chunk, halo,
                n_out, skip_dead=True, terms=_SPLIT_TERMS):
    """Transposed-orientation gather kernel: ``resT = gT @ o_rows`` with
    the cotangent window pre-transposed by `_unfold`.  Every per-point
    operand lives on the LANE axis end to end — inputs are (Mb, C) rows,
    the stencil combination broadcasts (1, C) rows over sublanes, the
    reductions run over sublanes, and the output is (n_out+1, C) rows —
    so no operation ever runs in the 1-lane (C, 1) layout.

    Slots past the table's n_live entry hold no-overlap reals and excess
    fillers — all zero-gradient: write zeros without gathering (their
    rows still ride the unsort, so the values must be real zeros, not
    stale VMEM).  Interpret mode keeps the branch-free form (see
    `_fwd_kernel`)."""
    if not skip_dead:
        _bwd_kernel_live(st_ref, lane_ref, g_ref, buf_ref, ts=ts,
                         chunk=chunk, halo=halo, n_out=n_out, terms=terms)
        return
    b = pl.program_id(0)
    s = pl.program_id(1)
    live = s < st_ref[b, pl.num_programs(1)]

    @pl.when(live)
    def _():
        _bwd_kernel_live(st_ref, lane_ref, g_ref, buf_ref, ts=ts,
                         chunk=chunk, halo=halo, n_out=n_out, terms=terms)

    @pl.when(jnp.logical_not(live))
    def _():
        buf_ref[0] = jnp.zeros((n_out + 1, chunk), jnp.float32)


def _bwd_kernel_live(st_ref, lane_ref, g_ref, buf_ref, *, ts, chunk,
                     halo, n_out, terms=_SPLIT_TERMS):
    cols_e = ts[-1] + (1 if halo else 0)
    if halo:
        gt = g_ref[0, 0]                                  # (cols_e, rows_e)
        if n_out == 2:
            rows_e = ts[0] + 1
        else:
            rows_e = (ts[0] + 1) * (ts[1] + 1)
    else:
        rows_e = ts[0]
        gt = g_ref[0]

    lane = lane_ref[0]                                    # (Mb, C)
    if n_out == 2:
        rows = [lane[0:1, :], lane[0:1, :] + 1]
        dly = lane[1:2, :]
    else:
        # one one-hot + matmul PER stencil row (a lane-dim concat of row
        # slices with distinct sublane offsets is unimplemented in
        # Mosaic; per-row matmuls carry the same total MXU FLOPs and
        # also skip slicing the result back apart)
        rows = [lane[i:i + 1, :] for i in range(4)]
        dlz, dly = lane[4:5, :], lane[5:6, :]
    # the VALUE side here is the small cotangent window, so the bf16
    # split runs once on (cols_e, rows_e); the one-hot gather rows are
    # exact in bf16 by construction
    g_terms = []
    rem = gt
    for _ in range(terms):
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
        return acc                                        # (cols_e, C)

    ps = [gather_row(r) for r in rows]
    if n_out == 2:
        p0, p1 = ps
        v1 = (1 - dly) * p0 + dly * p1
        dus_pre = [p1 - p0]                               # d/du_y
    else:
        p00, p01, p10, p11 = ps
        y0 = (1 - dly) * p00 + dly * p01
        y1 = (1 - dly) * p10 + dly * p11
        v1 = (1 - dlz) * y0 + dlz * y1
        dus_pre = [y1 - y0,                               # d/du_z
                   (1 - dlz) * (p01 - p00) + dlz * (p11 - p10)]  # d/du_y
    ix0 = lane[-2:-1, :].astype(jnp.int32)
    dlx = lane[-1:, :]
    iota = lax.broadcasted_iota(jnp.int32, (cols_e, chunk), 0)
    lo = iota == ix0
    hi = iota == ix0 + 1

    # masked row sums instead of materialised bx/dbx planes: each x
    # one-hot has exactly one nonzero row per point, so every reduction
    # picks a single row (zeros add exactly) and the weighting moves to
    # (1, C) lane math — BIT-exact vs the bx/dbx product form (same two
    # products, same subtract) with ~25% fewer VPU ops in this block
    # (measured v5e single-tile 128²x64x1e5: 8.60 -> 8.42 ms,
    # benchmarks/exp_xsel.py)
    def row_sums(v):
        return (jnp.sum(jnp.where(lo, v, 0.0), axis=0, keepdims=True),
                jnp.sum(jnp.where(hi, v, 0.0), axis=0, keepdims=True))

    a_v, b_v = row_sums(v1)
    omx = 1 - dlx
    gw = a_v * omx + b_v * dlx                            # (1, C)
    dus = []
    for dpre in dus_pre:
        c0, c1 = row_sums(dpre)
        dus.append(c0 * omx + c1 * dlx)
    dus.append(b_v - a_v)                                 # d/du_x
    buf_ref[0] = jnp.concatenate(dus + [gw], axis=0)      # (n_out+1, C)


def raster_pullback(grid_size, points, rotation, translation, background,
                    out_weight, point_weight, ds_dout, *,
                    chunk: int | None = None,
                    interpret: bool | None = None,
                    pw_uniform: bool = False,
                    terms: int = _SPLIT_TERMS) -> PullbackResult:
    """Analytic pullback -> PullbackResult (all six gradients).

    ``pw_uniform=True`` is the static promise that (a) every
    ``point_weight`` entry equals ``point_weight[0]`` AND (b) the caller
    observes ``d_pw`` only through its SUM (true for the `jax.grad` path
    — the broadcast-transpose sums it — and for the API's scalar-weight
    summing).  The weight-gradient plane then never rides the unsort:
    ``d_ow`` / ``sum(d_pw)`` are per-pose row sums of the SORTED frame
    (every non-point row is exactly zero), which drops one payload
    operand from the unsort — sort cost scales steeply with operand
    count (measured v5e, 4 x (16, 121k) rows: key+3 11.4 ms vs
    key+2 ~8.5)."""
    n_out = len(grid_size)
    assert supported(n_out, grid_size, points.shape[0]), \
        f"binned backend does not support grid={grid_size} " \
        f"P={points.shape[0]}"
    # see _fwd_impl: the API short-circuits P == 0 before dispatch; the
    # uniform path below reads point_weight[0]
    assert points.shape[0] > 0, "binned backend requires n_points > 0"
    if chunk is None:
        chunk = _default_chunk(grid_size, points.shape[0])
    ts = tile_shape_for(grid_size)
    nt = n_tiles(grid_size, ts)
    halo = not _single_tile(grid_size)
    p = points.shape[0]
    f32 = jnp.float32

    key, locs, _ = _keys_and_local(grid_size, ts, points, rotation,
                                   translation)
    # the frame carries ONLY the encoded coords (kernel input) and the
    # original point id (for the unsort); weights, point coordinates and
    # the rotation all re-enter AFTER the unsort, where rows align with
    # the original `points` order — this keeps the big binning sort at
    # n_out+1 payload planes (sort cost scales with operand count)
    ptidx = jnp.broadcast_to(
        jnp.arange(p, dtype=f32)[None, :], key.shape)
    # fills: enc 0 = inert coords; ptidx p (sorts past every real point)
    fills = [0.0] * n_out + [float(p)]
    if halo:
        data, slot_tile = _prep_binned_all(key, list(locs) + [ptidx], fills,
                                           nt, chunk, False, pack_idx=True)
    else:
        data, slot_tile = jax.vmap(
            lambda *pls: _prep_direct(list(pls), fills, chunk)
        )(*locs, ptidx)
    return _pullback_from_frame(
        grid_size, data[:, :n_out], data[:, n_out], slot_tile, points,
        rotation, out_weight, point_weight, ds_dout, chunk=chunk,
        interpret=interpret, pw_uniform=pw_uniform, terms=terms)


def raster_pullback_res(grid_size, residuals, args, ds_dout, *,
                        chunk: int | None = None,
                        interpret: bool | None = None,
                        pw_uniform: bool = False,
                        terms: int = _SPLIT_TERMS) -> PullbackResult:
    """Pullback reusing the forward's binning residuals (see
    `raster_fwd_res`): the frame's coord planes and point ids are already
    sorted, so the keys + big-sort prep is skipped entirely.

    ``pw_uniform`` must match the forward's flag — it determines the
    residual frame's plane layout (the uniform fast path carries no
    weight plane, so the point-id plane sits right after the coords)."""
    n_out = len(grid_size)
    if chunk is None:
        # must match the forward's choice (the residual frame's slot
        # geometry bakes it in); both derive it from the same inputs
        chunk = _default_chunk(grid_size, args[0].shape[0])
    data, slot_tile = residuals
    points, rotation, _, _, out_weight, point_weight = args
    idx_plane = n_out if pw_uniform else n_out + 1
    return _pullback_from_frame(
        grid_size, data[:, :n_out], data[:, idx_plane], slot_tile, points,
        rotation, out_weight, point_weight, ds_dout, chunk=chunk,
        interpret=interpret, pw_uniform=pw_uniform, terms=terms)


def _pullback_from_frame(grid_size, coord, idx_rows, slot_tile, points,
                         rotation, out_weight, point_weight, ds_dout, *,
                         chunk, interpret, pw_uniform=False,
                         terms=_SPLIT_TERMS) -> PullbackResult:
    n_out = len(grid_size)
    if interpret is None:
        interpret = _interpret_default()
    ts = tile_shape_for(grid_size)
    halo = not _single_tile(grid_size)
    bsz = rotation.shape[0]
    p, n_in = points.shape
    f32 = jnp.float32
    g_cot = ds_dout.astype(f32)
    s_pad = coord.shape[-1]
    n_slots = s_pad // chunk

    if n_out == 2:
        rows_e = ts[0] + (1 if halo else 0)
    else:
        rows_e = (ts[0] + 1) * (ts[1] + 1)
    cols_e = ts[-1] + (1 if halo else 0)

    # the extended cotangent windows, extracted ONCE in XLA and already
    # TRANSPOSED for the kernel: each instance reads a single
    # (cols_e, rows_e) block by slot->tile index — out-of-grid neighbours
    # see the zero padding (the reference OOB-drop semantics, no validity
    # masks)
    if halo:
        if n_out == 2 and not interpret and _band_pl_ok(grid_size, ts):
            # Pallas band DMA unfold (TPU only: the interpreter has no
            # DMA engine model worth paying for; CPU tests and
            # over-wide grids take the XLA path)
            g_in = _unfold_pl_2d(g_cot, grid_size, ts)
        else:
            g_in = _unfold(g_cot, grid_size, ts, transposed=True)
        g_spec = pl.BlockSpec((1, 1, cols_e, rows_e),
                              lambda b, s, st: (b, st[b, s], 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        g_in = jnp.swapaxes(g_cot, 1, 2)
        g_spec = pl.BlockSpec((1, ts[1], ts[0]),
                              lambda b, s, st: (b, 0, 0),
                              memory_space=pltpu.VMEM)

    lane_b = _planes_bwd(coord, ts, n_out)                # (B, Mb, s_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, n_slots),
        in_specs=[
            pl.BlockSpec((1, lane_b.shape[1], chunk),
                         lambda b, s, st: (b, 0, s),
                         memory_space=pltpu.VMEM),
            g_spec,
        ],
        out_specs=pl.BlockSpec((1, n_out + 1, chunk),
                               lambda b, s, st: (b, 0, s),
                               memory_space=pltpu.VMEM),
    )
    vma = geometry.vma_union(slot_tile, lane_b, g_in)
    buf = pl.pallas_call(
        functools.partial(_bwd_kernel, ts=ts, chunk=chunk, halo=halo,
                          n_out=n_out, skip_dead=not interpret,
                          terms=terms),
        grid_spec=grid_spec,
        out_shape=_out_struct((bsz, n_out + 1, s_pad), f32),
        interpret=interpret,
    )(geometry.vma_erase(slot_tile), geometry.vma_erase(lane_b),
      geometry.vma_erase(g_in))
    buf = geometry.vma_assert(buf, vma)

    # ---- everything below is plain XLA on the raw per-row gradients ----
    # unsort the raw kernel rows by point id (one batched multi-operand
    # sort; measured v5e 1024^2: a take_along_axis row gather is ~5x
    # SLOWER than re-sorting every plane — TPU sorts beat gathers).  The
    # direct path keeps original order and needs nothing.  On the
    # uniform-weight path the weight-gradient plane skips the unsort:
    # d_ow and sum(d_pw) are order-independent row sums of the sorted
    # frame (non-point rows are exactly zero), and pw_uniform's contract
    # says the caller observes d_pw only through its sum.
    n_uns = n_out if (pw_uniform and halo) else n_out + 1
    if halo:
        if bsz <= 8:
            # small pose batches: ONE flat 1-D sort with the pose id
            # packed above the point id (pids < 2^24 by `supported`, so
            # the bits always fit) — XLA's batched dim-1 sort lowers to
            # a ~10x slower implementation when the batch is this small
            # (measured v5e, (1, 1.09M) key+4: 38 -> ~3.5 ms).  Each
            # segment holds exactly s_pad rows, so the reshape back is
            # exact.
            seg = (jnp.arange(bsz, dtype=jnp.int32) << 24)[:, None]
            kf = (idx_rows.astype(jnp.int32) + seg).reshape(-1)
            ops = lax.sort((kf,) + tuple(buf[:, i].reshape(-1)
                                         for i in range(n_uns)),
                           dimension=0, num_keys=1, is_stable=False)
            per = [o.reshape(bsz, s_pad)[:, :p] for o in ops[1:]]
        else:
            # chunked: one (64, n) sort is ~30% slower than 4 x (16, n)
            # (see _prep_binned_all)
            pers = []
            for i in range(0, bsz, _SORT_BATCH):
                sl = slice(i, i + _SORT_BATCH)
                ops = lax.sort(
                    (idx_rows[sl],) + tuple(buf[sl, i2]
                                            for i2 in range(n_uns)),
                    dimension=1, num_keys=1, is_stable=False)
                pers.append([o[:, :p] for o in ops[1:]])
            per = [jnp.concatenate([c[k] for c in pers])
                   for k in range(n_uns)]
    else:
        per = [buf[:, i, :p] for i in range(n_out + 1)]
    du_pt = jnp.stack(per[:n_out], axis=1)                # (B, n_out, P)

    scale = jnp.asarray(grid_size, f32) / 2
    ow = out_weight.astype(f32)
    pw = point_weight.astype(f32)
    # scaled_i = du_i * (g_i/2) * ow * pw   (B, n_out, P)
    scaled = (du_pt * scale[None, :, None]
              * (ow[:, None, None] * pw[None, None, :]))

    d_t = jnp.sum(scaled, axis=-1)                        # (B, n_out)
    d_r = jnp.einsum("bns,si->bni", scaled, points.astype(f32),
                     precision=lax.Precision.HIGHEST)
    d_bg = jnp.sum(g_cot.reshape(bsz, -1), axis=-1)
    d_points = jnp.einsum("bns,bni->si", scaled,
                          rotation.astype(f32),
                          precision=lax.Precision.HIGHEST)  # (P, n_in)
    if pw_uniform and halo:
        # per-pose frame row sums == per-pose point sums (fillers,
        # no-overlap reals and dead slots all wrote exact zeros)
        gw_sums = jnp.sum(buf[:, n_out].astype(f32), axis=-1)    # (B,)
        d_ow = gw_sums * pw[0]
        # sum-exact uniform spread (see pw_uniform's contract above)
        d_pw = jnp.full((p,), jnp.dot(gw_sums, ow) / p, f32)
    else:
        gw_pt = per[n_out]                                # (B, P)
        d_ow = jnp.einsum("bs,s->b", gw_pt, pw,
                          precision=lax.Precision.HIGHEST)
        d_pw = jnp.einsum("bs,b->s", gw_pt, ow,
                          precision=lax.Precision.HIGHEST)

    dtype = jnp.result_type(points, rotation, ds_dout)
    return PullbackResult(
        points=d_points.astype(dtype),
        rotation=d_r.astype(dtype),
        translation=d_t.astype(dtype),
        background=d_bg.astype(dtype),
        out_weight=d_ow.astype(dtype),
        point_weight=d_pw.astype(dtype),
    )
