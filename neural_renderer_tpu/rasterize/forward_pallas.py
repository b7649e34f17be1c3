"""Pallas TPU forward rasterizer: screen-tile binning + per-tile argmin-z.

The reference K3 kernel is O(pixels x ALL faces) per image
(``rasterize.py:300-340``) — each CUDA thread loops every face, relying on
early-out edge tests.  TPUs want the opposite shape: big regular vector work
with no data-dependent branches.  This kernel restores the lost factor
algorithmically instead:

  1. **Bin (XLA):** project each face, cull backfaces, compute its pixel
     bbox, and bin it to the 2-D grid of screen tiles it overlaps.  Per tile
     we keep up to ``faces_per_tile_cap`` face ids in ascending order (ties
     in the z-test then resolve to the lowest id — identical to the
     reference's sequential first-wins rule) plus a count.
  2. **Rasterize (Pallas):** grid = (batch, tile_y, tile_x, face_chunk).
     Each program streams one 128-face chunk of its tile's packed face table
     through VMEM, evaluates inside tests / barycentric weights /
     perspective depth for all (pixel, face) pairs as VPU elementwise math,
     and folds a running (min depth, first-argmin face id) into the tile's
     resident output block — the flash-attention accumulation pattern.
     Scalar-prefetched per-tile counts let wholly-empty chunks skip all
     compute, so sparse tiles cost almost nothing.

Tiles are ``tile_size`` rows x 128 columns — the native f32 (8, 128) vreg
layout.  Per-pixel work drops from O(nf) to O(faces overlapping the tile).
Weights / face_inv / textures are recomputed from the winner index by the
shared XLA post-passes (forward_xla.winner_attributes), so this kernel
carries minimum state.

Capacity: tiles overlapped by more than ``faces_per_tile_cap`` front faces
lose the overflow (check with ``binning_overflow``; raise the cap or fall
back to backend='xla' for pathological scenes).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_renderer_tpu.rasterize import geometry

# packed face feature layout (sublane axis of the per-tile face table):
# 0:x0 1:y0 2:x1 3:y1 4:x2 5:y2 (NDC xy), 6:z0 7:z1 8:z2,
# 9..17: face_inv rows, 18..23: pad (sublane-aligned to 24)
_NFEAT = 24
_TILE_COLS = 128
_CHUNK = 128


def _tile_dims(settings):
    is_ = settings.image_size
    tc = min(_TILE_COLS, is_)
    tr = max(8, min(settings.tile_size, is_))
    return tr, tc


def supported(settings, faces):
    if jax.default_backend() != 'tpu':
        return False
    tr, tc = _tile_dims(settings)
    if settings.image_size % tr or settings.image_size % tc:
        return False
    return True


def _overlap_mask(settings, faces):
    """[bs, nf, Ty, Tx] bool: front face's conservative bbox hits tile."""
    is_ = settings.image_size
    tr, tc = _tile_dims(settings)
    ty, tx = is_ // tr, is_ // tc

    front = geometry.is_frontface(faces)
    px = geometry.to_pixel_coords(faces[..., 0], is_)
    py = geometry.to_pixel_coords(faces[..., 1], is_)
    xmin = jnp.floor(px.min(-1)) - 1.0
    xmax = jnp.ceil(px.max(-1)) + 1.0
    ymin = jnp.floor(py.min(-1)) - 1.0
    ymax = jnp.ceil(py.max(-1)) + 1.0

    col_lo = jnp.arange(tx, dtype=jnp.float32) * tc
    col_hi = col_lo + (tc - 1)
    row_lo = jnp.arange(ty, dtype=jnp.float32) * tr
    row_hi = row_lo + (tr - 1)
    ox = ((xmin[..., None] <= col_hi) & (xmax[..., None] >= col_lo))
    oy = ((ymin[..., None] <= row_hi) & (ymax[..., None] >= row_lo))
    return (oy[:, :, :, None] & ox[:, :, None, :]
            & front[:, :, None, None])


def _bin_faces(settings, faces):
    """XLA binning pass.

    Returns (fdata [bs,Ty,Tx,K,_NFEAT,CHUNK] f32,
             ids [bs,Ty,Tx,K,1,CHUNK] i32 (-1 pad),
             counts [bs,Ty,Tx] i32).
    """
    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    tr, tc = _tile_dims(settings)
    ty, tx = is_ // tr, is_ // tc
    cap = min(settings.faces_per_tile_cap, nf)
    cap_pad = -(-cap // _CHUNK) * _CHUNK                     # chunk multiple
    k_chunks = cap_pad // _CHUNK

    overlap = _overlap_mask(settings, faces)
    counts = overlap.sum(axis=1, dtype=jnp.int32)            # [bs, Ty, Tx]
    counts = jnp.minimum(counts, cap)

    # per-tile ascending face ids via top_k on -fid (masked -> sentinel)
    fid = jnp.arange(nf, dtype=jnp.int32)
    score = jnp.where(overlap, -fid[None, :, None, None], -(nf + 1))
    score = score.transpose(0, 2, 3, 1).reshape(bs, ty * tx, nf)
    top, top_idx = jax.lax.top_k(score, cap)                 # descending
    ids = jnp.where(top > -(nf + 1), top_idx.astype(jnp.int32), -1)
    if cap_pad > cap:
        ids = jnp.pad(ids, ((0, 0), (0, 0), (0, cap_pad - cap)),
                      constant_values=-1)
    cap = cap_pad

    finv = geometry.face_inv_matrix(
        geometry.to_pixel_coords(faces[..., 0], is_),
        geometry.to_pixel_coords(faces[..., 1], is_))
    feat = jnp.concatenate([
        faces[..., 0, 0:2], faces[..., 1, 0:2], faces[..., 2, 0:2],
        faces[..., :, 2],                                    # z0 z1 z2
        finv.reshape(bs, nf, 9),
        jnp.zeros((bs, nf, _NFEAT - 18), jnp.float32),
    ], axis=-1)                                              # [bs, nf, 24]

    safe = jnp.clip(ids.reshape(bs, ty * tx * cap), 0, nf - 1)
    fdata = jnp.take_along_axis(feat, safe[..., None], axis=1)
    fdata = (fdata.reshape(bs, ty, tx, k_chunks, _CHUNK, _NFEAT)
             .transpose(0, 1, 2, 3, 5, 4))
    ids = ids.reshape(bs, ty, tx, k_chunks, 1, _CHUNK)
    return fdata, ids, counts


def _tile_kernel(settings, tr, tc, counts_ref, fdata_ref, ids_ref,
                 depth_ref, idx_ref):
    is_ = settings.image_size
    b = pl.program_id(0)
    iy = pl.program_id(1)
    ix = pl.program_id(2)
    k = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(k == 0)
    def _init():
        depth_ref[0] = jnp.full((tr, tc), jnp.inf, jnp.float32)
        idx_ref[0] = jnp.full((tr, tc), -1, jnp.int32)

    count = counts_ref[b, iy, ix]

    @pl.when(k * _CHUNK < count)
    def _compute():
        f = fdata_ref[0, 0, 0, 0]        # [_NFEAT, _CHUNK]
        ids = ids_ref[0, 0, 0, 0, 0]     # [_CHUNK] int32

        ry = jax.lax.broadcasted_iota(jnp.int32, (tr, tc, 1), 0)
        rx = jax.lax.broadcasted_iota(jnp.int32, (tr, tc, 1), 1)
        yi = (ry + iy * tr).astype(jnp.float32)
        xi = (rx + ix * tc).astype(jnp.float32)
        yp = (2.0 * yi + 1.0 - is_) / is_
        xp = (2.0 * xi + 1.0 - is_) / is_

        def row(j):
            return f[j][None, None, :]          # [1, 1, _CHUNK]

        x0, y0, x1, y1, x2, y2 = (row(j) for j in range(6))
        z0, z1, z2 = row(6), row(7), row(8)

        # inside tests (rasterize.py:310-312, operand order preserved)
        outside = (
            ((yp - y0) * (x1 - x0) < (xp - x0) * (y1 - y0)) |
            ((yp - y1) * (x2 - x1) < (xp - x1) * (y2 - y1)) |
            ((yp - y2) * (x0 - x2) < (xp - x2) * (y0 - y2)))

        # barycentric weights at integer pixel coords (rasterize.py:317-327)
        w0 = jnp.clip(row(9) * xi + row(10) * yi + row(11), 0.0, 1.0)
        w1 = jnp.clip(row(12) * xi + row(13) * yi + row(14), 0.0, 1.0)
        w2 = jnp.clip(row(15) * xi + row(16) * yi + row(17), 0.0, 1.0)
        wsum = w0 + w1 + w2
        zp = wsum / (w0 / z0 + w1 / z1 + w2 / z2)

        valid = (jnp.logical_not(outside)
                 & (zp > settings.near) & (zp < settings.far)
                 & (ids[None, None, :] >= 0))
        zbuf = jnp.where(valid, zp, jnp.inf)

        cmin = jnp.min(zbuf, axis=-1)
        karg = jnp.argmin(zbuf, axis=-1)
        # winner's global face id via one-hot reduce
        lane = jax.lax.broadcasted_iota(jnp.int32, (tr, tc, _CHUNK), 2)
        onehot = lane == karg[..., None]
        win = jnp.sum(jnp.where(onehot, ids[None, None, :], 0), axis=-1)

        # merge with the running tile state (strict < keeps the earlier
        # chunk's — i.e. lower face id's — win on ties, like the
        # reference's sequential z test, rasterize.py:334)
        prev_d = depth_ref[0]
        prev_i = idx_ref[0]
        better = cmin < prev_d
        depth_ref[0] = jnp.where(better, cmin, prev_d)
        idx_ref[0] = jnp.where(better, win, prev_i)

    @pl.when(k == nk - 1)
    def _finalize():
        d = depth_ref[0]
        covered = jnp.isfinite(d)
        depth_ref[0] = jnp.where(covered, d, settings.far)


def forward_face_index_map(settings, faces, interpret=False):
    """Tile-binned Pallas forward -> (face_index_map int32, depth f32)."""
    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    tr, tc = _tile_dims(settings)
    ty, tx = is_ // tr, is_ // tc

    fdata, ids, counts = _bin_faces(settings, faces)
    k_chunks = fdata.shape[3]

    kernel = functools.partial(_tile_kernel, settings, tr, tc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bs, ty, tx, k_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1, _NFEAT, _CHUNK),
                         lambda b, i, j, k, counts: (b, i, j, k, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1, 1, _CHUNK),
                         lambda b, i, j, k, counts: (b, i, j, k, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tr, tc), lambda b, i, j, k, counts: (b, i, j)),
            pl.BlockSpec((1, tr, tc), lambda b, i, j, k, counts: (b, i, j)),
        ],
    )
    depth, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bs, is_, is_), jnp.float32),
            jax.ShapeDtypeStruct((bs, is_, is_), jnp.int32),
        ],
        interpret=interpret,
    )(counts, fdata, ids)
    return idx, depth


def binning_overflow(settings, faces):
    """Max (over tiles) number of front faces binned per tile, to validate
    ``faces_per_tile_cap`` before trusting the pallas backend on a scene."""
    return _overlap_mask(settings, faces).sum(axis=1).max()
