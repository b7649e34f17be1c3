"""Per-face texture-cube sampling (K4) and its exact gradient (K6).

The reference samples each covered pixel's color by perspective-correcting
its barycentric weights into the face's ``ts^3`` texture cube and blending
the 8 surrounding corners trilinearly (``rasterize.py:361-438``), caching the
8 (index, weight) pairs for the backward scatter (``rasterize.py:750-792``,
atomicAdd).  On TPU we *recompute* the corners in the backward from the saved
maps (cheap, saves 16 floats/pixel of residual bandwidth) and replace the
atomic scatter with a deterministic ``segment_sum``.

Deliberate fix vs the reference: K4 reads the winning face's vertex depths
from batch 0 for every batch element (``rasterize.py:389`` indexes
``faces[face_index * 9]`` without the ``bn * nf`` offset — latent bug,
invisible in the reference's tests because they use spatially-uniform
textures).  We index ``faces[bn, face_index]`` correctly.
"""

import jax
import jax.numpy as jnp


def _sampling_corners(settings, faces, face_index_map, weight_map, depth_map,
                      texture_size):
    """Compute the 8 trilinear corner (flat index, weight) pairs per pixel.

    Returns (indices [bs,is,is,8] int32 into the ts^3 cube,
             weights [bs,is,is,8] f32).  Matches rasterize.py:397-425.
    """
    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    ts = texture_size
    fidx = jnp.clip(face_index_map, 0, nf - 1)

    # winning face's vertex depths z_k  [bs, is, is, 3]
    z = jnp.take_along_axis(
        faces[..., 2].reshape(bs, nf, 3), fidx.reshape(bs, -1, 1), axis=1
    ).reshape(bs, is_, is_, 3)

    # texture_index_float (rasterize.py:398-404)
    tif = weight_map * (ts - 1) * (depth_map[..., None] / z)
    tif = jnp.maximum(tif, 0.0)
    tif = jnp.minimum(tif, ts - 1 - settings.eps)

    lo = tif.astype(jnp.int32)          # trunc == floor for tif >= 0
    frac = tif - lo.astype(jnp.float32)

    idx_list, w_list = [], []
    for pn in range(8):
        w = jnp.ones_like(depth_map)
        ii = []
        for k in range(3):
            if (pn >> k) % 2 == 0:
                w = w * (1.0 - frac[..., k])
                ii.append(lo[..., k])
            else:
                w = w * frac[..., k]
                ii.append(lo[..., k] + 1)
        isc = ii[0] * ts * ts + ii[1] * ts + ii[2]
        idx_list.append(isc)
        w_list.append(w)
    return jnp.stack(idx_list, axis=-1), jnp.stack(w_list, axis=-1)


def sample_textures(settings, faces, textures, face_index_map, weight_map,
                    depth_map):
    """Forward texture sampling (K4): returns rgb_map [bs, is, is, 3].

    Uncovered pixels are 0 (the background composite happens in core).
    """
    bs, nf, ts = textures.shape[0], textures.shape[1], textures.shape[2]
    is_ = settings.image_size
    covered = face_index_map >= 0
    fidx = jnp.clip(face_index_map, 0, nf - 1)

    corner_idx, corner_w = _sampling_corners(
        settings, faces, face_index_map, weight_map, depth_map, ts)

    tex_flat = textures.reshape(bs, nf * ts * ts * ts, 3)
    gidx = (fidx[..., None] * (ts * ts * ts) + corner_idx)      # [bs,is,is,8]
    texel = jnp.take_along_axis(
        tex_flat[:, :, None, :], gidx.reshape(bs, -1)[..., None, None], axis=1
    ).reshape(bs, is_, is_, 8, 3)
    rgb = jnp.sum(corner_w[..., None] * texel, axis=-2)
    return jnp.where(covered[..., None], rgb, 0.0)


def grad_textures(settings, faces, face_index_map, weight_map, depth_map,
                  grad_rgb_map, texture_shape):
    """Backward texture gradient (K6, rasterize.py:750-792).

    ``grad_texture[b, f, isc] += w_pn * grad_rgb[pixel]`` for the 8 corners
    of every covered pixel — a deterministic segment_sum replacing atomicAdd.
    """
    bs, nf, ts = texture_shape[0], texture_shape[1], texture_shape[2]
    covered = face_index_map >= 0
    fidx = jnp.clip(face_index_map, 0, nf - 1)

    corner_idx, corner_w = _sampling_corners(
        settings, faces, face_index_map, weight_map, depth_map, ts)

    # flat segment id over (batch * face * cube-cell); masked pixels -> id 0
    # with zero contribution.
    seg = (fidx[..., None] * (ts * ts * ts) + corner_idx)       # per batch
    seg = seg + (jnp.arange(bs, dtype=jnp.int32)
                 * (nf * ts * ts * ts))[:, None, None, None]
    seg = jnp.where(covered[..., None], seg, 0)
    contrib = jnp.where(covered[..., None, None],
                        corner_w[..., None] * grad_rgb_map[..., None, :], 0.0)

    flat = jax.ops.segment_sum(
        contrib.reshape(-1, 3), seg.reshape(-1),
        num_segments=bs * nf * ts * ts * ts)
    return flat.reshape(texture_shape)
