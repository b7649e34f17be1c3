"""Pure-XLA rasterizer forward: deterministic per-pixel argmin-z.

Implements the reference's "safe" two-pass semantics (K2 face_inv precompute,
reference ``rasterize.py:238-277``; K3 per-pixel all-faces z-buffer loop,
``rasterize.py:279-359``) as a streaming reduction over face chunks:

    for each face chunk:                       # lax.scan
        for every (pixel, face) pair:          # fused VPU elementwise
            inside tests / barycentric weights / perspective depth
        running (min depth, first argmin face) # flash-style carry

This runs on CPU/GPU/TPU unchanged and is the correctness oracle for the
Pallas kernel.  Tie-breaking matches the reference exactly: the *first* face
(lowest index) with the strictly smallest depth wins, because the reference's
sequential loop only replaces on ``zp < depth_min`` (rasterize.py:334).

The per-(pixel, face) work is O(bs * is^2 * nf) like the reference K3; the
production path (forward_pallas) cuts the face axis down via screen-tile
binning.
"""

import functools

import jax
import jax.numpy as jnp

from neural_renderer_tpu.rasterize import geometry


def _chunk_body(settings, xg, yg, xi, yi, carry, chunk):
    """One face-chunk update of the (depth, face index) carry.

    carry: (depth [bs, is, is], idx [bs, is, is] int32)
    chunk: (faces_c [bs, C, 3, 3], base int32 scalar, valid_c [C] bool)
    """
    depth, idx = carry
    faces_c, base, valid_c = chunk
    is_ = settings.image_size

    # ---- per-face precompute (K2, rasterize.py:238-277) ----
    front = geometry.is_frontface(faces_c)                      # [bs, C]
    px = geometry.to_pixel_coords(faces_c[..., 0], is_)         # [bs, C, 3]
    py = geometry.to_pixel_coords(faces_c[..., 1], is_)
    finv = geometry.face_inv_matrix(px, py)                     # [bs, C, 3, 3]
    z = faces_c[..., 2]                                         # [bs, C, 3]

    # ---- per-(pixel, face) tests (K3, rasterize.py:279-359) ----
    # Broadcast layout: [bs, is(y), is(x), C]
    x0 = faces_c[:, None, None, :, 0, 0]
    y0 = faces_c[:, None, None, :, 0, 1]
    x1 = faces_c[:, None, None, :, 1, 0]
    y1 = faces_c[:, None, None, :, 1, 1]
    x2 = faces_c[:, None, None, :, 2, 0]
    y2 = faces_c[:, None, None, :, 2, 1]
    xp = xg[None, None, :, None]
    yp = yg[None, :, None, None]
    outside = (
        ((yp - y0) * (x1 - x0) < (xp - x0) * (y1 - y0)) |
        ((yp - y1) * (x2 - x1) < (xp - x1) * (y2 - y1)) |
        ((yp - y2) * (x0 - x2) < (xp - x2) * (y0 - y2))
    )

    # Barycentric weights at integer pixel coords (rasterize.py:317-319).
    xi_b = xi[None, None, :, None]
    yi_b = yi[None, :, None, None]

    def wk(k):
        return (finv[:, None, None, :, k, 0] * xi_b
                + finv[:, None, None, :, k, 1] * yi_b
                + finv[:, None, None, :, k, 2])

    w0 = jnp.clip(wk(0), 0.0, 1.0)
    w1 = jnp.clip(wk(1), 0.0, 1.0)
    w2 = jnp.clip(wk(2), 0.0, 1.0)
    wsum = w0 + w1 + w2
    # zp = 1 / sum(w_k / z_k) with renormalized weights (rasterize.py:327-330)
    # evaluated as w_k * (1/z_k): the reciprocals are PER FACE, so the
    # [pixels x faces] grid pays one divide instead of four (f32 divides
    # are multi-pass on the VPU).  Kept in lockstep with the Pallas
    # kernels' z test — the bit-exact pallas-vs-oracle contract holds.
    iz = 1.0 / z
    zp = wsum / (w0 * iz[:, None, None, :, 0]
                 + w1 * iz[:, None, None, :, 1]
                 + w2 * iz[:, None, None, :, 2])

    valid = (front[:, None, None, :]
             & jnp.logical_not(outside)
             & (zp > settings.near) & (zp < settings.far)
             & valid_c[None, None, None, :])
    zbuf = jnp.where(valid, zp, jnp.inf)

    cmin = jnp.min(zbuf, axis=-1)
    carg = jnp.argmin(zbuf, axis=-1).astype(jnp.int32)
    better = cmin < depth
    depth = jnp.where(better, cmin, depth)
    idx = jnp.where(better, base + carg, idx)
    return (depth, idx), None


def forward_face_index_map(settings, faces):
    """faces ``[bs, nf, 3, 3]`` NDC -> (face_index_map int32, depth f32).

    face_index_map is -1 for uncovered pixels; depth is ``far`` there
    (reference buffer init, rasterize.py:478-480).
    """
    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    chunk = min(settings.face_chunk, nf)
    n_chunks = -(-nf // chunk)
    pad = n_chunks * chunk - nf

    faces_p = jnp.pad(faces, ((0, 0), (0, pad), (0, 0), (0, 0)))
    faces_p = faces_p.reshape(bs, n_chunks, chunk, 3, 3).transpose(1, 0, 2, 3, 4)
    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
    valid = (jnp.arange(n_chunks * chunk, dtype=jnp.int32)
             < nf).reshape(n_chunks, chunk)

    xg = geometry.pixel_centers(is_)
    yg = geometry.pixel_centers(is_)
    xi = jnp.arange(is_, dtype=jnp.float32)
    yi = jnp.arange(is_, dtype=jnp.float32)

    # Derive the carry init from `faces` so its varying-axis type matches the
    # scan body output under shard_map (a plain constant would be unvarying
    # and trip the carry type check).  The where() is always 0 by value.
    vary0 = jnp.where(jnp.isnan(faces[:, 0, 0, 0]), 0.0, 0.0)[:, None, None]
    depth0 = jnp.full((bs, is_, is_), settings.far, jnp.float32) + vary0
    idx0 = jnp.full((bs, is_, is_), -1, jnp.int32) + vary0.astype(jnp.int32)

    body = functools.partial(_chunk_body, settings, xg, yg, xi, yi)
    (depth, idx), _ = jax.lax.scan(body, (depth0, idx0),
                                   (faces_p, bases, valid))
    return idx, depth


def gather_face_rows(faces, face_index_map):
    """ONE per-pixel row gather of the winner's 9 vertex coords.

    Per-pixel random gathers cost ~40ns/index on TPU regardless of row
    width, so every consumer (winner attributes, texture z, K5/K7 backward)
    shares this single gather via the residuals instead of re-gathering.
    Returns face_w [bs, is, is, 3, 3] (garbage rows where uncovered — every
    consumer masks on face_index_map >= 0).
    """
    bs, nf = faces.shape[:2]
    is_ = face_index_map.shape[1]
    fidx = jnp.clip(face_index_map, 0, nf - 1)
    return jnp.take_along_axis(
        faces.reshape(bs, nf, 9), fidx.reshape(bs, -1, 1), axis=1
    ).reshape(bs, is_, is_, 3, 3)


def winner_attributes(settings, faces, face_index_map, face_w,
                      need_face_inv=True):
    """Recompute per-pixel weights / depth / face_inv from the winning face.

    Instead of carrying weight_map / face_inv_map through the z-reduction
    (the reference writes them under its pixel lock, rasterize.py:343-348),
    we recompute from the winner's gathered vertices (face_w from
    gather_face_rows) — bit-identical math, far less carried state.
    Returns (weight_map [bs,is,is,3], depth [bs,is,is],
    face_inv_map [bs,is,is,3,3]); zeros / ``far`` where uncovered.
    """
    is_ = settings.image_size
    covered = face_index_map >= 0

    px = geometry.to_pixel_coords(face_w[..., 0], is_)
    py = geometry.to_pixel_coords(face_w[..., 1], is_)
    finv = geometry.face_inv_matrix(px, py)                 # [bs,is,is,3,3]
    xi = jnp.arange(is_, dtype=jnp.float32)[None, None, :, None]
    yi = jnp.arange(is_, dtype=jnp.float32)[None, :, None, None]
    w = finv[..., 0] * xi + finv[..., 1] * yi + finv[..., 2]
    w = geometry.clamp_renormalize_weights(w)
    zp = geometry.perspective_correct_depth(w, face_w[..., 2])

    weight_map = jnp.where(covered[..., None], w, 0.0)
    depth_map = jnp.where(covered, zp, settings.far)
    if need_face_inv:
        face_inv_map = jnp.where(covered[..., None, None], finv, 0.0)
    else:
        face_inv_map = jnp.zeros((1,), jnp.float32)
    return weight_map, depth_map, face_inv_map
