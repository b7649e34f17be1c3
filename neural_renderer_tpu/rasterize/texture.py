"""Per-face texture-cube sampling (K4) and its exact gradient (K6).

The reference samples each covered pixel's color by perspective-correcting
its barycentric weights into the face's ``ts^3`` texture cube and blending
the 8 surrounding corners trilinearly (``rasterize.py:361-438``), caching the
8 (index, weight) pairs for the backward scatter (``rasterize.py:750-792``,
atomicAdd).  On TPU we *recompute* the corners in the backward from the saved
maps (cheap, saves 16 floats/pixel of residual bandwidth) and replace the
atomic scatter with a deterministic ``segment_sum``.

TPU layout note: everything iterates the 8 corners in a Python loop over
[bs, is, is] arrays — materializing [bs, is, is, 8] would put 8 on the minor
axis and lane-pad it 16x (measured 12GB of padding at 512^2 batch 32).

Deliberate fix vs the reference: K4 reads the winning face's vertex depths
from batch 0 for every batch element (``rasterize.py:389`` indexes
``faces[face_index * 9]`` without the ``bn * nf`` offset — latent bug,
invisible in the reference's tests because they use spatially-uniform
textures).  We index ``faces[bn, face_index]`` correctly.
"""

import jax
import jax.numpy as jnp


def _texture_index_float(settings, face_w, weight_map, depth_map,
                         texture_size):
    """Perspective-corrected texture coords tif [bs,is,is,3]
    (rasterize.py:398-404).  face_w: the winner's gathered vertex rows."""
    ts = texture_size
    z = face_w[..., 2]                  # winner's vertex depths [bs,is,is,3]
    tif = weight_map * (ts - 1) * (depth_map[..., None] / z)
    tif = jnp.maximum(tif, 0.0)
    tif = jnp.minimum(tif, ts - 1 - settings.eps)
    return tif


def _corner(tif, lo, pn, ts):
    """(weight [bs,is,is], flat cube index [bs,is,is]) of corner pn."""
    frac = tif - lo.astype(jnp.float32)
    w = 1.0
    ii = []
    for k in range(3):
        if (pn >> k) % 2 == 0:
            w = w * (1.0 - frac[..., k])
            ii.append(lo[..., k])
        else:
            w = w * frac[..., k]
            ii.append(lo[..., k] + 1)
    isc = ii[0] * ts * ts + ii[1] * ts + ii[2]
    return w, isc


def sample_textures(settings, faces, textures, face_index_map, face_w,
                    weight_map, depth_map):
    """Forward texture sampling (K4): returns rgb_map [bs, is, is, 3].

    Uncovered pixels are 0 (the background composite happens in core).
    For small cubes (ts^3*3 <= 32 floats, i.e. the common ts=2) the winner's
    WHOLE cube is fetched in one row gather and blended elementwise —
    per-pixel gathers are index-bound (~40ns each), so one 24-float row
    costs the same as one corner and replaces 8 gathers.
    """
    bs, nf, ts = textures.shape[0], textures.shape[1], textures.shape[2]
    is_ = settings.image_size
    covered = face_index_map >= 0
    fidx = jnp.clip(face_index_map, 0, nf - 1)

    tif = _texture_index_float(settings, face_w, weight_map, depth_map, ts)
    lo = tif.astype(jnp.int32)          # trunc == floor for tif >= 0

    n_cells = ts * ts * ts
    if n_cells * 3 <= 32:
        # fetch the winner's full cube once: [bs, is, is, ts^3, 3]
        cube = jnp.take_along_axis(
            textures.reshape(bs, nf, n_cells * 3),
            fidx.reshape(bs, -1, 1), axis=1
        ).reshape(bs, is_, is_, n_cells, 3)
        rgb = jnp.zeros((bs, is_, is_, 3), jnp.float32)
        for pn in range(8):
            w, isc = _corner(tif, lo, pn, ts)
            if ts == 2:
                # lo == 0 always (tif < 1), so isc is static per pn
                isc_static = ((pn & 1) * ts * ts + ((pn >> 1) & 1) * ts
                              + ((pn >> 2) & 1))
                texel = cube[..., isc_static, :]
            else:
                texel = jnp.take_along_axis(
                    cube, isc[..., None, None], axis=3)[..., 0, :]
            rgb = rgb + w[..., None] * texel
        return jnp.where(covered[..., None], rgb, 0.0)

    tex_flat = textures.reshape(bs, nf * n_cells, 3)
    rgb = jnp.zeros((bs, is_, is_, 3), jnp.float32)
    for pn in range(8):
        w, isc = _corner(tif, lo, pn, ts)
        gidx = (fidx * n_cells + isc).reshape(bs, -1)
        texel = jnp.take_along_axis(
            tex_flat, gidx[..., None], axis=1).reshape(bs, is_, is_, 3)
        rgb = rgb + w[..., None] * texel
    return jnp.where(covered[..., None], rgb, 0.0)


def texture_channels_ts2(settings, face_index_map, face_w, weight_map,
                         depth_map, grad_rgb_map):
    """K6 per-pixel contributions for ts=2: the winner cube's full 24
    channels (8 cells x rgb) per pixel, channel-leading
    ``[bs, 24, is, is]``, to be segment-reduced by the caller over the
    shared pixel->face map."""
    covered = face_index_map >= 0
    tif = _texture_index_float(settings, face_w, weight_map, depth_map, 2)
    lo = tif.astype(jnp.int32)
    rows = []
    for isc_static in range(8):
        # invert the static pn <-> cell map: pn bits (b0,b1,b2) place the
        # corner at cell b0*4 + b1*2 + b2
        b0, b1, b2 = (isc_static >> 2) & 1, (isc_static >> 1) & 1, \
            isc_static & 1
        pn = b0 | (b1 << 1) | (b2 << 2)
        w, _ = _corner(tif, lo, pn, 2)
        for c in range(3):
            rows.append(jnp.where(covered, w * grad_rgb_map[..., c], 0.0))
    return jnp.stack(rows, axis=1)                        # [bs,24,is,is]


# texture_channels_cells materializes [bs, is, is, ts^3 * 3] rows; cap the
# bytes so huge-batch ts=4 runs keep the lean 8-pass scatter instead of
# risking HBM pressure (bs=4 at 512^2 ts=4 is ~0.8 GB; bs=32 would be 6.4 GB)
_CELL_ROWS_MAX_BYTES = 4 * 1024 ** 3


def cell_channels_fit(settings, bs, ts):
    """Whether the cell-resolved K6 rows for this (bs, is, ts) fit the
    materialization budget (3 <= ts <= 4 only)."""
    if not 3 <= ts <= 4:
        return False
    rows_bytes = bs * settings.image_size ** 2 * (ts ** 3) * 3 * 4
    return rows_bytes <= _CELL_ROWS_MAX_BYTES


def texture_channels_cells(settings, face_index_map, face_w, weight_map,
                           depth_map, grad_rgb_map, ts):
    """K6 per-pixel contributions for 3 <= ts <= 4: cell-resolved rows
    ``[bs, ts^3 * 3, is, is]`` whose channel ``isc*3 + c`` holds the
    pixel's trilinear weight for cube cell ``isc`` times ``grad_rgb_c``.

    The 8-corner sum factorizes per axis: corner weights are products of
    per-axis (1-frac | frac) factors at (lo | lo+1), so the cell weight is
    ``A0[c0] * A1[c1] * A2[c2]`` with ``A_k`` a ts-vector that is nonzero
    only at lo_k and lo_k+1.  A pixel's 8 corners are 8 distinct cells, so
    each nonzero channel equals the matching ``_corner`` weight bit-exactly
    (same multiply order); all other cells are exactly 0.

    Feeding these rows through the shared pixel->face segment reduction
    replaces the ts>=3 backward's 8 separate all-pixel segment_sums
    (~20 ns/index each on TPU) with the one reduction the K5/K7 channels
    already pay — the per-(face, cell) sums differ from the 8-pass path
    only in f32 summation order."""
    covered = face_index_map >= 0
    tif = _texture_index_float(settings, face_w, weight_map, depth_map, ts)
    lo = tif.astype(jnp.int32)          # trunc == floor for tif >= 0
    frac = tif - lo.astype(jnp.float32)

    def axis_vec(k):
        lk, fk = lo[..., k], frac[..., k]
        return [jnp.where(lk == j, 1.0 - fk, 0.0)
                + jnp.where(lk + 1 == j, fk, 0.0) for j in range(ts)]

    a0, a1, a2 = axis_vec(0), axis_vec(1), axis_vec(2)
    # materialization points: without them XLA re-derives each of the
    # ts^3*3 output channels from the tif producer chain, re-reading every
    # input plane per channel
    p01 = [jax.lax.optimization_barrier(x0 * x1) for x0 in a0 for x1 in a1]
    a2 = [jax.lax.optimization_barrier(x) for x in a2]
    gmask = [jax.lax.optimization_barrier(
        jnp.where(covered, grad_rgb_map[..., c], 0.0)) for c in range(3)]

    chans = []
    for i01 in range(ts * ts):
        for c2 in range(ts):
            w_cell = p01[i01] * a2[c2]
            for c in range(3):
                chans.append(w_cell * gmask[c])
    return jnp.stack(chans, axis=1)        # [bs, ts^3 * 3, is, is]


def texture_cell_factors(settings, face_index_map, face_w, weight_map,
                         depth_map, grad_rgb_map, ts):
    """K6 per-pixel FACTOR channels ``[bs, ts^2 + ts + 3, is, is]``:
    the ts^2 paired axis-01 hat products, the ts axis-2 hats, and the
    covered-masked grad_rgb channels.

    The cell-resolved K6 rows (``texture_channels_cells``) factor as
    ``rows[(i01*ts + c2)*3 + c] = p01[i01] * a2[c2] * gmask[c]`` — the
    same multiply order, so an expansion from these factors is bit-exact
    per channel.  The CSR partial kernel performs that expansion on
    32-pixel blocks in VMEM (``backward_pallas.csr_partial_channels``
    with ``expand``), so the fused backward stack carries ts^2 + ts + 3
    channels instead of ts^3 * 3 — at ts=4 that is 23 vs 192 channels of
    HBM traffic (the stack write + kernel read were the measured ts=4
    gap), and the 4 GB cell-row materialization budget stops constraining
    the fast path entirely.

    ts=2 factors reproduce ``texture_channels_ts2`` exactly: ``_corner``
    accumulates w = f0*f1*f2 left-associatively = (f0*f1)*f2.

    EVERY factor channel is zeroed at uncovered pixels: tif there is
    0 * (far / z=0) = NaN, and NaN reaching the CSR kernel's one-hot MXU
    dot poisons whole partial columns (0 * NaN = NaN on the MXU — the
    same hazard _feature_table documents for degenerate faces).  Masking
    only the grad channels is NOT enough."""
    covered = face_index_map >= 0
    tif = _texture_index_float(settings, face_w, weight_map, depth_map, ts)
    lo = tif.astype(jnp.int32)          # trunc == floor for tif >= 0
    frac = tif - lo.astype(jnp.float32)

    def axis_vec(k):
        lk, fk = lo[..., k], frac[..., k]
        return [jnp.where(lk == j, 1.0 - fk, 0.0)
                + jnp.where(lk + 1 == j, fk, 0.0) for j in range(ts)]

    a0, a1, a2 = axis_vec(0), axis_vec(1), axis_vec(2)
    chans = [jnp.where(covered, x0 * x1, 0.0) for x0 in a0 for x1 in a1]
    chans += [jnp.where(covered, x, 0.0) for x in a2]
    chans += [jnp.where(covered, grad_rgb_map[..., c], 0.0)
              for c in range(3)]
    return jnp.stack(chans, axis=1)        # [bs, ts^2 + ts + 3, is, is]


def grad_textures(settings, faces, face_index_map, face_w, weight_map,
                  depth_map, grad_rgb_map, texture_shape):
    """Backward texture gradient (K6, rasterize.py:750-792).

    ``grad_texture[b, f, isc] += w_pn * grad_rgb[pixel]`` for the 8 corners
    of every covered pixel — a deterministic segment_sum replacing atomicAdd.
    For ts=2 the 8 corners are the whole cube with static cell indices, so
    the entire gradient is ONE segment reduction of 24-wide rows per face
    (scatter cost on TPU is per-index, not per-byte); production fuses that
    reduction with K5/K7 in ``core._bwd`` via ``texture_channels_ts2``.
    """
    bs, nf, ts = texture_shape[0], texture_shape[1], texture_shape[2]
    covered = face_index_map >= 0
    fidx = jnp.clip(face_index_map, 0, nf - 1)
    n_cells = ts * ts * ts

    tif = _texture_index_float(settings, face_w, weight_map, depth_map, ts)
    lo = tif.astype(jnp.int32)

    seg_face = jnp.where(
        covered,
        fidx + (jnp.arange(bs, dtype=jnp.int32) * nf)[:, None, None],
        bs * nf)

    if ts == 2:
        rows = texture_channels_ts2(settings, face_index_map, face_w,
                                    weight_map, depth_map, grad_rgb_map)
        rows = jax.lax.optimization_barrier(rows)
        flat = jax.ops.segment_sum(
            rows.transpose(0, 2, 3, 1).reshape(-1, n_cells * 3),
            seg_face.reshape(-1), num_segments=bs * nf + 1)[:-1]
        return flat.reshape(texture_shape)

    if cell_channels_fit(settings, face_index_map.shape[0], ts):
        # one pixel->face reduction of cell-resolved rows instead of 8
        # all-pixel segment_sums (scatter cost is per-index on TPU)
        rows = texture_channels_cells(settings, face_index_map, face_w,
                                      weight_map, depth_map, grad_rgb_map,
                                      ts)
        rows = jax.lax.optimization_barrier(rows)
        flat = jax.ops.segment_sum(
            rows.transpose(0, 2, 3, 1).reshape(-1, n_cells * 3),
            seg_face.reshape(-1), num_segments=bs * nf + 1)[:-1]
        return flat.reshape(texture_shape)

    boffs = (jnp.arange(bs, dtype=jnp.int32) * (nf * n_cells))[
        :, None, None]
    flat = jnp.zeros((bs * nf * n_cells, 3), jnp.float32)
    for pn in range(8):
        w, isc = _corner(tif, lo, pn, ts)
        seg = fidx * n_cells + isc + boffs
        seg = jnp.where(covered, seg, 0)
        contrib = jnp.where(covered[..., None],
                            w[..., None] * grad_rgb_map, 0.0)
        contrib = jax.lax.optimization_barrier(contrib)  # scalar-fusion guard
        flat = flat + jax.ops.segment_sum(
            contrib.reshape(-1, 3), seg.reshape(-1),
            num_segments=bs * nf * n_cells)
    return flat.reshape(texture_shape)
