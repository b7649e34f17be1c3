"""Pallas TPU forward rasterizer: screen-patch binning + per-patch argmin-z.

The reference K3 kernel is O(pixels x ALL faces) per image
(``rasterize.py:300-340``) — each CUDA thread loops every face, relying on
early-out edge tests.  TPUs want the opposite shape: big regular vector work
with no data-dependent branches.  This kernel restores the lost factor
algorithmically:

  1. **Bin (XLA):** project each face, cull backfaces, and mark the square
     screen patches its pixel bbox overlaps — a dense range-compare
     membership mask [bs, patches, faces] plus a prefix sum over the face
     axis.  That's the ENTIRE device-side preprocessing: no sort, no top_k,
     no scatter, no gather (all of which serialize badly on TPU — measured
     300+ms for a gather-based variant of this pass).

  2. **Rasterize (Pallas):** grid = (batch, patch_y, patch_x, face_chunk).
     The membership prefix row and a transposed face-feature table live in
     VMEM.  For chunk k the kernel builds a one-hot selector
     ``onehot[f, j] = (prefix[f] == k*128 + j + 1) & member[f]`` with pure
     compares and fetches the chunk's 128 faces' features as ONE MXU
     contraction ``featT @ onehot`` (exact for f32: one-hot matmuls have a
     single addend per output).  Inside tests / barycentric weights /
     perspective depth for all (pixel, face) pairs are VPU elementwise math,
     folded into the patch's resident (min depth, first-argmin face id)
     output block — the flash-attention accumulation pattern.  Per-patch
     counts (prefix[-1], scalar-prefetched) skip empty chunks entirely.

Patches are 32x32 *square* pixel regions packed into the native f32 (8, 128)
vector layout (a 1024-pixel patch is one [8, 128] block; plain reshapes
unpack it outside).  Square patches matter: an (8 x 128) image-space band
overlaps ~10x more faces than a 32x32 square of equal area, and per-pixel
work is proportional to faces-per-patch.

Faces ascend within every patch list by construction, so z-test ties resolve
to the lowest face id — identical to the reference's sequential first-wins
rule (rasterize.py:334).  Weights / face_inv / textures are recomputed from
the winner index by the shared XLA post-passes
(forward_xla.winner_attributes), so this kernel carries minimum state.

Capacity limit (check ``binning_overflow`` before trusting a config):
patches overlapped by more than ``faces_per_tile_cap`` front faces lose the
overflow (the pure-XLA backend has no capacity limits).
"""

import functools
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_renderer_tpu.rasterize import checks, geometry


def _warn_overflow(max_count, cap):
    if int(max_count) > int(cap):
        warnings.warn(
            f'pallas rasterizer: a screen patch binned {int(max_count)} '
            f'front faces but faces_per_tile_cap={int(cap)} — overflow '
            'faces are DROPPED and the image/gradients are wrong for '
            'those patches.  Raise faces_per_tile_cap (or pass '
            "backend='xla', which has no capacity limits).")


def _warn_csr_overflow(needed_chunks, data_chunks):
    if int(needed_chunks) > int(data_chunks):
        warnings.warn(
            f'pallas rasterizer: the scene needs {int(needed_chunks)} CSR '
            f'face chunks but grad_csr_rows provides {int(data_chunks)} '
            '(plus the dump chunk) — overflow chunks clamp into the dump '
            'chunk and face/texture gradients silently lose those faces\' '
            'contributions.  Raise grad_csr_rows (validate with '
            'forward_pallas.csr_rows_needed) or set it to None (global '
            'segment reduction, no capacity).')

def _warn_chunk_budget(total, budget):
    if int(total) > int(budget):
        warnings.warn(
            f'pallas rasterizer: the scene needs {int(total)} forward '
            f'schedule chunks but forward_chunk_budget={int(budget)} — '
            'patches past the budget lose their later face chunks and the '
            'image/gradients are wrong there.  Raise forward_chunk_budget '
            '(validate with forward_pallas.chunks_needed) or leave it None.')


# transposed face-feature table layout (lane axis):
# 0:x0 1:y0 2:x1 3:y1 4:x2 5:y2 (NDC xy), 6:z0 7:z1 8:z2,
# 9..17: face_inv rows, 18: face id + 1 (0 = empty),
# 19.. : optional texel values, CHANNEL-major (lane 19 + c*ts^3 + cell) —
#        the finalize shades rgb channel c from ONE contiguous [ts^3, 128]
#        sublane block instead of ts^3*3 strided single-row extractions
_NFEAT = 19
_CHUNK = 128          # faces per streamed chunk (f32 lane width)
_VMEM_TABLE_LIMIT = 8 * 1024 * 1024


def _out_struct(shape, dtype, like):
    """ShapeDtypeStruct carrying the input's varying-manual-axes so the
    kernels compose with jax.shard_map (check_vma) — outputs vary over
    exactly the mesh axes the operands do (per-device rasterization has no
    cross-device semantics)."""
    vma = getattr(jax.typeof(like), 'vma', None)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _patch_dim(settings):
    return min(32, settings.image_size)


def slice_size(nfeat=_NFEAT):
    """Max faces per kernel pass: the transposed feature table must stay
    VMEM-resident ([nf_pad sublanes x lane-padded nfeat] f32, 8 MB budget).
    Larger meshes run as multiple passes over contiguous face-index slices
    whose z-buffers merge exactly (see forward_face_index_map) — the
    counterpart of the reference K3's unbounded per-pixel face loop
    (rasterize.py:300)."""
    lanes = -(-nfeat // _CHUNK) * _CHUNK
    return (_VMEM_TABLE_LIMIT // (lanes * 4) // _CHUNK) * _CHUNK


def supported(settings, faces):
    del faces  # any face count: > slice_size() runs multi-pass
    if jax.default_backend() != 'tpu':
        return False
    p = _patch_dim(settings)
    if settings.image_size % p or (p * p) % _CHUNK:
        return False
    return True


def csr_supported(settings):
    """Whether the CSR grad-reduction artifacts can be emitted/consumed.

    ``backward_pallas._csr_kernel`` slices the fused channel stack in
    ``[.., 32, xg*32]`` blocks and brings the target patch to lane 0 with a
    dynamic lane rotation — Mosaic only supports that on 128-lane-multiple
    vectors, so the image must be wide enough for xg = 4 side-by-side
    32-px patches (observed at 64^2: 'unsupported unaligned shape'
    tpu.dynamic_rotate on a 64-lane vector).  Below this the global
    segment reduction is cheap anyway (<= 16k pixel rows per element)."""
    is_ = settings.image_size
    return is_ % 32 == 0 and is_ >= 4 * 32


def pack_pixel_layout(settings, img):
    """Image-layout ``[bs, is, is]`` -> the kernels' packed patch layout
    ``[bs, t, t, rows, 128]`` (slot (r, l) of patch (ty, tx) holds pixel
    y = ty*p + (l // p) * rows + r, x = tx*p + l % p — ``_pixel_coords``).
    Pure reshape/transpose; used to align per-pixel maps with ``csr_pos``
    (e.g. the multi-pass winner-slice mask)."""
    p = _patch_dim(settings)
    rows = (p * p) // _CHUNK
    groups = _CHUNK // p
    bs, is_, _ = img.shape
    t = is_ // p
    x = img.reshape(bs, t, groups, rows, t, p)
    return x.transpose(0, 1, 4, 3, 2, 5).reshape(bs, t, t, rows, _CHUNK)


def multipass_fits(settings, faces, s=None, caps=None, csr_rows=None):
    """Runtime fit of the multi-pass binning against per-slice capacities.

    With ``csr_rows``: appends one more bool — every slice's CSR chunk
    total (clamped at the LAST capacity in ``caps``, or the default cap)
    fits a per-slice ``grad_csr_rows`` budget of ``csr_rows`` — the
    multi-pass analogue of the single-pass auto path's ``csr_ok``.

    With ``caps=None``: one bool — every face slice's binned patch counts
    fit the slice's own ``chunk_capacity`` (the multi-pass analogue of the
    single-pass auto guard in core).  With ``caps`` (a list of static
    capacities): one bool per cap from a single binning sweep — the auto
    path chains these in a ``lax.cond`` ladder so a scene that overflows
    the lean default capacity escalates to a deeper-grid pass instead of
    falling all the way back to the O(pixels x faces) XLA oracle (the
    163k-face bench scene overflowed the auto cap by 4% and silently paid
    the 2.2 s oracle — VERDICT r3).  ``s`` must match the render's slice
    size (nfeat-dependent when texels ride the feature table)."""
    import dataclasses
    nf = faces.shape[1]
    bs = faces.shape[0]
    s = slice_size() if s is None else s
    fits_default = jnp.bool_(True)
    fits_caps = [jnp.bool_(True) for _ in (caps or ())]
    csr_ok = jnp.bool_(True)
    for lo in range(0, nf, s):
        sl = faces[:, lo:lo + s]
        _, counts = _membership_prefix(settings, sl)
        cap_d = chunk_capacity(settings, sl.shape[1])
        fits_default = fits_default & (
            (counts.max() <= cap_d)
            & schedule_fits(settings, counts, cap_d, bs, sl.shape[1]))
        cap_csr = cap_d
        for idx, cap in enumerate(caps or ()):
            s_r = dataclasses.replace(settings, faces_per_tile_cap=cap)
            cap_r = chunk_capacity(s_r, sl.shape[1])
            cap_csr = cap_r
            fits_caps[idx] = fits_caps[idx] & (
                (counts.max() <= cap_r)
                & schedule_fits(s_r, counts, cap_r, bs, sl.shape[1]))
        if csr_rows is not None:
            clamped = jnp.minimum(counts, cap_csr)
            needed = (jnp.sum((clamped + _CHUNK - 1) // _CHUNK) + 1) * _CHUNK
            csr_ok = csr_ok & (needed <= csr_rows)
    out = fits_default if caps is None else [fits_default] + fits_caps
    if csr_rows is None:
        return out
    return (out if isinstance(out, list) else [out]) + [csr_ok]


def _face_tile_ranges(settings, faces):
    """Per-face patch rectangle [ty0, ty1] x [tx0, tx1] (int32) + front mask.

    Conservative pixel bbox (pixel centers sit at integer coords, +-1 pad).
    """
    is_ = settings.image_size
    p = _patch_dim(settings)
    nt = is_ // p

    front = geometry.is_frontface(faces)
    px = geometry.to_pixel_coords(faces[..., 0], is_)
    py = geometry.to_pixel_coords(faces[..., 1], is_)
    xmin = jnp.floor(px.min(-1)) - 1.0
    xmax = jnp.ceil(px.max(-1)) + 1.0
    ymin = jnp.floor(py.min(-1)) - 1.0
    ymax = jnp.ceil(py.max(-1)) + 1.0

    def rng(lo, hi):
        t0 = jnp.clip(jnp.floor(lo / p), 0, nt - 1).astype(jnp.int32)
        t1 = jnp.clip(jnp.floor(hi / p), 0, nt - 1).astype(jnp.int32)
        empty = (hi < 0) | (lo > is_ - 1)
        t1 = jnp.where(empty, t0 - 1, t1)
        return t0, t1

    ty0, ty1 = rng(ymin, ymax)
    tx0, tx1 = rng(xmin, xmax)
    return front, ty0, ty1, tx0, tx1


def _membership_prefix(settings, faces):
    """Dense membership prefix sums [bs, T, T, nf_pad] + counts [bs*T*T]."""
    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    p = _patch_dim(settings)
    t = is_ // p
    nt = t * t
    nf_pad = -(-nf // _CHUNK) * _CHUNK

    front, ty0, ty1, tx0, tx1 = _face_tile_ranges(settings, faces)
    t_y = (jnp.arange(nt, dtype=jnp.int32) // t)[None, :, None]
    t_x = (jnp.arange(nt, dtype=jnp.int32) % t)[None, :, None]
    mask = (front[:, None, :]
            & (ty0[:, None, :] <= t_y) & (t_y <= ty1[:, None, :])
            & (tx0[:, None, :] <= t_x) & (t_x <= tx1[:, None, :]))
    prefix = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
    counts = prefix[..., -1]                                 # [bs, nt]
    # "position or zero": 1-based list position where the face is a member,
    # 0 elsewhere — the kernel matches it directly against chunk slots with
    # no separate membership test (slot values start at 1).
    pz = jnp.where(mask, prefix, 0)
    pz = jnp.pad(pz, ((0, 0), (0, 0), (0, nf_pad - nf)))
    return pz.reshape(bs, t, t, 1, nf_pad), counts.reshape(-1)


def _feature_table(settings, faces, textures=None):
    """Transposed per-face features [bs, nfeat, nf_pad] (see layout above).

    With ``textures`` (``[bs, nf, ts, ts, ts, 3]``), the ts^3*3 texel
    values ride along as extra feature lanes (free for ts=2: the 19 base
    features already lane-pad to 128 in VMEM; ts=4 pads to 256 lanes and
    halves the per-pass face budget), letting the kernel emit the final
    shaded rgb without any per-pixel texture gather."""
    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    nf_pad = -(-nf // _CHUNK) * _CHUNK
    finv = geometry.face_inv_matrix(
        geometry.to_pixel_coords(faces[..., 0], is_),
        geometry.to_pixel_coords(faces[..., 1], is_))
    # Degenerate (zero-area) faces have inf/nan face_inv.  The dense XLA
    # path contains that per face (nan weights -> z test rejects), but the
    # one-hot MXU fetch sums nan * 0 over ALL faces — one degenerate face
    # would poison every slot of every patch it touches.  Zeroed face_inv
    # gives w = (0,0,0) -> zp = 0/0 = nan -> same rejection, per face.
    finv = jnp.where(jnp.isfinite(finv), finv, 0.0)
    fid1 = (jnp.arange(nf, dtype=jnp.float32) + 1.0)[None, :, None]
    parts = [
        faces[..., 0, 0:2], faces[..., 1, 0:2], faces[..., 2, 0:2],
        faces[..., :, 2],                                    # z0 z1 z2
        finv.reshape(bs, nf, 9),
        jnp.broadcast_to(fid1, (bs, nf, 1)),
    ]
    if textures is not None:
        # channel-major texel lanes (see layout comment above)
        parts.append(textures.transpose(0, 1, 5, 2, 3, 4).reshape(
            bs, nf, -1))
    feat = jnp.concatenate(parts, axis=-1)       # [bs, nf, 19(+ts^3*3)]
    # faces on sublanes, features on lanes: the kernel contracts the face
    # axis directly (dot_general ((0,), (1,))), no transposes anywhere.
    return jnp.pad(feat, ((0, 0), (0, nf_pad - nf), (0, 0)))


def _flush_strip(store, stage_ref, nplanes, p, rows, nx):
    """Assemble a staged patch-row strip into image-layout planes and emit
    them via ``store(plane, img[p, is])``.

    Each tx step stages its patch\'s packed [nplanes*rows, _CHUNK] data at
    ``stage_ref[tx]`` (dynamic indexing of a leading non-tiled dim — the
    one dynamic access Mosaic allows; sub-128-lane windowed stores are
    not).  At the strip\'s last patch this reassembles every plane with
    static value slices: the packed pixel mapping (``_pixel_coords``)
    makes lane group g of patch w the [rows, p] image band at
    y in [g*rows, (g+1)*rows), x in [w*p, (w+1)*p)."""
    groups = _CHUNK // p

    # rotate whole staged slabs (one roll per (patch, lane group) instead
    # of per plane): Mosaic refuses concatenates whose operands carry
    # mismatched physical lane offsets, and a plain value slice keeps its
    # source offset — offset-0 [*, p] pieces come from slicing a rotated
    # full-width slab
    bands = {}
    for g in range(groups):
        parts = []
        for w in range(nx):
            slab = stage_ref[w][...]                         # [P, 128]
            if g:
                slab = pltpu.roll(slab, _CHUNK - g * p, 1)
            parts.append(slab[:, :p])
        bands[g] = (parts[0] if nx == 1
                    else jnp.concatenate(parts, axis=1))     # [P, nx*p]

    for j in range(nplanes):
        rows_g = [bands[g][j * rows:(j + 1) * rows, :] for g in range(groups)]
        store(j, rows_g[0] if groups == 1
              else jnp.concatenate(rows_g, axis=0))


def _pixel_coords(p, rows, iy, ix, shape, sub_dim, lane_dim, sub0=None):
    """Per-slot global pixel coords (float) for the packed patch layout.

    Packed slot (sub, lane) holds patch pixel y = (lane // p) * rows + sub,
    x = lane % p — chosen so output blocks store to image layout as static
    [rows, p] slices (``_store_patch``)."""
    if sub0 is None:
        sub = jax.lax.broadcasted_iota(jnp.int32, shape, sub_dim)
    else:
        sub = jnp.full(shape, sub0, jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, lane_dim)
    yi = ((lane // p) * rows + sub + iy * p).astype(jnp.float32)
    xi = (lane % p + ix * p).astype(jnp.float32)
    return yi, xi


def _tile_kernel(settings, p, rows, nf_pad, counts_ref, featT_ref,
                 prefix_ref, depth_ref, idx_ref, dstate_ref, istate_ref,
                 fstage_ref, istage_ref):
    is_ = settings.image_size
    b = pl.program_id(0)
    iy = pl.program_id(1)
    ix = pl.program_id(2)
    k = pl.program_id(3)
    nk = pl.num_programs(3)
    ny = pl.num_programs(1)
    nx = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        dstate_ref[...] = jnp.full((rows, _CHUNK), jnp.inf, jnp.float32)
        istate_ref[...] = jnp.full((rows, _CHUNK), -1, jnp.int32)

    count = counts_ref[(b * ny + iy) * nx + ix]

    @pl.when(k * _CHUNK < count)
    def _compute():
        pz = prefix_ref[0, 0, 0]         # [1, nf_pad] int32

        # one-hot chunk selector: row s holds the face whose (1-based) list
        # position is k*128 + s + 1 (pz is 0 for non-members: never matches)
        slot = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, nf_pad), 0)
        onehot = (pz == (k * _CHUNK + 1 + slot)).astype(jnp.float32)

        # fetch the chunk's face features with one exact MXU contraction:
        # contract the face axis of feat [nf_pad, 24] against onehot
        # [slots, nf_pad] -> [24 features, 128 slots]
        f = jax.lax.dot_general(
            featT_ref[0], onehot, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [24, _CHUNK]

        yi, xi = _pixel_coords(p, rows, iy, ix, (rows, _CHUNK, 1), 0, 1)
        yp = (2.0 * yi + 1.0 - is_) / is_
        xp = (2.0 * xi + 1.0 - is_) / is_

        def row(j):
            return f[j][None, None, :]          # [1, 1, _CHUNK]

        x0, y0, x1, y1, x2, y2 = (row(j) for j in range(6))
        z0, z1, z2 = row(6), row(7), row(8)
        idf = row(18)                           # face id + 1; 0 = empty

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
        # w_k * (1/z_k): the reciprocals are per FACE ([1, 1, 128]), so
        # the [rows, pixels, faces] z test pays ONE per-element divide
        # instead of four (lockstep with the forward_xla oracle)
        zp = wsum / (w0 * (1.0 / z0) + w1 * (1.0 / z1) + w2 * (1.0 / z2))

        valid = (jnp.logical_not(outside)
                 & (zp > settings.near) & (zp < settings.far)
                 & (idf > 0))
        zbuf = jnp.where(valid, zp, jnp.inf)

        cmin = jnp.min(zbuf, axis=-1)
        # winner id = LOWEST face id among the minima.  NOT jnp.argmin:
        # Mosaic's argmin lowering does not tie-break to the first index,
        # which broke the reference's first-wins rule on coincident faces
        # (duplicated geometry is common in real scans/ShapeNet).
        ids_i = idf.astype(jnp.int32) - 1                    # [1, 1, _CHUNK]
        win = jnp.min(jnp.where(zbuf == cmin[..., None], ids_i,
                                jnp.int32(2 ** 30)), axis=-1)

        # merge with the running patch state (strict < keeps the earlier
        # chunk's — i.e. lower face id's — win on ties, like the
        # reference's sequential z test, rasterize.py:334)
        prev_d = dstate_ref[...]
        prev_i = istate_ref[...]
        better = cmin < prev_d
        dstate_ref[...] = jnp.where(better, cmin, prev_d)
        istate_ref[...] = jnp.where(better, win, prev_i)

    @pl.when(k == nk - 1)
    def _finalize():
        d = dstate_ref[...]
        covered = jnp.isfinite(d)
        fstage_ref[ix] = jnp.where(covered, d, settings.far)
        istage_ref[ix] = istate_ref[...]

    @pl.when((k == nk - 1) & (ix == nx - 1))
    def _flush():
        def store_d(j, img):
            depth_ref[0] = img

        def store_i(j, img):
            idx_ref[0] = img

        _flush_strip(store_d, fstage_ref, 1, p, rows, nx)
        _flush_strip(store_i, istage_ref, 1, p, rows, nx)


def chunk_capacity(settings, nf):
    """Static per-patch face capacity (the auto heuristic or the user cap),
    rounded up to whole 128-face chunks."""
    is_ = settings.image_size
    nt = (is_ // _patch_dim(settings)) ** 2
    if settings.faces_per_tile_cap is None:
        cap = min(nf, max(512, (nf * 16) // nt))             # auto density
    else:
        cap = min(settings.faces_per_tile_cap, nf)
    return -(-cap // _CHUNK) * _CHUNK


def schedule_budget(settings, bs, nf, cap, guarded=False):
    """Static size of the compact (patch, chunk) forward grid.

    The shaded kernel iterates a compact list of (patch, chunk) pairs
    instead of the dense patches x capacity grid — a skipped dense grid
    step still costs ~0.7 us (Mosaic loop + DMA bookkeeping), which was
    ~60% of the forward kernel's time on the teapot bench (most patches
    bin far fewer than the capacity).  Every patch takes at least one
    list entry (its finalize step); non-empty patches take
    ceil(count/128).

    The budget must cover the scene's total or trailing chunks are
    dropped, so it is only allowed to undershoot the provably-sufficient
    dense size (bs * patches * capacity/128) when either the user set
    ``forward_chunk_budget`` explicitly (a capacity knob: validate with
    ``chunks_needed``) or the caller runs under the auto path's
    structural ``lax.cond`` guard (``guarded=True`` — overflow falls back
    to the capacity-free XLA oracle, never silently wrong)."""
    nt = (settings.image_size // _patch_dim(settings)) ** 2
    dense = bs * nt * (cap // _CHUNK)
    if settings.forward_chunk_budget is not None:
        return min(int(settings.forward_chunk_budget), dense)
    if not guarded:
        return dense
    # memberships are ~1-2 patches/face for common meshes; 3x covers
    # fan-out plus per-patch ceil rounding with margin (overflow is
    # guarded, so lean keeps the no-op tail short)
    nf_pad = -(-nf // _CHUNK) * _CHUNK
    return min(bs * nt + (3 * bs * nf_pad) // _CHUNK, dense)


def chunk_schedule(counts_clamped, budget):
    """Compact (patch, chunk) schedule: list entry c -> patch ``pchk[c]``,
    chunk offset ``kofs[c]`` (-1 marks unused tail entries past the
    scene's total — the kernel no-ops those).  counts_clamped must already
    be clamped to the per-patch capacity.  Exact iff ``total <= budget``
    (the caller guards or warns).

    Built with two small scatters + scans instead of a searchsorted:
    scatter cost on TPU is per-index (~patches, not budget x log), and
    cumsum/cummax over the budget-sized lists is elementwise."""
    nch = jnp.maximum((counts_clamped + _CHUNK - 1) // _CHUNK, 1)
    ends = jnp.cumsum(nch)
    total = ends[-1]
    base = (ends - nch).astype(jnp.int32)
    bc = jnp.minimum(base, budget - 1)        # bases are strictly ascending
    ci = jnp.arange(budget, dtype=jnp.int32)
    # pchk[ci] = (# patch bases <= ci) - 1;  base[pchk[ci]] via cummax of
    # the base values scattered at their own positions
    marks = jnp.zeros((budget,), jnp.int32).at[bc].add(
        1, mode='drop')
    pchk = jnp.cumsum(marks) - 1
    bvals = jnp.zeros((budget,), jnp.int32).at[bc].max(base, mode='drop')
    kofs = jnp.where(ci < total, ci - jax.lax.cummax(bvals), -1)
    return pchk.astype(jnp.int32), kofs.astype(jnp.int32), total


def schedule_fits(settings, counts, cap, bs, nf):
    """Runtime bool: the scene's compact-grid chunk total fits the tight
    (guarded) schedule budget — part of the auto path's fallback guard."""
    cc = jnp.minimum(counts, cap)
    nch = jnp.maximum((cc + _CHUNK - 1) // _CHUNK, 1)
    return jnp.sum(nch) <= schedule_budget(settings, bs, nf, cap,
                                           guarded=True)


def chunks_needed(settings, faces):
    """Compact-grid list entries the scene needs — validate an explicit
    ``forward_chunk_budget`` against this (like the other capacity
    knobs).  Multi-pass meshes take the max over slices (the budget
    applies per pass)."""
    nf = faces.shape[1]
    s = slice_size()
    worst = jnp.int32(0)
    for lo in range(0, nf, s):
        sl = faces[:, lo:lo + s]
        _, counts = _membership_prefix(settings, sl)
        cc = jnp.minimum(counts, chunk_capacity(settings, sl.shape[1]))
        nch = jnp.maximum((cc + _CHUNK - 1) // _CHUNK, 1)
        worst = jnp.maximum(worst, jnp.sum(nch))
    return worst


def forward_face_index_map(settings, faces, interpret=False,
                           prefix_counts=None):
    """Patch-binned Pallas forward -> (face_index_map int32, depth f32).

    prefix_counts: optional precomputed ``_membership_prefix`` result (the
    auto-fallback path in core shares it with its overflow test).

    Meshes beyond ``slice_size()`` faces run one pass per contiguous face
    slice; the returned depth IS the kernel's raw min-z state (far where
    uncovered), so the cross-pass merge compares exactly the quantity the
    in-kernel z test compares.  Strict ``<`` keeps the earlier slice's
    (lower-id) winner on exact ties — together with the in-slice lowest-id
    rule this reproduces the reference's sequential first-wins order
    (rasterize.py:334) for ANY face count."""
    bs, nf = faces.shape[:2]
    s = slice_size()
    if prefix_counts is None and nf > s:
        idx = depth = None
        for lo in range(0, nf, s):
            i_p, d_p = forward_face_index_map(settings, faces[:, lo:lo + s],
                                              interpret)
            i_p = jnp.where(i_p >= 0, i_p + lo, -1)
            if idx is None:
                idx, depth = i_p, d_p
            else:
                better = d_p < depth
                idx = jnp.where(better, i_p, idx)
                depth = jnp.where(better, d_p, depth)
        return idx, depth
    is_ = settings.image_size
    p = _patch_dim(settings)
    t = is_ // p
    rows = (p * p) // _CHUNK
    nf_pad = -(-nf // _CHUNK) * _CHUNK
    k_chunks = chunk_capacity(settings, nf) // _CHUNK

    prefix, counts = (prefix_counts if prefix_counts is not None
                      else _membership_prefix(settings, faces))
    if settings.runtime_checks and prefix_counts is None:
        # loud (async, non-blocking) failure when the cap actually drops
        # faces on THIS scene — validators alone only cover scenes someone
        # thought to check (ADVICE r1: binning_overflow was never consulted
        # in the render path).
        checks.maybe_callback(_warn_overflow, counts.max(),
                              jnp.int32(k_chunks * _CHUNK))
    counts = jnp.minimum(counts, k_chunks * _CHUNK)
    featT = _feature_table(settings, faces)

    kernel = functools.partial(_tile_kernel, settings, p, rows, nf_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bs, t, t, k_chunks),
        in_specs=[
            pl.BlockSpec((1, nf_pad, _NFEAT),
                         lambda b, i, j, k, counts: (b, 0, 0)),
            pl.BlockSpec((1, 1, 1, 1, nf_pad),
                         lambda b, i, j, k, counts: (b, i, j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, p, is_),
                         lambda b, i, j, k, counts: (b, i, 0)),
            pl.BlockSpec((1, p, is_),
                         lambda b, i, j, k, counts: (b, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, _CHUNK), jnp.float32),   # running min z
            pltpu.VMEM((rows, _CHUNK), jnp.int32),     # running winner
            pltpu.VMEM((t, rows, _CHUNK), jnp.float32),   # strip stage
            pltpu.VMEM((t, rows, _CHUNK), jnp.int32),
        ],
    )
    depth_p, idx_p = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            _out_struct((bs, is_, is_), jnp.float32, faces),
            _out_struct((bs, is_, is_), jnp.int32, faces),
        ],
        interpret=interpret,
    )(counts, featT, prefix)
    return idx_p, depth_p


def _shaded_kernel(settings, p, rows, nf_pad, cap, nfeat, with_rgb, ts,
                   nf, bs, *refs):
    """Shader-style forward: z-buffer + winner attribute/texel emission.

    Tracks the winner's patch-list POSITION across face chunks, appends
    each streamed chunk's feature rows to a VMEM scratch list, and at the
    last chunk fetches every pixel's winner attributes with one one-hot
    MXU contraction per 128-pixel row — replacing the two 8.4M-index
    winner-row gathers (face rows + texture cubes) of the XLA post-passes.

    With ``settings.grad_csr_rows`` the kernel additionally emits the CSR
    artifacts the backward's per-patch partial face reduction consumes:
    the packed winner-position map and the global segment id (b*nf+face,
    or bs*nf for list padding) of every (patch, chunk) slot, written at
    the patch's scalar-prefetched CSR chunk base.
    """
    csr = settings.grad_csr_rows is not None
    if csr:
        (counts_ref, base_ref, pchk_ref, kofs_ref, featT_ref, prefix_ref,
         idx_ref, depth_ref, w_ref, xy_ref, z_ref, rgb_ref, zraw_ref,
         posout_ref, gseg_ref, pos_ref, zmin_ref, flist_ref,
         fstage_ref, istage_ref) = refs
    else:
        (counts_ref, pchk_ref, kofs_ref, featT_ref, prefix_ref,
         idx_ref, depth_ref, w_ref, xy_ref, z_ref, rgb_ref, zraw_ref,
         pos_ref, zmin_ref, flist_ref, fstage_ref, istage_ref) = refs
    is_ = settings.image_size
    # compact schedule: list entry -> (patch, chunk offset); tail entries
    # past the scene's chunk total carry kofs == -1 and no-op entirely
    t = is_ // p
    c = pl.program_id(0)
    pt = pchk_ref[c]
    k = kofs_ref[c]
    b = pt // (t * t)
    iy = (pt // t) % t
    ix = pt % t
    nx = t
    eps = settings.eps
    far = settings.far

    count = counts_ref[pt]
    # this patch's last scheduled chunk (empty patches get exactly one —
    # their finalize-empty step)
    fin = k == jnp.maximum((count + _CHUNK - 1) // _CHUNK, 1) - 1

    @pl.when(k == 0)
    def _init():
        zmin_ref[...] = jnp.full((rows, _CHUNK), jnp.inf, jnp.float32)
        pos_ref[...] = jnp.full((rows, _CHUNK), cap, jnp.int32)

    @pl.when((k >= 0) & (k * _CHUNK < count))
    def _compute():
        pz = prefix_ref[0, 0, 0]         # [1, nf_pad] int32

        # features for this chunk's 128 faces; the same [nfeat, CHUNK]
        # orientation is appended to the patch's resident (transposed)
        # list, so ONE exact one-hot contraction serves both.  (A windowed
        # variant that contracted over a dynamic face-id tile window for
        # spatially-sorted meshes was built in r3 and REMOVED in r4: it
        # regressed on-chip as a default — the span bookkeeping outweighed
        # the skipped K-tiles — and the full fetch it would shave is only
        # ~3 ms of the 41 ms forward, so even a prefetched-window redo
        # could not pay for its complexity.  ops.spatial_sort remains as a
        # preprocessing utility.)
        slot = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, nf_pad), 0)
        onehot = (pz == (k * _CHUNK + 1 + slot)).astype(jnp.float32)
        f = jax.lax.dot_general(
            featT_ref[0], onehot, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # [nfeat, CHUNK]
        flist_ref[:, pl.ds(k * _CHUNK, _CHUNK)] = f

        if csr:
            # global segment id of each chunk slot for the backward's CSR
            # face reduction; list padding (idf == 0) routes to the bs*nf
            # overflow bucket
            ids = f[18:19, :].astype(jnp.int32) - 1          # [1, CHUNK]
            gseg_ref[...] = jnp.broadcast_to(
                jnp.where(ids >= 0, b * nf + ids, bs * nf), (8, _CHUNK))

        yi, xi = _pixel_coords(p, rows, iy, ix, (rows, _CHUNK, 1), 0, 1)
        yp = (2.0 * yi + 1.0 - is_) / is_
        xp = (2.0 * xi + 1.0 - is_) / is_

        def row(j):
            return f[j][None, None, :]          # [1, 1, _CHUNK]

        x0, y0, x1, y1, x2, y2 = (row(j) for j in range(6))
        z0, z1, z2 = row(6), row(7), row(8)
        idf = row(18)                           # face id + 1; 0 = empty

        outside = (
            ((yp - y0) * (x1 - x0) < (xp - x0) * (y1 - y0)) |
            ((yp - y1) * (x2 - x1) < (xp - x1) * (y2 - y1)) |
            ((yp - y2) * (x0 - x2) < (xp - x2) * (y0 - y2)))

        w0 = jnp.clip(row(9) * xi + row(10) * yi + row(11), 0.0, 1.0)
        w1 = jnp.clip(row(12) * xi + row(13) * yi + row(14), 0.0, 1.0)
        w2 = jnp.clip(row(15) * xi + row(16) * yi + row(17), 0.0, 1.0)
        wsum = w0 + w1 + w2
        # w_k * (1/z_k): the reciprocals are per FACE ([1, 1, 128]), so
        # the [rows, pixels, faces] z test pays ONE per-element divide
        # instead of four (lockstep with the forward_xla oracle)
        zp = wsum / (w0 * (1.0 / z0) + w1 * (1.0 / z1) + w2 * (1.0 / z2))

        valid = (jnp.logical_not(outside)
                 & (zp > settings.near) & (zp < settings.far)
                 & (idf > 0))
        zbuf = jnp.where(valid, zp, jnp.inf)

        cmin = jnp.min(zbuf, axis=-1)
        # winner = LOWEST slot among minima (== lowest face id; the list
        # ascends), first-wins like the reference's sequential z test
        slot2 = jax.lax.broadcasted_iota(jnp.int32, (rows, _CHUNK, _CHUNK),
                                         2)
        cslot = jnp.min(jnp.where(zbuf == cmin[..., None], slot2,
                                  jnp.int32(_CHUNK)), axis=-1)

        prev_d = zmin_ref[...]
        prev_p = pos_ref[...]
        better = cmin < prev_d
        zmin_ref[...] = jnp.where(better, cmin, prev_d)
        pos_ref[...] = jnp.where(better, k * _CHUNK + cslot, prev_p)

    @pl.when(fin & (count == 0))
    def _finalize_empty():
        # nothing binned: constant outputs, no fetch work at all (empty
        # patches are common — the teapot leaves ~half the screen empty)
        if csr:
            posout_ref[0, 0, 0] = jnp.full((rows, _CHUNK), cap, jnp.int32)
        istage_ref[ix] = jnp.full((rows, _CHUNK), -1, jnp.int32)
        nfp = 14 + (3 if with_rgb else 0)
        fstage_ref[ix] = jnp.concatenate(
            [jnp.full((rows, _CHUNK), far, jnp.float32),
             jnp.zeros(((nfp - 2) * rows, _CHUNK), jnp.float32),
             # zraw plane: +inf = "no candidate", so any later slice's
             # covered pixel wins the multi-pass z merge here
             jnp.full((rows, _CHUNK), jnp.inf, jnp.float32)], axis=0)

    @pl.when(fin & (count > 0))
    def _finalize():
        pos = pos_ref[...]                                   # [rows, CHUNK]
        covered = jnp.isfinite(zmin_ref[...])
        if csr:
            # packed winner positions; the sentinel `cap` matches no chunk
            # slot in the backward's one-hot partial reduction
            posout_ref[0, 0, 0] = jnp.where(covered, pos, cap)
        nch = (count + _CHUNK - 1) // _CHUNK
        slot_iota = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, 1), 0)
        acc = dict(idx=[], depth=[], w=[[], [], []], z=[[], [], []],
                   xy=[[] for _ in range(6)], rgb=[[], [], []])
        for r in range(rows):
            pos_r = pos[r:r + 1, :]

            # fetch winner features chunk by chunk — only the chunks this
            # patch actually filled (most patches bin < 128 faces, the
            # capacity is rounded up to 4+)
            def fetch(kk, acc):
                oh = (slot_iota == pos_r - kk * _CHUNK).astype(jnp.float32)
                return acc + jax.lax.dot_general(
                    flist_ref[:, pl.ds(kk * _CHUNK, _CHUNK)], oh,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # [nfeat, CHUNK]

            at = jax.lax.fori_loop(
                0, nch, fetch, jnp.zeros((nfeat, _CHUNK), jnp.float32))
            cov_r = covered[r:r + 1, :]

            yi, xi = _pixel_coords(p, rows, iy, ix, (1, _CHUNK), 0, 1,
                                   sub0=r)

            def arow(j):
                return at[j:j + 1, :]                        # [1, CHUNK]

            # weights / perspective depth exactly as
            # forward_xla.winner_attributes (clamp -> renormalize -> zp)
            w = [jnp.clip(arow(9 + 3 * j) * xi + arow(10 + 3 * j) * yi
                          + arow(11 + 3 * j), 0.0, 1.0) for j in range(3)]
            wsum = w[0] + w[1] + w[2]
            w = [wi / wsum for wi in w]
            zs = [arow(6), arow(7), arow(8)]
            zp = 1.0 / (w[0] / zs[0] + w[1] / zs[1] + w[2] / zs[2])

            acc['idx'].append(jnp.where(
                cov_r, at[18:19, :].astype(jnp.int32) - 1, -1))
            acc['depth'].append(jnp.where(cov_r, zp, far))
            for j in range(3):
                acc['w'][j].append(jnp.where(cov_r, w[j], 0.0))
                acc['z'][j].append(at[6 + j:7 + j, :])
            for j in range(6):
                acc['xy'][j].append(at[j:j + 1, :])

            if with_rgb and ts == 2:
                # K4 trilinear for ts=2 (reference rasterize.py:398-425):
                # lo == 0, so the 8 corners are the whole cube with static
                # cells; math order matches texture.sample_textures
                tif = [jnp.minimum(jnp.maximum(
                    w[j] * 1.0 * (zp / zs[j]), 0.0), 1.0 - eps)
                    for j in range(3)]
                rgb = [jnp.zeros((1, _CHUNK), jnp.float32) for _ in range(3)]
                for pn in range(8):
                    cw = 1.0
                    isc = 0
                    scale = (4, 2, 1)
                    for j in range(3):
                        bit = (pn >> j) & 1
                        cw = cw * (tif[j] if bit else (1.0 - tif[j]))
                        isc += bit * scale[j]
                    for c in range(3):
                        rgb[c] = rgb[c] + cw * arow(19 + c * 8 + isc)
                for c in range(3):
                    acc['rgb'][c].append(jnp.where(cov_r, rgb[c], 0.0))
            elif with_rgb:
                # K4 trilinear for general ts, as a per-axis hat product
                # over ALL ts^3 cells: the 8-corner blend equals
                # sum_ijk hat_i(tif0) hat_j(tif1) hat_k(tif2) * texel_ijk
                # with hat_c(t) = max(0, 1 - |t - c|) (the two cells
                # adjacent to t carry 1-frac / frac, the rest exact 0) —
                # no data-dependent cell indexing, so the whole cube rides
                # the VPU (reference semantics: rasterize.py:398-425)
                tif = [jnp.minimum(jnp.maximum(
                    w[j] * (ts - 1.0) * (zp / zs[j]), 0.0), ts - 1.0 - eps)
                    for j in range(3)]
                hats = [[jnp.maximum(0.0, 1.0 - jnp.abs(tif[j] - c))
                         for c in range(ts)] for j in range(3)]
                # assemble the full [ts^3, 128] per-cell weight block and
                # contract each rgb channel against its CONTIGUOUS texel
                # sublane block — per-cell row extraction cost ts^3 * 3
                # sublane slices per pixel row (~4 ms/step at ts=4 bs8)
                h2v = jnp.concatenate(hats[2], axis=0)       # [ts, 128]
                h12 = jnp.concatenate(
                    [hats[1][i1] * h2v for i1 in range(ts)], axis=0)
                hw = jnp.concatenate(
                    [hats[0][i0] * h12 for i0 in range(ts)], axis=0)
                ts3 = ts * ts * ts
                rgb = [jnp.sum(hw * at[19 + c * ts3:19 + (c + 1) * ts3, :],
                               axis=0, keepdims=True) for c in range(3)]
                for c in range(3):
                    acc['rgb'][c].append(jnp.where(cov_r, rgb[c], 0.0))

        # stage this patch's packed planes; plane order: depth, w0-2,
        # z0-2, xy0-5[, rgb0-2], zraw (the flush unpacks in the same order)
        istage_ref[ix] = jnp.concatenate(acc['idx'], axis=0)
        frows = (acc['depth'] + acc['w'][0] + acc['w'][1] + acc['w'][2]
                 + acc['z'][0] + acc['z'][1] + acc['z'][2])
        for j in range(6):
            frows += acc['xy'][j]
        if with_rgb:
            for c in range(3):
                frows += acc['rgb'][c]
        # zraw = the exact min-z state the in-kernel z test compared (inf
        # where uncovered) — the multi-pass merge key (forward_shaded)
        frows += [zmin_ref[...]]
        fstage_ref[ix] = jnp.concatenate(frows, axis=0)

    @pl.when(fin & (ix == nx - 1))
    def _flush():
        def store_i(j, img):
            idx_ref[0] = img

        _flush_strip(store_i, istage_ref, 1, p, rows, nx)

        nrgb_p = 3 if with_rgb else 0

        def store_f(j, img):
            if j == 0:
                depth_ref[0] = img
            elif j < 4:
                w_ref[0, j - 1] = img
            elif j < 7:
                z_ref[0, j - 4] = img
            elif j < 13:
                xy_ref[0, j - 7] = img
            elif j < 13 + nrgb_p:
                rgb_ref[0, j - 13] = img
            else:
                zraw_ref[0] = img

        _flush_strip(store_f, fstage_ref, 14 + nrgb_p, p, rows, nx)


def forward_shaded(settings, faces, textures=None, interpret=False,
                   prefix_counts=None, guarded_budget=False):
    """Full shader-pass forward.

    Returns dict with face_index_map [bs,is,is] int32, depth_map, weights
    [bs,3,is,is], xy [bs,6,is,is] (NDC x0 y0 x1 y1 x2 y2 of each pixel's
    face), z [bs,3,is,is], zraw [bs,is,is] (the kernel's raw min-z state,
    inf where uncovered — the multi-pass merge key), and rgb [bs,3,is,is]
    (uncomposited; zeros where uncovered) when ``textures`` is given
    (in-kernel K4 shading for any ts; ts=4 doubles the feature-table lane
    footprint and halves the per-pass face budget).

    guarded_budget: the caller wraps this render in a structural
    ``lax.cond`` that checked ``schedule_fits`` — the compact (patch,
    chunk) grid may then use the lean budget (see ``schedule_budget``)."""
    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    p = _patch_dim(settings)
    t = is_ // p
    rows = (p * p) // _CHUNK
    nf_pad = -(-nf // _CHUNK) * _CHUNK
    cap = chunk_capacity(settings, nf)
    k_chunks = cap // _CHUNK
    with_rgb = textures is not None
    ts = textures.shape[2] if with_rgb else 0
    nfeat = _NFEAT + (ts ** 3 * 3 if with_rgb else 0)

    prefix, counts = (prefix_counts if prefix_counts is not None
                      else _membership_prefix(settings, faces))
    if settings.runtime_checks and prefix_counts is None:
        checks.maybe_callback(_warn_overflow, counts.max(), jnp.int32(cap))
    counts = jnp.minimum(counts, cap)
    featT = _feature_table(settings, faces, textures)
    csr = settings.grad_csr_rows is not None

    kernel = functools.partial(_shaded_kernel, settings, p, rows, nf_pad,
                               cap, nfeat, with_rgb, ts, nf, bs)

    # compact (patch, chunk) schedule: grid over the scene's actual chunk
    # list instead of patches x capacity — a skipped dense step still cost
    # ~0.7 us, ~60% of this kernel's time on the teapot bench
    budget = schedule_budget(settings, bs, nf, cap, guarded=guarded_budget)
    pchk, kofs, total = chunk_schedule(counts, budget)
    if (settings.runtime_checks and prefix_counts is None
            and settings.forward_chunk_budget is not None):
        checks.maybe_callback(_warn_chunk_budget, total, jnp.int32(budget))

    nsp = 4 if csr else 3   # prefetch: counts [, csr base], pchk, kofs

    def byx(c, *s):
        pt = s[-2][c]                       # pchk is second-to-last
        return pt // (t * t), (pt // t) % t, pt % t

    def spec(shape, imap):
        # index_maps receive every scalar-prefetch ref as trailing args
        return pl.BlockSpec(shape, lambda c, *s, _m=imap: _m(*byx(c, *s)))

    def img_spec(nplanes):
        # direct image-layout patch-row strips: the kernel's packed pixel
        # mapping makes each patch store a handful of static slice copies,
        # so no XLA-side unpatchify reshape/transpose pass exists at all;
        # the strip block is constant over (tx, k), flushed once per row
        if nplanes == 1:
            return spec((1, p, is_), lambda b, i, j: (b, i, 0))
        return spec((1, nplanes, p, is_), lambda b, i, j: (b, 0, i, 0))

    def img_shape(nplanes, dtype=jnp.float32):
        if nplanes == 1:
            return _out_struct((bs, is_, is_), dtype, faces)
        return _out_struct((bs, nplanes, is_, is_), dtype, faces)

    nrgb = 3 if with_rgb else 1
    out_specs = [img_spec(1), img_spec(1), img_spec(3), img_spec(6),
                 img_spec(3), img_spec(nrgb), img_spec(1)]
    out_shape = [
        img_shape(1, jnp.int32), img_shape(1), img_shape(3), img_shape(6),
        img_shape(3), img_shape(nrgb), img_shape(1),
    ]
    operands = [counts, pchk, kofs, featT, prefix]
    if csr:
        base, lc = csr_base(settings, counts)
        if settings.runtime_checks and prefix_counts is None:
            # (prefix_counts shared by a caller means the caller owns the
            # capacity guard — the auto path's csr_valid lax.cond)
            # loud when CSR chunks actually overflow into the dump chunk on
            # THIS scene (same contract as the faces_per_tile_cap warning)
            checks.maybe_callback(
                _warn_csr_overflow,
                jnp.sum((counts + _CHUNK - 1) // _CHUNK),
                jnp.int32(lc - 1))
        operands = [counts, base, pchk, kofs, featT, prefix]
        out_specs += [
            spec((1, 1, 1, rows, _CHUNK),
                 lambda b, i, j: (b, i, j, 0, 0)),           # packed pos
            # CSR global-segment ids: chunk k of patch pt lands at the
            # prefetched chunk base; unscheduled/empty entries write
            # nothing and route to the reserved dump chunk lc-1, clamping
            # doubles as overflow containment (validate with
            # csr_rows_needed)
            # (8, 128) blocks satisfy the TPU min-tile rule; the ids are
            # broadcast over the 8 sublanes and row 0 is read back
            pl.BlockSpec((8, _CHUNK), lambda c, counts, base, pchk, kofs: (
                0, _csr_sched_index(lc, c, counts, base, pchk, kofs)[0])),
        ]
        out_shape += [
            _out_struct((bs, t, t, rows, _CHUNK), jnp.int32, faces),
            _out_struct((8, lc * _CHUNK), jnp.int32, faces),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=(budget,),
        in_specs=[
            spec((1, nf_pad, nfeat), lambda b, i, j: (b, 0, 0)),
            spec((1, 1, 1, 1, nf_pad), lambda b, i, j: (b, i, j, 0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((rows, _CHUNK), jnp.int32),     # winner position
            pltpu.VMEM((rows, _CHUNK), jnp.float32),   # running min z
            pltpu.VMEM((nfeat, cap), jnp.float32),     # patch feature listT
            pltpu.VMEM((t, (14 + (3 if with_rgb else 0)) * rows, _CHUNK),
                       jnp.float32),                   # strip stage (f32)
            pltpu.VMEM((t, rows, _CHUNK), jnp.int32),  # strip stage (idx)
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # the default 16MB scoped-vmem budget is borderline for the
        # feature table (double-buffered) + the [rows, 128, 128] z-test
        # intermediates; v5e has far more physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    idx_p, depth_p, w_p, xy_p, z_p, rgb_p, zraw_p = outs[:7]

    out = dict(
        face_index_map=idx_p,
        depth_map=depth_p,
        weights=w_p,
        xy=xy_p,
        z=z_p,
        zraw=zraw_p,
    )
    if with_rgb:
        out['rgb'] = rgb_p
    if csr:
        total = jnp.sum((counts + _CHUNK - 1) // _CHUNK) * _CHUNK
        gseg = outs[8][0]
        # unvisited CSR tail blocks (and the dump chunk) hold garbage —
        # route them to the bs*nf overflow bucket
        limit = jnp.minimum(total, (lc - 1) * _CHUNK)
        out['csr_gseg'] = jnp.where(
            jnp.arange(gseg.shape[0], dtype=jnp.int32) < limit, gseg,
            bs * nf)
        out['csr_pos'] = outs[7]          # packed [bs, t, t, rows, CHUNK]
        out['csr_counts'] = counts
        out['csr_base'] = base
    return out


def _csr_sched_index(lc, c, counts_ref, base_ref, pchk_ref, kofs_ref):
    """CSR out-block index for schedule entry c: chunk kofs[c] of patch
    pchk[c] lands at its prefetched chunk base; inactive entries (empty
    patches, unscheduled tail) land on the reserved dump chunk lc-1, which
    the caller masks out."""
    pt = pchk_ref[c]
    k = kofs_ref[c]
    cidx = jnp.where((k >= 0) & (k * _CHUNK < counts_ref[pt]),
                     base_ref[pt] + k, lc - 1)
    return jnp.minimum(cidx, lc - 1), 0


def csr_base(settings, counts):
    """Per-patch CSR chunk base (exclusive scan of ceil(count/128)) and the
    total chunk capacity lc = grad_csr_rows/128 (last chunk = dump)."""
    rows_cap = settings.grad_csr_rows
    if rows_cap is None or rows_cap % _CHUNK or rows_cap < 2 * _CHUNK:
        raise ValueError('grad_csr_rows must be a multiple of 128 >= 256, '
                         f'got {rows_cap}')
    nch = (counts + _CHUNK - 1) // _CHUNK
    base = jnp.cumsum(nch) - nch
    return base.astype(jnp.int32), rows_cap // _CHUNK


def csr_rows_needed(settings, faces):
    """CSR rows the scene needs (incl. the dump chunk) — validate
    ``grad_csr_rows`` against this, like the other capacity knobs.  The CSR
    reduction only exists on the single-pass forward (nf <= slice_size());
    multi-pass meshes use the global segment reduction."""
    if faces.shape[1] > slice_size():
        raise ValueError(
            f'CSR reduction requires nf <= {slice_size()} (single-pass '
            'forward); multi-pass meshes reduce via the global segment_sum')
    _, counts = _membership_prefix(settings, faces)
    counts = jnp.minimum(counts, chunk_capacity(settings, faces.shape[1]))
    return (jnp.sum((counts + _CHUNK - 1) // _CHUNK) + 1) * _CHUNK


def binning_overflow(settings, faces):
    """Max (over patches) number of front faces binned per patch — validate
    ``faces_per_tile_cap`` before trusting this backend on a scene.  For
    multi-pass meshes (nf > slice_size()) this is the max over SLICES, the
    unit the per-pass capacity applies to.  The xla backend has no capacity
    limits."""
    nf = faces.shape[1]
    s = slice_size()
    worst = jnp.int32(0)
    for lo in range(0, nf, s):
        _, counts = _membership_prefix(settings, faces[:, lo:lo + s])
        worst = jnp.maximum(worst, counts.max())
    return worst
