"""rasterize_core: the custom-VJP op tying forward maps to the approximate
backward.

Mirrors the reference ``Rasterize`` chainer.Function (``rasterize.py:19-897``):
forward produces (rgb, alpha, depth) from NDC faces (+ texture cubes), and
the backward is *defined* — not derived — as the paper's approximate vertex
gradient (K5) + exact texture scatter (K6) + analytic depth gradient (K7).
Where the reference caches forward state on the Function object
(``rasterize.py:53-58``), we save ``custom_vjp`` residuals.

Outputs are raster-space maps: row 0 = top in +y-down pixel space; the
public wrappers in ``api.py`` apply the reference's NCHW transpose / vertical
flip / anti-aliasing (``rasterize.py:953-969``).
"""

import functools

import jax
import jax.numpy as jnp

from neural_renderer_tpu.rasterize import backward as bwd
from neural_renderer_tpu.rasterize import forward_xla
from neural_renderer_tpu.rasterize import texture as tex

_DUMMY = functools.partial(jnp.zeros, (1,), jnp.float32)


def _xla_forward_maps(settings, faces, textures, fuse_rgb):
    """Forward maps via the XLA oracle + winner-row gathers."""
    face_index_map, _ = forward_xla.forward_face_index_map(settings, faces)
    face_w = forward_xla.gather_face_rows(faces, face_index_map)
    weight_map, depth_map, _ = forward_xla.winner_attributes(
        settings, faces, face_index_map, face_w, need_face_inv=False)
    maps = dict(face_index_map=face_index_map, face_w=face_w,
                weight_map=weight_map, depth_map=depth_map)
    if fuse_rgb:
        maps['rgb_raw'] = tex.sample_textures(
            settings, faces, textures, face_index_map, face_w, weight_map,
            depth_map)
    return maps


def _pallas_forward_maps(settings, faces, textures, fuse_rgb,
                         prefix_counts=None, allow_csr=True,
                         want_zraw=False, guarded_budget=False):
    import dataclasses

    from neural_renderer_tpu.rasterize import forward_pallas
    if not allow_csr and settings.grad_csr_rows is not None:
        # the auto-overflow lax.cond pairs this branch with the XLA oracle,
        # which has no CSR artifacts — both branches must return the same
        # bundle, so the CSR reduction is only available on the
        # single-backend paths
        settings = dataclasses.replace(settings, grad_csr_rows=None)
    out = forward_pallas.forward_shaded(
        settings, faces, textures if fuse_rgb else None,
        prefix_counts=prefix_counts, guarded_budget=guarded_budget)
    xy = out['xy']
    z = out['z']
    face_w = jnp.stack(
        [jnp.stack([xy[:, 2 * k], xy[:, 2 * k + 1], z[:, k]], axis=-1)
         for k in range(3)], axis=-2)                  # [bs, is, is, 3, 3]
    maps = dict(face_index_map=out['face_index_map'], face_w=face_w,
                weight_map=out['weights'].transpose(0, 2, 3, 1),
                depth_map=out['depth_map'])
    if fuse_rgb:
        maps['rgb_raw'] = out['rgb'].transpose(0, 2, 3, 1)
    if want_zraw:
        maps['zraw'] = out['zraw']
    for key in ('csr_pos', 'csr_gseg', 'csr_counts', 'csr_base',
                'csr_valid'):
        if key in out:
            maps[key] = out[key]
    return maps


# Safe "no slot" marker for per-slice CSR position maps: never within
# kofs*128 + [0, 128) of any real chunk offset, so the one-hot fetch
# matches nothing (the kernel computes slot == pos - kofs*128).
_CSR_SLICE_DUMP = 1 << 30


def _pallas_multipass_maps(settings, faces, textures, fuse_rgb,
                           guarded_budget=False):
    """Pallas forward for meshes beyond the per-pass VMEM face budget: one
    pass per contiguous face slice, merged on the kernel's raw min-z state
    (strict < keeps the earlier slice's winner on ties — the reference's
    sequential first-wins order over the full face list,
    rasterize.py:300,334).

    With ``grad_csr_rows`` set (and the image CSR-capable), every slice
    pass emits its own CSR artifacts at that per-slice row budget; the
    merge then re-points each slice's position map at the packed-layout
    winner-slice mask, so a pixel contributes to exactly its GLOBAL
    winner's slice (``csr_pos`` of losing slices gets the no-slot marker).
    The backward reduces each slice like single-pass CSR and concatenates
    along the face axis — the global bs*nf-segment pixel scatter never
    runs (r5: the 163k-face bench paid it every step, VERDICT item 7)."""
    import dataclasses

    from neural_renderer_tpu.rasterize import forward_pallas
    csr_rows = settings.grad_csr_rows
    if csr_rows is not None and not forward_pallas.csr_supported(settings):
        csr_rows = None
    settings = dataclasses.replace(settings, grad_csr_rows=csr_rows)
    s = forward_pallas.slice_size(forward_pallas._NFEAT + (
        textures.shape[2] ** 3 * 3 if fuse_rgb else 0))
    nf = faces.shape[1]

    def sel(better, new, old):
        extra = (Ellipsis,) + (None,) * (old.ndim - better.ndim)
        return jnp.where(better[extra], new, old)

    merged = None
    csr_slices = []
    win_slice = None
    for idx, lo in enumerate(range(0, nf, s)):
        m = _pallas_forward_maps(
            settings, faces[:, lo:lo + s],
            textures[:, lo:lo + s] if fuse_rgb else textures,
            fuse_rgb, want_zraw=True, guarded_budget=guarded_budget)
        csr = {k: m.pop(k) for k in ('csr_pos', 'csr_gseg', 'csr_counts',
                                     'csr_base') if k in m}
        if csr:
            csr_slices.append(csr)
        m['face_index_map'] = jnp.where(
            m['face_index_map'] >= 0, m['face_index_map'] + lo, -1)
        if merged is None:
            merged = m
            win_slice = jnp.zeros_like(m['face_index_map'])
        else:
            better = m['zraw'] < merged['zraw']
            win_slice = jnp.where(better, idx, win_slice)
            merged = {k: sel(better, m[k], merged[k]) for k in merged}
    del merged['zraw']
    if csr_slices:
        win_packed = forward_pallas.pack_pixel_layout(settings, win_slice)
        for idx, csr in enumerate(csr_slices):
            csr['csr_pos'] = jnp.where(win_packed == idx, csr['csr_pos'],
                                       jnp.int32(_CSR_SLICE_DUMP))
        merged['csr_slices'] = csr_slices
    return merged


def _sentinel_csr(s_csr, faces, counts, capacity):
    """Shape/dtype/vma-matched CSR placeholders for the XLA fallback branch
    of the auto forward cond.  Values are never consumed: whenever this
    branch runs, ``csr_valid`` is False and the backward routes to the
    global segment reduction — only the cond's structural matching needs
    these arrays."""
    from neural_renderer_tpu.rasterize import forward_pallas
    bs, nf = faces.shape[:2]
    p = forward_pallas._patch_dim(s_csr)
    t = s_csr.image_size // p
    rows = (p * p) // forward_pallas._CHUNK
    clamped = jnp.minimum(counts, capacity)
    base, lc = forward_pallas.csr_base(s_csr, clamped)
    vary = (faces.ravel()[0] * 0.0).astype(jnp.int32)   # carries vma
    pos = jnp.full((bs, t, t, rows, forward_pallas._CHUNK), capacity,
                   jnp.int32) + vary
    gseg = jnp.full((lc * forward_pallas._CHUNK,), bs * nf, jnp.int32) + vary
    return dict(csr_pos=pos, csr_gseg=gseg, csr_counts=clamped,
                csr_base=base)


def _sentinel_csr_slices(s_csr, faces, nfeat):
    """Shape/dtype/vma-matched per-slice CSR placeholders for the XLA
    fallback branch of the auto multipass cond (values never consumed —
    ``csr_valid`` is False whenever this branch runs)."""
    from neural_renderer_tpu.rasterize import forward_pallas
    bs, nf = faces.shape[:2]
    p = forward_pallas._patch_dim(s_csr)
    t = s_csr.image_size // p
    rows = (p * p) // forward_pallas._CHUNK
    lc = s_csr.grad_csr_rows // forward_pallas._CHUNK
    s_sz = forward_pallas.slice_size(nfeat)
    vary = (faces.ravel()[0] * 0.0).astype(jnp.int32)
    out = []
    for lo in range(0, nf, s_sz):
        nf_s = min(s_sz, nf - lo)
        out.append(dict(
            csr_pos=jnp.full((bs, t, t, rows, forward_pallas._CHUNK),
                             _CSR_SLICE_DUMP, jnp.int32) + vary,
            csr_gseg=jnp.full((lc * forward_pallas._CHUNK,), bs * nf_s,
                              jnp.int32) + vary,
            csr_counts=jnp.zeros((bs * t * t,), jnp.int32) + vary,
            csr_base=jnp.zeros((bs * t * t,), jnp.int32) + vary))
    return out


def _forward_maps(settings, faces, textures):
    """Uniform forward bundle (index map + winner attributes [+ raw rgb])
    from the best available backend.

    With ``backend='auto'`` and no explicit ``faces_per_tile_cap``, the
    binned kernel's capacity test runs at RUN time and overflowing scenes
    fall back to the capacity-free XLA path via ``lax.cond`` — auto is
    never silently wrong (an explicit cap means the user opted into the
    cap, and gets the runtime_checks warning instead).  With ``auto_fast``
    (and no explicit ``grad_csr_rows``), the Pallas branch additionally
    emits CSR artifacts at the static ``auto_csr_rows`` capacity and the
    bundle carries a runtime ``csr_valid`` flag — the backward's CSR face
    reduction engages only when the scene provably fits."""
    # the kernel fuses the whole K4 texture lookup for small cubes (texels
    # ride the feature table; the finalize shades via a per-axis hat
    # product) — ts <= 4 covers the reference Mesh default ts=4
    # (reference mesh.py:21).  Bigger cubes sample via XLA gathers.
    fuse_rgb = settings.return_rgb and textures.shape[2] <= 4

    if settings.backend == 'xla':
        return _xla_forward_maps(settings, faces, textures, fuse_rgb)
    if settings.backend in ('pallas', 'auto'):
        try:
            from neural_renderer_tpu.rasterize import forward_pallas
            ok = forward_pallas.supported(settings, faces)
        except ImportError:
            ok = False
        if ok and settings.grad_csr_rows is not None:
            # grad_csr_rows is a perf knob, not semantics: when the image
            # is too narrow for the CSR kernel's lane-aligned channel
            # blocks (e.g. the 1x grad pass of anti_aliasing='approx' at
            # small renders) drop it and take the exact global reduction.
            # (Checked only where Pallas is importable and selected — the
            # XLA backend and Pallas-less environments never consume CSR
            # artifacts, so the knob is simply unused there.)
            if not forward_pallas.csr_supported(settings):
                import dataclasses
                settings = dataclasses.replace(settings, grad_csr_rows=None)
        if ok:
            nfeat = forward_pallas._NFEAT + (
                textures.shape[2] ** 3 * 3 if fuse_rgb else 0)
            if faces.shape[1] > forward_pallas.slice_size(nfeat):
                # large mesh: multi-pass z-merged forward.  Under 'auto'
                # the per-slice binning capacities get the same runtime
                # guard as single-pass, but overflow first ESCALATES to a
                # 4x-capacity multi-pass before falling back to the
                # O(pixels x faces) XLA oracle — dense scenes (the 163k
                # bench sphere overflows the lean auto cap by ~4%) stay
                # ~100x off the oracle's cost (VERDICT r3 item 2).
                if settings.backend == 'auto':
                    import dataclasses

                    from neural_renderer_tpu.rasterize import (
                        config as rconfig)
                    s_sz = forward_pallas.slice_size(nfeat)
                    cap_hi = 4 * forward_pallas.chunk_capacity(settings, s_sz)
                    s_esc = dataclasses.replace(
                        settings, faces_per_tile_cap=cap_hi)
                    # auto fast path: per-slice CSR artifacts at the auto
                    # row budget; csr_valid gates the backward's per-slice
                    # reduction exactly like single-pass (overflow -> the
                    # exact global segment reduction)
                    auto_csr = (settings.auto_fast
                                and settings.grad_csr_rows is None
                                and forward_pallas.csr_supported(settings))
                    if auto_csr:
                        rows_m = rconfig.auto_csr_rows(
                            settings.image_size, faces.shape[0])
                        s_m = dataclasses.replace(
                            settings, grad_csr_rows=rows_m)
                        s_esc = dataclasses.replace(
                            s_esc, grad_csr_rows=rows_m)
                        fits_d, fits_hi, csr_ok = forward_pallas.\
                            multipass_fits(settings, faces, s_sz,
                                           caps=[cap_hi], csr_rows=rows_m)
                    else:
                        s_m = settings
                        fits_d, fits_hi = forward_pallas.multipass_fits(
                            settings, faces, s_sz, caps=[cap_hi])

                    def xla_branch(f2, t2):
                        maps = _xla_forward_maps(settings, f2, t2, fuse_rgb)
                        if auto_csr:
                            maps['csr_slices'] = _sentinel_csr_slices(
                                s_m, f2, nfeat)
                        return maps

                    maps = jax.lax.cond(
                        fits_d,
                        lambda f, t: _pallas_multipass_maps(
                            s_m, f, t, fuse_rgb, guarded_budget=True),
                        lambda f, t: jax.lax.cond(
                            fits_hi,
                            lambda f2, t2: _pallas_multipass_maps(
                                s_esc, f2, t2, fuse_rgb,
                                guarded_budget=True),
                            xla_branch,
                            f, t),
                        faces, textures)
                    if auto_csr:
                        maps['csr_valid'] = (fits_d | fits_hi) & csr_ok
                    return maps
                return _pallas_multipass_maps(settings, faces, textures,
                                              fuse_rgb)
            if (settings.backend == 'auto'
                    and settings.faces_per_tile_cap is None):
                import dataclasses

                from neural_renderer_tpu.rasterize import config as rconfig
                prefix_counts = forward_pallas._membership_prefix(
                    settings, faces)
                capacity = forward_pallas.chunk_capacity(
                    settings, faces.shape[1])
                counts = prefix_counts[1]
                fits = ((counts.max() <= capacity)
                        & forward_pallas.schedule_fits(
                            settings, counts, capacity, faces.shape[0],
                            faces.shape[1]))
                auto_csr = (settings.auto_fast
                            and settings.grad_csr_rows is None
                            and forward_pallas.csr_supported(settings))
                if not auto_csr:
                    return jax.lax.cond(
                        fits,
                        lambda f, t, pc: _pallas_forward_maps(
                            settings, f, t, fuse_rgb, prefix_counts=pc,
                            allow_csr=False, guarded_budget=True),
                        lambda f, t, pc: _xla_forward_maps(
                            settings, f, t, fuse_rgb),
                        faces, textures, prefix_counts)
                s_csr = dataclasses.replace(
                    settings,
                    grad_csr_rows=rconfig.auto_csr_rows(
                        settings.image_size, faces.shape[0]))
                clamped = jnp.minimum(counts, capacity)
                needed = (jnp.sum((clamped + forward_pallas._CHUNK - 1)
                                  // forward_pallas._CHUNK) + 1
                          ) * forward_pallas._CHUNK
                csr_ok = fits & (needed <= s_csr.grad_csr_rows)
                maps = jax.lax.cond(
                    fits,
                    lambda f, t, pc: _pallas_forward_maps(
                        s_csr, f, t, fuse_rgb, prefix_counts=pc,
                        allow_csr=True, guarded_budget=True),
                    lambda f, t, pc: dict(
                        _xla_forward_maps(settings, f, t, fuse_rgb),
                        **_sentinel_csr(s_csr, f, pc[1], capacity)),
                    faces, textures, prefix_counts)
                maps['csr_valid'] = csr_ok
                return maps
            return _pallas_forward_maps(settings, faces, textures, fuse_rgb)
        if settings.backend == 'pallas':
            raise ValueError('pallas backend requested but unsupported for '
                             f'this configuration (image_size='
                             f'{settings.image_size}, backend platform='
                             f'{jax.default_backend()})')
    return _xla_forward_maps(settings, faces, textures, fuse_rgb)


def _merge_face_axis(settings, maps, faces, textures):
    """Merge per-device z-buffers across the face-sharded mesh axis.

    Inside ``shard_map`` each device rasterized its face slice; the global
    winner of a pixel is the lexicographic (depth, global id) minimum over
    devices — bit-identical to one device rasterizing the concatenated
    list, because the reference's sequential scan keeps the FIRST face with
    the strictly smallest depth (rasterize.py:334) and global ids follow
    concatenation order.  Two scalar-map ``pmin``s find the winner; one
    fused ``psum`` of winner-masked attribute maps materializes the merged
    bundle (every map is produced by a collective, so outputs are
    replicated over the axis).  ``face_index_map`` comes back LOCALIZED
    (my faces' local ids; -1 elsewhere): the backward then computes
    gradients for exactly this device's slice from the globally-merged
    maps.  CSR artifacts stay valid as-is — a pixel this device covered
    locally but lost globally contributes all-zero backward channels.
    """
    ax = settings.face_axis
    nf_local = faces.shape[1]
    lo = jax.lax.axis_index(ax) * nf_local
    fim = maps['face_index_map']
    covered = fim >= 0
    if settings.return_rgb and 'rgb_raw' not in maps:
        # non-fused texture sampling (ts > 4) gathers from the LOCAL
        # texture slice — it must run on the local winner maps, before the
        # merge localizes the index map to this device's slice
        maps = dict(maps, rgb_raw=tex.sample_textures(
            settings, faces, textures, fim, maps['face_w'],
            maps['weight_map'], maps['depth_map']))
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    z = jnp.where(covered, maps['depth_map'], jnp.float32(jnp.inf))
    gid = jnp.where(covered, fim + lo, big)
    zmin = jax.lax.pmin(z, ax)
    gid_win = jax.lax.pmin(jnp.where(z == zmin, gid, big), ax)
    mine = ((gid == gid_win) & covered).astype(jnp.float32)

    def merged(x):
        extra = (Ellipsis,) + (None,) * (x.ndim - mine.ndim)
        return jax.lax.psum(x * mine[extra], ax)

    cov = jax.lax.psum(mine, ax)                     # global coverage (0/1)
    out = dict(maps)
    out['face_w'] = merged(maps['face_w'])
    out['weight_map'] = merged(maps['weight_map'])
    # zmin IS the winner's depth bit-exactly (the z key is depth where
    # covered) — no need to carry the depth map in the psum payload
    out['depth_map'] = jnp.where(jnp.isinf(zmin),
                                 jnp.float32(settings.far), zmin)
    if 'rgb_raw' in maps:
        out['rgb_raw'] = merged(maps['rgb_raw'])
    out['face_index_map'] = jnp.where(
        (gid_win >= lo) & (gid_win < lo + nf_local), gid_win - lo, -1)
    out['covered_global'] = cov > 0
    return out


def _forward_all(settings, faces, textures, background):
    """Full forward: maps + composited outputs.

    background: f32 ``[3]`` (static color) or ``[bs, 3]`` (per batch
    element, reference rasterize.py:462-465).
    Returns (rgb, alpha, depth, residuals).
    """
    maps = _forward_maps(settings, faces, textures)
    if settings.face_axis is not None:
        maps = _merge_face_axis(settings, maps, faces, textures)
    face_index_map = maps['face_index_map']
    face_w = maps['face_w']
    weight_map = maps['weight_map']
    depth_map = maps['depth_map']
    # under face sharding the index map is localized — compositing needs
    # GLOBAL coverage (a pixel won by another device's face is covered)
    covered = maps.get('covered_global', face_index_map >= 0)

    if settings.return_depth:
        # face_inv is pure elementwise recompute from the winner's rows
        # (needed by K7 only)
        is_ = settings.image_size
        from neural_renderer_tpu.rasterize import geometry
        finv = geometry.face_inv_matrix(
            geometry.to_pixel_coords(face_w[..., 0], is_),
            geometry.to_pixel_coords(face_w[..., 1], is_))
        face_inv_map = jnp.where(covered[..., None, None], finv, 0.0)
    else:
        face_inv_map = jnp.zeros((1,), jnp.float32)

    if settings.return_rgb:
        if 'rgb_raw' in maps:
            rgb_map = maps['rgb_raw']
        else:
            rgb_map = tex.sample_textures(
                settings, faces, textures, face_index_map, face_w,
                weight_map, depth_map)
        # background composite (rasterize.py:451-465); part of the forward —
        # the backward reads the *composited* rgb map, like the reference.
        # background.ndim selects static [3] vs per-batch [bs, 3] colors.
        bg = (background[None, None, None, :] if background.ndim == 1
              else background[:, None, None, :])
        mask = covered.astype(jnp.float32)[..., None]
        rgb_map = rgb_map * mask + (1.0 - mask) * bg
    else:
        rgb_map = jnp.zeros(
            (faces.shape[0], settings.image_size, settings.image_size, 3),
            jnp.float32)

    alpha_map = covered.astype(jnp.float32)

    res = dict(faces=faces, textures=textures, face_w=face_w,
               face_index_map=face_index_map, weight_map=weight_map,
               depth_map=depth_map, face_inv_map=face_inv_map,
               rgb_map=rgb_map, alpha_map=alpha_map)
    for key in ('csr_pos', 'csr_gseg', 'csr_counts', 'csr_base',
                'csr_valid', 'csr_slices'):
        if key in maps:
            res[key] = maps[key]

    rgb_out = rgb_map if settings.return_rgb else _DUMMY()
    alpha_out = alpha_map if settings.return_alpha else _DUMMY()
    depth_out = depth_map if settings.return_depth else _DUMMY()
    return rgb_out, alpha_out, depth_out, res


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def rasterize_core(settings, faces, textures, background):
    """faces [bs,nf,3,3] NDC, textures [bs,nf,ts,ts,ts,3],
    background [3] or [bs,3] -> (rgb, alpha, depth).

    Unrequested channels are shape-(1,) zero placeholders (static per
    settings).  rgb is [bs,is,is,3] raster-space (pre-flip).
    """
    rgb, alpha, depth, _ = _forward_all(settings, faces, textures, background)
    return rgb, alpha, depth


def _fwd(settings, faces, textures, background):
    rgb, alpha, depth, res = _forward_all(settings, faces, textures,
                                          background)
    res['background'] = background
    return (rgb, alpha, depth), res


def _bwd(settings, res, cotangents):
    g_rgb, g_alpha, g_depth = cotangents
    faces = res['faces']
    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    ts = res['textures'].shape[2]

    zero_map = jnp.zeros((bs, is_, is_), jnp.float32)
    g_rgb_map = g_rgb if settings.return_rgb else jnp.zeros(
        (bs, is_, is_, 3), jnp.float32)
    g_alpha_map = g_alpha if settings.return_alpha else zero_map
    g_depth_map = g_depth if settings.return_depth else zero_map

    # K5 / K6(ts=2) / K7 all scatter per-pixel contributions into the same
    # pixel->face segments.  Scatter cost on TPU is per-index, not
    # per-byte (~80 ms per 8.4M indices at 512^2 bs32), so every channel
    # rides ONE fused segment reduction.
    channels = []           # (name, per-pixel [bs, C, is, is]) pairs
    extra_k5 = None
    if settings.return_rgb or settings.return_alpha:
        stacked, extra_k5 = bwd.pixel_map_channels(
            settings, faces, res['face_index_map'], res['face_w'],
            res['rgb_map'], res['alpha_map'], g_rgb_map, g_alpha_map)
        channels.append(('k5', stacked))
    if settings.return_depth:
        contrib = bwd.depth_channels(
            settings, faces, res['face_index_map'], res['face_w'],
            res['face_inv_map'], res['weight_map'], res['depth_map'],
            g_depth_map)
        channels.append(('k7', contrib))
    k6_expand = None
    if (settings.return_rgb and 2 <= ts <= 4
            and ('csr_pos' in res or 'csr_slices' in res)):
        # CSR path: the fused stack carries only the ts^2 + ts + 3 K6
        # FACTOR channels; the CSR partial kernel expands them to the
        # ts^3 * 3 cell-resolved columns on 32-pixel VMEM blocks
        # (bit-exact multiply order).  At ts=4 this moves 192 full-image
        # planes of stack write + kernel read off HBM — the measured
        # ts=4 throughput gap — and drops the cell-row materialization
        # budget from the fast path entirely.
        factors = tex.texture_cell_factors(
            settings, res['face_index_map'], res['face_w'],
            res['weight_map'], res['depth_map'], g_rgb_map, ts)
        channels.append(('k6f', factors))
        k6_expand = (ts * ts, ts)
    elif settings.return_rgb and ts == 2:
        rows = tex.texture_channels_ts2(
            settings, res['face_index_map'], res['face_w'],
            res['weight_map'], res['depth_map'], g_rgb_map)
        channels.append(('k6', rows))
    elif (settings.return_rgb
          and tex.cell_channels_fit(settings, bs, ts)):
        # ts=3/4 (the reference Mesh default is ts=4, mesh.py:21): the
        # cell-resolved rows ride the same fused reduction; the old path
        # paid 8 separate all-pixel segment_sums for the data-dependent
        # corner cells
        rows = tex.texture_channels_cells(
            settings, res['face_index_map'], res['face_w'],
            res['weight_map'], res['depth_map'], g_rgb_map, ts)
        channels.append(('k6', rows))

    sums = {}
    if channels:
        # every producer emits channel-LEADING [bs, C, is, is] stacks
        # natively: the CSR partial kernel pins that layout, and building
        # it at the source (rather than transposing a channel-minor
        # concat) keeps the auto-guard lax.conds' output layouts canonical
        # — the channel-minor version cost two 1.2 ms full-stack relayout
        # copies at the cond boundaries (512^2 bs32, traced r4).
        # The barrier keeps per-pixel producers out of the reduction that
        # follows: without it XLA fuses them into the scatter (which then
        # lowers to scalar loops) or remats them as [bs,is,is,1] copies
        # that lane-pad 128x and blow HBM (observed: 84G of temps).
        fused = jax.lax.optimization_barrier(
            jnp.concatenate([c for _, c in channels], axis=1))

        def _csr_reduce(fused):
            # per-patch partial face sums (one-hot MXU against the
            # forward's binning lists), then a segment_sum over just the
            # CSR face-incidence rows instead of every pixel
            import dataclasses

            from neural_renderer_tpu.rasterize import (backward_pallas,
                                                       config as rconfig,
                                                       forward_pallas)
            s = settings
            if s.grad_csr_rows is None:   # auto fast path: static auto rows
                s = dataclasses.replace(s, grad_csr_rows=rconfig.auto_csr_rows(
                    s.image_size, bs))
            partials = backward_pallas.csr_partial_channels(
                s, fused, res['csr_pos'], res['csr_counts'],
                res['csr_base'], forward_pallas.chunk_capacity(s, nf),
                expand=k6_expand)
            return jax.ops.segment_sum(
                partials, res['csr_gseg'],
                num_segments=bs * nf + 1)[:-1]

        def _global_reduce(fused):
            # fused is channel-leading; segment_sum wants [pixels, C]
            # rows.  The transpose back is a real relayout, but this
            # branch only runs when no CSR artifacts exist (xla backend /
            # CPU) or the scene overflowed the CSR capacity.
            seg_flat = bwd.face_segments(
                settings, faces, res['face_index_map']).reshape(-1)
            if k6_expand is not None:
                # the CSR branch expands K6 factors in-kernel; this
                # fallback expands them here ((c2, ch)-major like the
                # kernel — one shared unpermute happens after the cond),
                # or takes the lean 8-pass scatter when the cell rows
                # would blow the materialization budget
                n01, na2 = k6_expand
                naux = n01 + na2 + 3
                ncb = fused.shape[1] - naux
                base_px = fused[:, :ncb]
                u = fused[:, ncb:ncb + n01]
                av = fused[:, ncb + n01:ncb + n01 + na2]
                gm = fused[:, ncb + n01 + na2:]
                if ts == 2 or tex.cell_channels_fit(settings, bs, ts):
                    cells = []
                    for j in range(na2):
                        tj = u * av[:, j:j + 1]
                        for ch in range(3):
                            cells.append(tj * gm[:, ch:ch + 1])
                    full = jax.lax.optimization_barrier(
                        jnp.concatenate([base_px] + cells, axis=1))
                    return jax.ops.segment_sum(
                        jnp.transpose(full, (0, 2, 3, 1)).reshape(
                            -1, full.shape[1]),
                        seg_flat, num_segments=bs * nf + 1)[:-1]
                base_tot = jax.ops.segment_sum(
                    jnp.transpose(base_px, (0, 2, 3, 1)).reshape(-1, ncb),
                    seg_flat, num_segments=bs * nf + 1)[:-1]
                k6_cells = tex.grad_textures(
                    settings, faces, res['face_index_map'], res['face_w'],
                    res['weight_map'], res['depth_map'], g_rgb_map,
                    res['textures'].shape).reshape(bs * nf, -1)
                from neural_renderer_tpu.rasterize import backward_pallas
                import numpy as np
                perm = backward_pallas.csr_expand_perm(ts)
                return jnp.concatenate(
                    [base_tot, k6_cells[:, np.argsort(perm)]], axis=1)
            return jax.ops.segment_sum(
                jnp.transpose(fused, (0, 2, 3, 1)).reshape(
                    -1, fused.shape[1]),
                seg_flat, num_segments=bs * nf + 1)[:-1]

        def _csr_reduce_slices(fused):
            # multi-pass per-slice CSR: each slice reduces like
            # single-pass (partial kernel over ITS binning lists — the
            # merge already no-slot-marked losing pixels' positions), and
            # the per-slice face totals concatenate along the face axis.
            # Static slicing mirrors _pallas_multipass_maps exactly.
            import dataclasses

            from neural_renderer_tpu.rasterize import (backward_pallas,
                                                       config as rconfig,
                                                       forward_pallas)
            s = settings
            if s.grad_csr_rows is None:   # auto fast path: static auto rows
                s = dataclasses.replace(
                    s, grad_csr_rows=rconfig.auto_csr_rows(
                        s.image_size, bs))
            fuse_rgb = settings.return_rgb and ts <= 4
            nfeat = forward_pallas._NFEAT + (ts ** 3 * 3 if fuse_rgb
                                             else 0)
            s_sz = forward_pallas.slice_size(nfeat)
            # kmax sentinel: >= any branch's per-slice capacity (the auto
            # multipass escalation runs at 4x the auto cap)
            cap = forward_pallas.chunk_capacity(settings, s_sz)
            if (settings.backend == 'auto'
                    and settings.faces_per_tile_cap is None):
                cap *= 4
            parts = []
            for i, lo in enumerate(range(0, nf, s_sz)):
                sl = res['csr_slices'][i]
                nf_s = min(s_sz, nf - lo)
                partials = backward_pallas.csr_partial_channels(
                    s, fused, sl['csr_pos'], sl['csr_counts'],
                    sl['csr_base'], cap, expand=k6_expand)
                parts.append(jax.ops.segment_sum(
                    partials, sl['csr_gseg'],
                    num_segments=bs * nf_s + 1)[:-1].reshape(bs, nf_s, -1))
            return jnp.concatenate(parts, axis=1).reshape(
                bs * nf, parts[0].shape[-1])

        if 'csr_slices' in res and 'csr_valid' in res:
            total = jax.lax.cond(res['csr_valid'], _csr_reduce_slices,
                                 _global_reduce, fused)
        elif 'csr_slices' in res:
            total = _csr_reduce_slices(fused)
        elif 'csr_pos' in res and 'csr_valid' in res:
            # auto fast path: the forward measured the scene's CSR needs;
            # reduce over the CSR rows only when it provably fits
            total = jax.lax.cond(res['csr_valid'], _csr_reduce,
                                 _global_reduce, fused)
        elif 'csr_pos' in res:
            total = _csr_reduce(fused)
        else:
            total = _global_reduce(fused)
        off = 0
        for name, c in channels:
            if name == 'k6f':
                # expanded in the reduction: naux factor channels in,
                # ts^3*3 cell columns out, unpermuted to cube order
                from neural_renderer_tpu.rasterize import backward_pallas
                width = k6_expand[0] * k6_expand[1] * 3
                perm = backward_pallas.csr_expand_perm(ts)
                sums['k6'] = total[:, off:off + width][:, perm]
            else:
                width = c.shape[1]
                sums[name] = total[:, off:off + width]
            off += width

    grad_faces = jnp.zeros_like(faces)
    if 'k5' in sums:
        grad_faces = grad_faces + bwd.scatter_pixel_channels(
            sums['k5'], bs, nf)
        if extra_k5 is not None:
            grad_faces = grad_faces + extra_k5
    if 'k7' in sums:
        grad_faces = grad_faces + sums['k7'].reshape(bs, nf, 3, 3)

    if settings.return_rgb:
        if 'k6' in sums:
            grad_textures = sums['k6'].reshape(res['textures'].shape)
        else:
            grad_textures = tex.grad_textures(
                settings, faces, res['face_index_map'], res['face_w'],
                res['weight_map'], res['depth_map'], g_rgb_map,
                res['textures'].shape)
    else:
        grad_textures = jnp.zeros_like(res['textures'])

    # Exact background gradient: d(rgb_out)/d(bg) = (1 - covered mask).
    # The reference treats the background as a constant (it is a plain
    # array attribute, not a Function input) — providing the true gradient
    # is a strict superset of that behavior.
    background = res['background']
    if settings.return_rgb:
        uncovered = (res['alpha_map'] < 0.5).astype(jnp.float32)
        per_batch = jnp.sum(g_rgb_map * uncovered[..., None], axis=(1, 2))
        grad_background = (jnp.sum(per_batch, axis=0)
                           if background.ndim == 1 else per_batch)
        # under face sharding every device computes this same full-image
        # value from the merged maps; it is vma-replicated over the face
        # axis, so shard_map's transpose passes it through un-psummed — no
        # correction needed (verified by test_face_parallel)
    else:
        grad_background = jnp.zeros_like(background)

    return grad_faces, grad_textures, grad_background


rasterize_core.defvjp(_fwd, _bwd)
