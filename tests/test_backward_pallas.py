"""In-sweep Pallas kernel vs the XLA reference path (interpret mode on CPU,
compiled on TPU when available)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import neural_renderer_tpu as nr
from neural_renderer_tpu.ops.transforms import look_at, perspective
from neural_renderer_tpu.ops.vertices_to_faces import vertices_to_faces
from neural_renderer_tpu.rasterize import (backward, backward_pallas,
                                           forward_xla, geometry)
from neural_renderer_tpu.rasterize import texture as tex
from neural_renderer_tpu.rasterize.config import RasterizeSettings
from utils import DATA_DIR
import os


def _scene(is_, bs=2):
    v, f = nr.load_obj(os.path.join(DATA_DIR, 'teapot.obj'))
    v = jnp.asarray(np.tile(v[None], (bs, 1, 1)))
    fi = jnp.asarray(np.tile(f[None], (bs, 1, 1)))
    f2 = jnp.concatenate([fi, fi[:, :, ::-1]], 1)
    eye = jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30), np.float32(90)))
    fc = jax.jit(lambda v: vertices_to_faces(
        perspective(look_at(v, eye), 30.0), f2))(v)
    return fc


def test_insweep_kernel_matches_xla():
    is_ = 128
    fc = _scene(is_)
    s = RasterizeSettings(image_size=is_, return_rgb=True, return_alpha=True,
                          return_depth=False, runtime_checks=False,
                          grad_offset_radius=16)
    s_ref = dataclasses.replace(s, grad_offset_radius=None)

    fim, _ = jax.jit(
        lambda f: forward_xla.forward_face_index_map(s, f))(fc)
    face_w = jax.jit(forward_xla.gather_face_rows)(fc, fim)
    bs = fc.shape[0]
    ppx = geometry.to_pixel_coords(face_w[..., 0], is_)
    ppy = geometry.to_pixel_coords(face_w[..., 1], is_)
    alpha = (fim >= 0).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    ga = jax.random.normal(key, alpha.shape)
    rgb = jax.random.uniform(jax.random.PRNGKey(1),
                             alpha.shape + (3,))
    grgb = jax.random.normal(jax.random.PRNGKey(2), rgb.shape)

    interpret = jax.default_backend() != 'tpu'
    kout = []
    kstats = []
    for a in (0, 1):
        six, ow = jax.jit(lambda ppx, ppy, al, g, r, gr, a=a:
                          backward_pallas.insweep_channels(
                              s, a, ppx, ppy, al, g, r, gr,
                              interpret=interpret))(ppx, ppy, alpha, ga,
                                                    rgb, grgb)
        kout.append(six)
        kstats.append(ow)

    # XLA reference: the exact-gather in-sweep contributions per (e, a)
    yi = jnp.broadcast_to(jnp.arange(is_, dtype=jnp.float32)[None, :, None],
                          (bs, is_, is_))
    xi = jnp.broadcast_to(jnp.arange(is_, dtype=jnp.float32)[None, None, :],
                          (bs, is_, is_))
    covered = fim >= 0

    @jax.jit
    def ref(ppx, ppy, alpha, ga, rgb, grgb):
        outs = {}
        for e, a in backward._EA:
            X, Y = backward._edge_coords(ppx, ppy, e, a)
            d0 = xi if a == 0 else yi
            d1 = yi if a == 0 else xi
            cr = backward._crossing(s_ref, X, Y, a, d0)
            lim = backward._in_limit(s_ref, X, Y, d0, cr['direction'])
            lo2 = jnp.maximum(jnp.minimum(cr['d1_in'], lim), 0.0)
            hi2 = jnp.minimum(jnp.maximum(cr['d1_in'], lim), is_ - 1.0)
            act_in = covered & cr['valid'] & (d1 >= lo2) & (d1 <= hi2)
            a_out = backward._out_pixel_values(s_ref, alpha, a,
                                               cr['d1_out'], d1, d0)
            rgb_out = backward._out_pixel_values(s_ref, rgb, a,
                                                 cr['d1_out'], d1, d0)
            dg = (alpha - a_out) * ga + jnp.sum((rgb - rgb_out) * grgb, -1)
            delta = d1 - cr['d1_cross']
            c0, c1 = backward._dist_contrib(s_ref, dg, delta, X[0], X[1], d0)
            outs[(e, a)] = (jnp.where(act_in, c0, 0.0),
                            jnp.where(act_in, c1, 0.0))
        return outs

    r = ref(ppx, ppy, alpha, ga, rgb, grgb)
    scale = max(float(jnp.abs(v).max()) for pair in r.values() for v in pair)
    for a in (0, 1):
        for e in range(3):
            for k in range(2):
                got = np.asarray(kout[a][:, 2 * e + k])
                want = np.asarray(r[(e, a)][k])
                # kernel was exact here, so its self-measured offset stat
                # must honor the radius contract
                assert int(kstats[a]) <= s.grad_offset_radius
                np.testing.assert_allclose(
                    got, want, rtol=1e-5, atol=scale * 1e-6,
                    err_msg=f'(e={e}, a={a}, c{k})')


def test_outsweep_kernel_interpret():
    """Out-sweep kernel vs the dense XLA sweep, channel by channel, in
    interpret mode — the only out-sweep coverage that runs on CPU (the
    grad-level tests below are TPU-gated).  512 activates the windowed
    record fetch; rows whose spans overflow the window exercise the
    full-width fallback in the same scene."""
    is_ = 512
    fc = _scene(is_, bs=1)
    s = RasterizeSettings(image_size=is_, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False)
    fim, _ = jax.jit(
        lambda f: forward_xla.forward_face_index_map(s, f))(fc)
    face_w = jax.jit(forward_xla.gather_face_rows)(fc, fim)
    covered = fim >= 0
    ppx = geometry.to_pixel_coords(face_w[..., 0], is_)
    ppy = geometry.to_pixel_coords(face_w[..., 1], is_)
    alpha = covered.astype(jnp.float32)
    ga = jax.random.normal(jax.random.PRNGKey(5), alpha.shape)
    s1 = alpha * ga
    rgb0 = jnp.zeros(alpha.shape + (3,))
    interpret = jax.default_backend() != 'tpu'

    yi = jnp.broadcast_to(jnp.arange(is_, dtype=jnp.float32)[None, :, None],
                          alpha.shape)
    xi = jnp.broadcast_to(jnp.arange(is_, dtype=jnp.float32)[None, None, :],
                          alpha.shape)
    for a in (0, 1):
        six, rw = jax.jit(lambda ppx, ppy, al, s1m, g, a=a:
                          backward_pallas.outsweep_channels(
                              s, a, ppx, ppy, al, s1m, g, row_cap=256,
                              interpret=interpret))(ppx, ppy, alpha, s1, ga)
        assert int(rw) > 0
        assert int(rw) <= 256          # scene must fit for exactness here
        # the compact (block, chunk) schedule (the auto path's default)
        # must be bit-identical to the dense grid when the scene fits —
        # including zero channels at every unvisited block (the aliased
        # zero buffer)
        six_c, rw_c, fits = jax.jit(
            lambda ppx, ppy, al, s1m, g, a=a:
            backward_pallas.outsweep_channels(
                s, a, ppx, ppy, al, s1m, g, row_cap=256,
                interpret=interpret, compact=True))(ppx, ppy, alpha, s1, ga)
        assert bool(fits)
        assert int(rw_c) == int(rw)
        np.testing.assert_array_equal(np.asarray(six_c), np.asarray(six),
                                      err_msg=f'compact (a={a})')
        # schedule overflow (budget too small for the scene's entry list)
        # must route to the dense Pallas grid inside the kernel's own
        # lax.cond and stay bit-identical — never drop entries (r5: the
        # r4-end rewrite dropped to the XLA fallback from the CALLER's
        # guard instead, costing ~0.5 s on the one bench azimuth whose
        # entries exceeded bs * nblocks)
        six_o, rw_o, fits_o = jax.jit(
            lambda ppx, ppy, al, s1m, g, a=a:
            backward_pallas.outsweep_channels(
                s, a, ppx, ppy, al, s1m, g, row_cap=256,
                interpret=interpret, compact=True, budget=8))(
            ppx, ppy, alpha, s1, ga)
        assert not bool(fits_o)
        assert int(rw_o) == int(rw)
        np.testing.assert_array_equal(np.asarray(six_o), np.asarray(six),
                                      err_msg=f'compact overflow (a={a})')
        for e in range(3):
            X, Y = backward._edge_coords(ppx, ppy, e, a)
            d0 = xi if a == 0 else yi
            d1 = yi if a == 0 else xi
            cr = backward._crossing(s, X, Y, a, d0)
            act_out = covered & cr['valid'] & (cr['d1_in'] == d1)
            o0, o1 = jax.jit(
                lambda act, cr, X, d0, al, g, a=a: backward._out_sweep(
                    s, a, act, cr, X, d0, al, rgb0, rgb0, g))(
                act_out, cr, X, d0, alpha, ga)
            scale = float(np.abs(np.asarray(o0)).max()) + 1e-9
            np.testing.assert_allclose(
                np.asarray(six[:, 2 * e]), np.asarray(o0), rtol=1e-4,
                atol=scale * 1e-5, err_msg=f'(e={e}, a={a}, c0)')
            np.testing.assert_allclose(
                np.asarray(six[:, 2 * e + 1]), np.asarray(o1), rtol=1e-4,
                atol=scale * 1e-5, err_msg=f'(e={e}, a={a}, c1)')


def test_outsweep_kernel_matches_compact():
    """Out-sweep kernel (discovery + per-row compaction + sweep) vs the
    XLA compacted path, full gradient comparison on the teapot."""
    is_ = 128
    fc = _scene(is_)
    s_kernel = RasterizeSettings(
        image_size=is_, return_rgb=False, return_alpha=True,
        return_depth=False, runtime_checks=False, grad_out_cap=8192,
        grad_row_cap=128)
    fim, _ = jax.jit(
        lambda f: forward_xla.forward_face_index_map(s_kernel, f))(fc)
    face_w = jax.jit(forward_xla.gather_face_rows)(fc, fim)
    alpha = (fim >= 0).astype(jnp.float32)
    rgbm = jnp.zeros(alpha.shape + (3,))
    ga = jax.random.normal(jax.random.PRNGKey(3), alpha.shape)
    grgb = jnp.zeros_like(rgbm)

    def grad_with(s):
        return jax.jit(lambda: backward.grad_faces_pixel_map(
            s, fc, fim, face_w, rgbm, alpha, grgb, ga))()

    g_kernel = np.asarray(grad_with(s_kernel))
    if jax.default_backend() != 'tpu':
        return  # kernel unsupported; grad_with already ran the XLA path
    # force the XLA compact path by an unsupported-for-kernel config?
    # instead compare against the dense/exact path
    s_dense = dataclasses.replace(s_kernel, grad_out_cap=None)
    g_dense = np.asarray(grad_with(s_dense))
    scale = np.abs(g_dense).max() + 1e-9
    np.testing.assert_allclose(g_kernel, g_dense, rtol=1e-4,
                               atol=scale * 1e-5)
    assert np.abs(g_dense).max() > 0


def test_insweep_kernel_silhouette_mode():
    """return_rgb=False path (alpha-only dg)."""
    is_ = 128
    fc = _scene(is_)
    s = RasterizeSettings(image_size=is_, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False, grad_offset_radius=16)
    fim, _ = jax.jit(
        lambda f: forward_xla.forward_face_index_map(s, f))(fc)
    face_w = jax.jit(forward_xla.gather_face_rows)(fc, fim)
    ppx = geometry.to_pixel_coords(face_w[..., 0], is_)
    ppy = geometry.to_pixel_coords(face_w[..., 1], is_)
    alpha = (fim >= 0).astype(jnp.float32)
    ga = jax.random.normal(jax.random.PRNGKey(0), alpha.shape)

    interpret = jax.default_backend() != 'tpu'
    outs, ow = jax.jit(lambda *a: backward_pallas.insweep_channels(
        s, 1, *a, interpret=interpret))(ppx, ppy, alpha, ga)
    assert outs.shape == (fc.shape[0], 6, is_, is_)
    total = float(jnp.abs(outs).sum())
    assert np.isfinite(total) and total > 0
    # the kernel's self-measured offset stat honors its own exactness
    # contract on this fitting scene
    assert 0 < int(ow) <= s.grad_offset_radius


def test_csr_partials_interpret():
    """CSR partial reduction == global per-pixel segment_sum (interpret
    mode; runs on any backend)."""
    is_, nf, nc = 64, 24, 5
    key = jax.random.PRNGKey(7)
    fc = jax.random.uniform(key, (1, nf, 3, 3), minval=-0.9, maxval=0.9)
    fc = fc.at[..., 2].set(1.0 + 0.3 * fc[..., 2])        # z in front range
    s = RasterizeSettings(image_size=is_, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False, backend='pallas',
                          grad_csr_rows=128 * 18)
    from neural_renderer_tpu.rasterize import forward_pallas
    out = forward_pallas.forward_shaded(s, fc, interpret=True)
    need = int(np.asarray(forward_pallas.csr_rows_needed(s, fc)))
    assert need <= s.grad_csr_rows

    chan = jax.random.normal(jax.random.PRNGKey(8), (1, is_, is_, nc))
    cap = forward_pallas.chunk_capacity(s, nf)
    partials = backward_pallas.csr_partial_channels(
        s, chan.transpose(0, 3, 1, 2), out['csr_pos'], out['csr_counts'],
        out['csr_base'], cap, interpret=True)
    got = jax.ops.segment_sum(partials, out['csr_gseg'],
                              num_segments=nf + 1)[:-1]

    fim = out['face_index_map']
    seg = jnp.where(fim >= 0, fim, nf).reshape(-1)
    want = jax.ops.segment_sum(chan.reshape(-1, nc), seg,
                               num_segments=nf + 1)[:-1]
    assert int(np.asarray((fim >= 0).sum())) > 0
    scale = float(np.abs(np.asarray(want)).max()) + 1e-9
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=scale * 1e-6)


def test_csr_expand_interpret():
    """In-kernel K6 cell expansion == XLA-expanded cells through the
    global segment_sum (interpret mode; runs on any backend).  Covers the
    factor layout, the (c2, ch)-major kernel column order, and
    csr_expand_perm for ts 2 and 4."""
    is_, nf = 128, 24
    key = jax.random.PRNGKey(9)
    fc = jax.random.uniform(key, (1, nf, 3, 3), minval=-0.9, maxval=0.9)
    fc = fc.at[..., 2].set(1.0 + 0.3 * fc[..., 2])
    s = RasterizeSettings(image_size=is_, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False, backend='pallas',
                          grad_csr_rows=128 * 24)
    from neural_renderer_tpu.rasterize import forward_pallas
    out = forward_pallas.forward_shaded(s, fc, interpret=True)
    cap = forward_pallas.chunk_capacity(s, nf)
    fim = out['face_index_map']
    seg = jnp.where(fim >= 0, fim, nf).reshape(-1)

    for ts in (2, 4):
        n01, na2 = ts * ts, ts
        naux = n01 + na2 + 3
        nbase = 2
        chan = jax.random.normal(jax.random.PRNGKey(10 + ts),
                                 (1, is_, is_, nbase + naux))
        partials = backward_pallas.csr_partial_channels(
            s, chan.transpose(0, 3, 1, 2), out['csr_pos'],
            out['csr_counts'], out['csr_base'], cap, interpret=True,
            expand=(n01, na2))
        got = jax.ops.segment_sum(partials, out['csr_gseg'],
                                  num_segments=nf + 1)[:-1]
        # XLA reference: expand per pixel in the same multiply order
        base = chan[..., :nbase]
        u = chan[..., nbase:nbase + n01]
        av = chan[..., nbase + n01:nbase + n01 + na2]
        gm = chan[..., nbase + n01 + na2:]
        cells = []
        for j in range(na2):
            tj = u * av[..., j:j + 1]
            for ch in range(3):
                cells.append(tj * gm[..., ch:ch + 1])
        full = jnp.concatenate([base] + cells, axis=-1)
        want = jax.ops.segment_sum(full.reshape(-1, full.shape[-1]), seg,
                                   num_segments=nf + 1)[:-1]
        scale = float(np.abs(np.asarray(want)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=scale * 1e-6,
                                   err_msg=f'ts={ts}')
        # the perm maps kernel columns back to cube cell order: compare
        # against a direct cube-order expansion
        perm = backward_pallas.csr_expand_perm(ts)
        k6 = np.asarray(got[:, nbase:])[:, perm]
        cube = []
        for i01 in range(n01):
            for c2 in range(na2):
                tj = u[..., i01:i01 + 1] * av[..., c2:c2 + 1]
                for ch in range(3):
                    cube.append(tj * gm[..., ch:ch + 1])
        cube = jnp.concatenate(cube, axis=-1)
        want_cube = jax.ops.segment_sum(
            cube.reshape(-1, cube.shape[-1]), seg,
            num_segments=nf + 1)[:-1]
        np.testing.assert_allclose(k6, np.asarray(want_cube), rtol=1e-5,
                                   atol=scale * 1e-6, err_msg=f'ts={ts}')


def test_texture_cell_factors_finite_at_uncovered():
    """Uncovered pixels have tif = 0 * (far / z=0) = NaN; every factor
    channel must still be exactly 0 there — a NaN reaching the CSR
    kernel's one-hot MXU dot poisons whole partial columns (0 * NaN is
    NaN on the MXU).  Regression for a bug that silently NaN'd ts=4
    texture gradients on the production path."""
    s = RasterizeSettings(image_size=64, return_rgb=True, return_alpha=True,
                          return_depth=False, runtime_checks=False)
    fim = jnp.full((1, 64, 64), -1, jnp.int32).at[0, 10, 10].set(0)
    face_w = jnp.zeros((1, 64, 64, 3, 3))          # z = 0 everywhere
    face_w = face_w.at[0, 10, 10, :, 2].set(1.0)   # covered pixel sane
    wm = jnp.zeros((1, 64, 64, 3)).at[0, 10, 10].set(1 / 3)
    dm = jnp.full((1, 64, 64), 100.0).at[0, 10, 10].set(1.0)
    g = jnp.ones((1, 64, 64, 3))
    for ts in (2, 4):
        fac = np.asarray(tex.texture_cell_factors(s, fim, face_w, wm, dm,
                                                  g, ts))            # [1,C,64,64]
        assert np.isfinite(fac).all(), ts
        uncov = np.ones((64, 64), bool)
        uncov[10, 10] = False
        assert (fac[0][:, uncov] == 0).all(), ts
        assert np.abs(fac[0, :, 10, 10]).sum() > 0, ts


def test_csr_reduction_matches_global_gradients():
    """Full rasterize_core gradients: CSR face reduction vs the global
    segment_sum (TPU only — core only selects the CSR path there)."""
    if jax.default_backend() != 'tpu':
        return
    from neural_renderer_tpu.rasterize import core as rcore
    from neural_renderer_tpu.rasterize import forward_pallas
    is_ = 128
    fc = _scene(is_)
    bs, nf = fc.shape[:2]
    tx = jax.random.uniform(jax.random.PRNGKey(5),
                            (bs, nf, 2, 2, 2, 3)).astype(jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)
    kw = dict(image_size=is_, return_rgb=True, return_alpha=True,
              return_depth=False, runtime_checks=False, grad_out_cap=8192,
              grad_offset_radius=16, backend='pallas')
    s0 = RasterizeSettings(**kw)
    need = int(np.asarray(jax.jit(
        lambda a: forward_pallas.csr_rows_needed(s0, a))(fc)))
    s1 = RasterizeSettings(**kw, grad_csr_rows=-(-need // 128) * 128)

    def grads(s):
        def loss(a, t):
            from neural_renderer_tpu.rasterize.core import rasterize_core
            rgb, al, _ = rasterize_core(s, a, t, bg)
            return jnp.sum(rgb * jnp.cos(rgb)) + 1.7 * jnp.sum(al)
        return jax.jit(jax.grad(loss, argnums=(0, 1)))(fc, tx)

    g0 = grads(s0)
    g1 = grads(s1)
    for name, a, b in (('faces', g0[0], g1[0]), ('textures', g0[1], g1[1])):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-9
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=scale * 1e-5,
                                   err_msg=name)
        assert np.abs(a).max() > 0


def test_outsweep_windowed_fetch_matches_dense():
    """is >= _WINT*2*128 = 512 activates the per-edge windowed record
    fetch (with per-row full-width fallback); gradients must match the
    dense/exact out-sweep.  TPU only (the kernel is TPU-gated).

    512 (not 256) is load-bearing: at 256 the kernel silently takes the
    full-width fallback for every row and the windowed path goes untested.
    """
    if jax.default_backend() != 'tpu':
        return
    is_ = 512
    assert is_ >= backward_pallas._WINT * 2 * backward_pallas._LANE
    fc = _scene(is_)
    s_kernel = RasterizeSettings(
        image_size=is_, return_rgb=False, return_alpha=True,
        return_depth=False, runtime_checks=False, grad_out_cap=8192,
        grad_row_cap=256)
    fim, _ = jax.jit(
        lambda f: forward_xla.forward_face_index_map(s_kernel, f))(fc)
    face_w = jax.jit(forward_xla.gather_face_rows)(fc, fim)
    alpha = (fim >= 0).astype(jnp.float32)
    rgbm = jnp.zeros(alpha.shape + (3,))
    ga = jax.random.normal(jax.random.PRNGKey(11), alpha.shape)
    grgb = jnp.zeros_like(rgbm)

    def grad_with(s):
        return jax.jit(lambda: backward.grad_faces_pixel_map(
            s, fc, fim, face_w, rgbm, alpha, grgb, ga))()

    g_kernel = np.asarray(grad_with(s_kernel))
    s_dense = dataclasses.replace(s_kernel, grad_out_cap=None)
    g_dense = np.asarray(grad_with(s_dense))
    scale = np.abs(g_dense).max() + 1e-9
    np.testing.assert_allclose(g_kernel, g_dense, rtol=1e-4,
                               atol=scale * 1e-5)
    assert np.abs(g_dense).max() > 0


def test_grad_faces_pixel_map_matches_fused_path():
    """grad_faces_pixel_map (the standalone entry point) must equal the
    production core._bwd fused reduction — pins the stack layout of the
    standalone path so a channel-leading/channel-minor mismatch between
    the two reductions (ADVICE r4 high) cannot recur.
    """
    from neural_renderer_tpu.rasterize import core

    is_ = 128
    fc = _scene(is_)
    bs, nf = fc.shape[:2]
    s = RasterizeSettings(image_size=is_, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False)
    textures = jnp.zeros((bs, nf, 1, 1, 1, 3), jnp.float32)
    background = jnp.zeros((3,), jnp.float32)
    ga = jax.random.normal(jax.random.PRNGKey(5), (bs, is_, is_))

    def loss(f):
        _, alpha, _ = core.rasterize_core(s, f, textures, background)
        return jnp.sum(alpha * ga)

    g_fused = np.asarray(jax.jit(jax.grad(loss))(fc))

    fim, _ = jax.jit(
        lambda f: forward_xla.forward_face_index_map(s, f))(fc)
    face_w = jax.jit(forward_xla.gather_face_rows)(fc, fim)
    alpha = (fim >= 0).astype(jnp.float32)
    rgbm = jnp.zeros(alpha.shape + (3,))
    # inputs must be jit ARGUMENTS, not closure constants: a nullary jit
    # lets XLA constant-fold the crossing math on the host evaluator,
    # whose float arithmetic differs from the TPU by ULPs — and K5's
    # exact d1_in == d1 activation comparisons flip on those ULPs
    g_standalone = np.asarray(jax.jit(
        lambda f, i, w, a, g: backward.grad_faces_pixel_map(
            s, f, i, w, rgbm, a, jnp.zeros_like(rgbm), g))(
        fc, fim, face_w, alpha, ga))

    scale = np.abs(g_fused).max() + 1e-9
    assert scale > 1e-6          # non-trivial gradient
    np.testing.assert_allclose(g_standalone, g_fused, rtol=1e-4,
                               atol=scale * 1e-5)
