"""Approximate-gradient anti-aliasing (``anti_aliasing='approx'``).

Contract (api.py rasterize_rgbad): values are bit-identical to
``anti_aliasing=True`` (the same 2x supersampled forward), while gradients
equal those of the un-antialiased 1x render — the K5/K6/K7 backward (the
expensive side) runs at a quarter of the 2x pixel count.  The reference's
vertex gradients are themselves defined approximations
(reference rasterize.py:517-748), so 'approx' changes which resolution that
definition is evaluated at, not its semantics.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

import neural_renderer_tpu as nr

DATA = os.path.join(os.path.dirname(__file__), 'data')


def _scene():
    v, f = nr.load_obj(os.path.join(DATA, 'teapot.obj'))
    eye = jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30.0), np.float32(45.0)))
    ff = jnp.asarray(np.asarray(f))[None]
    ff = jnp.concatenate([ff, ff[:, :, ::-1]], axis=1)   # fill_back
    fc = nr.vertices_to_faces(
        nr.perspective(nr.look_at(jnp.asarray(v)[None], eye), 30.0), ff)
    rng = np.random.RandomState(0)
    tx = jnp.asarray(rng.uniform(0, 1, (1, ff.shape[1], 2, 2, 2, 3))
                     .astype('float32'))
    return fc, tx


def test_approx_aa_values_match_exact_aa():
    fc, tx = _scene()
    is_ = 64
    exact = jax.jit(lambda a, t: nr.rasterize_rgbad(
        a, t, is_, True, background_color=(0.2, 0.3, 0.4)))(fc, tx)
    approx = jax.jit(lambda a, t: nr.rasterize_rgbad(
        a, t, is_, 'approx', background_color=(0.2, 0.3, 0.4)))(fc, tx)
    for k in ('rgb', 'alpha', 'depth'):
        np.testing.assert_array_equal(np.asarray(exact[k]),
                                      np.asarray(approx[k]), err_msg=k)
    assert float(np.asarray(exact['alpha']).max()) == 1.0
    # AA actually engaged: fractional coverage exists at the silhouette
    a = np.asarray(exact['alpha'])
    assert ((a > 0) & (a < 1)).sum() > 10


def test_approx_aa_grads_match_1x_render():
    fc, tx = _scene()
    is_ = 64

    def loss(mode):
        def f(a, t):
            out = nr.rasterize_rgbad(a, t, is_, mode)
            return (jnp.sum(out['rgb'] * 0.3) + jnp.sum(out['alpha'])
                    + jnp.sum(out['depth'] * 0.01))
        return jax.jit(jax.grad(f, argnums=(0, 1)))

    ga_f, gt_f = loss(False)(fc, tx)
    ga_a, gt_a = loss('approx')(fc, tx)
    np.testing.assert_array_equal(np.asarray(ga_f), np.asarray(ga_a))
    np.testing.assert_array_equal(np.asarray(gt_f), np.asarray(gt_a))
    assert float(jnp.abs(ga_a).max()) > 0
    assert float(jnp.abs(gt_a).max()) > 0


def test_tune_with_approx_aa():
    """tune() under anti_aliasing='approx' measures binning at BOTH render
    sizes (2x value pass + 1x grad pass) and the backward capacities at
    the 1x size the backward actually runs; the tuned renderer's output
    stays bit-identical to the untuned one."""
    v, f = nr.load_obj(os.path.join(DATA, 'teapot.obj'))
    vb = jnp.asarray(v)[None]
    fb = jnp.asarray(np.asarray(f))[None]
    eye = nr.get_points_from_angles(
        np.float32(2.732), np.float32(30.0), np.float32(90.0))

    r = nr.Renderer()
    r.image_size = 64
    r.anti_aliasing = 'approx'
    r.eye = eye
    overrides = nr.tune(r, vb, fb, eyes=[jnp.asarray(eye)])
    assert overrides['grad_out_cap'] > 0
    assert r.perf_overrides['grad_out_cap'] == overrides['grad_out_cap']

    plain = nr.Renderer()
    plain.image_size = 64
    plain.anti_aliasing = 'approx'
    plain.eye = eye
    want = jax.jit(plain.render_silhouettes)(vb, fb)
    got = jax.jit(r.render_silhouettes)(vb, fb)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    g = jax.jit(jax.grad(
        lambda vv: jnp.sum(r.render_silhouettes(vv, fb))))(vb)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_renderer_approx_aa_end_to_end():
    v, f = nr.load_obj(os.path.join(DATA, 'teapot.obj'))
    vb = jnp.asarray(v)[None]
    fb = jnp.asarray(np.asarray(f))[None]

    r_exact = nr.Renderer()
    r_approx = nr.Renderer()
    for r in (r_exact, r_approx):
        r.image_size = 64
        r.eye = nr.get_points_from_angles(
            np.float32(2.732), np.float32(30.0), np.float32(90.0))
    r_approx.anti_aliasing = 'approx'

    sil_e = jax.jit(r_exact.render_silhouettes)(vb, fb)
    sil_a = jax.jit(r_approx.render_silhouettes)(vb, fb)
    np.testing.assert_array_equal(np.asarray(sil_e), np.asarray(sil_a))

    g = jax.jit(jax.grad(
        lambda vv: jnp.sum(r_approx.render_silhouettes(vv, fb))))(vb)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
