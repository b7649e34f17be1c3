"""The auto fast path (default settings, no tuning) must be EXACT: the
Pallas kernels + CSR reduction engage behind runtime guards, and gradients
must equal the capacity-free dense reference paths bit-for-bit up to
summation order — both when the guards pass (kernel branches) and when a
scene exceeds an auto capacity (fallback branches).

TPU only: the auto path gates on the TPU backend (CPU keeps the dense
paths, covered by every other test)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

import neural_renderer_tpu as nr
from neural_renderer_tpu.rasterize.config import RasterizeSettings, \
    auto_offset_radius
from utils import DATA_DIR


def _tpu():
    return jax.default_backend() == 'tpu'


def _teapot(bs=2):
    v, f = nr.load_obj(os.path.join(DATA_DIR, 'teapot.obj'))
    v = jnp.asarray(np.tile(v[None], (bs, 1, 1)))
    f = jnp.asarray(np.tile(f[None], (bs, 1, 1)))
    return v, f


def _grads(image_size, mode, overrides, v, f, tx=None):
    renderer = nr.Renderer()
    renderer.image_size = image_size
    renderer.perf_overrides = dict(overrides, runtime_checks=False)
    renderer.eye = nr.get_points_from_angles(
        np.float32(2.732), np.float32(30.0), np.float32(42.0))

    if mode == 'textured':
        def loss(v, tx):
            img = renderer.render(v, f, tx)
            return jnp.sum(img * jnp.cos(img))
        return jax.jit(jax.grad(loss, argnums=(0, 1)))(v, tx)
    if mode == 'silhouettes':
        def loss(v):
            img = renderer.render_silhouettes(v, f)
            return jnp.sum(jnp.square(img - 0.3))
        return (jax.jit(jax.grad(loss))(v),)
    def loss(v):
        return jnp.sum(jnp.sin(renderer.render_depth(v, f)))
    return (jax.jit(jax.grad(loss))(v),)


def _assert_close(got, want, names):
    for g, w, n in zip(got, want, names):
        g, w = np.asarray(g), np.asarray(w)
        scale = np.abs(w).max() + 1e-9
        assert np.abs(w).max() > 0, f'{n}: reference grad is all zero'
        np.testing.assert_allclose(g, w, rtol=1e-4, atol=scale * 1e-5,
                                   err_msg=n)


def test_auto_default_matches_dense_teapot():
    """Default Renderer (auto fast path, guards pass -> kernel branches)
    vs the dense XLA reference, all three render modes."""
    if not _tpu():
        return
    v, f = _teapot()
    tx = jax.random.uniform(jax.random.PRNGKey(0),
                            (2, f.shape[1], 2, 2, 2, 3)).astype(jnp.float32)
    for mode in ('silhouettes', 'textured', 'depth'):
        auto = _grads(64, mode, {}, v, f, tx)   # render 128 with AA
        ref = _grads(64, mode, dict(backend='xla', auto_fast=False),
                     v, f, tx)
        _assert_close(auto, ref, [f'{mode}:vertices', f'{mode}:textures'])


def test_auto_offset_guard_falls_back_exactly():
    """A face bigger than the auto offset radius must trip the in-sweep
    guard (XLA exact-gather branch) and still match the dense path."""
    if not _tpu():
        return
    is_ = 128
    assert auto_offset_radius(is_) == 16
    # one screen-filling triangle (span >> 16 px) + a small one
    fc = jnp.asarray([[
        [[-0.9, -0.9, 1.0], [0.9, -0.8, 1.0], [0.0, 0.9, 1.0]],
        [[0.1, 0.1, 0.8], [0.3, 0.1, 0.8], [0.2, 0.3, 0.8]],
    ]], jnp.float32)
    ga_seed = jax.random.normal(jax.random.PRNGKey(1), (1, is_, is_))

    def loss(fc, overrides):
        sil = nr.rasterize_silhouettes(
            fc, image_size=is_, anti_aliasing=False, runtime_checks=False,
            **overrides)
        return jnp.sum(sil * ga_seed)

    g_auto = jax.jit(jax.grad(lambda a: loss(a, {})))(fc)
    g_ref = jax.jit(jax.grad(lambda a: loss(
        a, dict(backend='xla', auto_fast=False))))(fc)
    _assert_close([g_auto], [g_ref], ['faces'])


def test_auto_csr_guard_falls_back_exactly():
    """A scene needing more CSR chunks than the static auto capacity must
    trip csr_valid (global segment reduction branch) and still match."""
    if not _tpu():
        return
    is_ = 128
    nf = 6000
    key = jax.random.PRNGKey(3)
    # many small faces spread across every patch: each patch bins ~hundreds
    # of faces -> sum(ceil(count/128)) chunks far beyond auto_csr_rows
    centers = jax.random.uniform(key, (1, nf, 1, 2), minval=-0.95,
                                 maxval=0.95)
    offs = jnp.asarray([[[0.0, 0.0], [0.03, 0.0], [0.0, 0.03]]]) \
        .reshape(1, 1, 3, 2)
    xy = centers + offs
    z = 1.0 + jax.random.uniform(key, (1, nf, 1, 1)) * 0.5
    fc = jnp.concatenate([xy, jnp.broadcast_to(z, (1, nf, 3, 1))], axis=-1)
    ga_seed = jax.random.normal(jax.random.PRNGKey(4), (1, is_, is_))

    from neural_renderer_tpu.rasterize import forward_pallas
    from neural_renderer_tpu.rasterize.config import auto_csr_rows
    s = RasterizeSettings(image_size=is_, return_rgb=False,
                          return_alpha=True, return_depth=False)
    needed = int(np.asarray(jax.jit(
        lambda a: forward_pallas.csr_rows_needed(s, a))(fc)))
    assert needed > auto_csr_rows(is_, 1), (
        f'scene too small to trip the CSR guard: {needed}')

    def loss(fc, overrides):
        sil = nr.rasterize_silhouettes(
            fc, image_size=is_, anti_aliasing=False, runtime_checks=False,
            **overrides)
        return jnp.sum(sil * ga_seed)

    g_auto = jax.jit(jax.grad(lambda a: loss(a, {})))(fc)
    g_ref = jax.jit(jax.grad(lambda a: loss(
        a, dict(backend='xla', auto_fast=False))))(fc)
    _assert_close([g_auto], [g_ref], ['faces'])


def test_small_image_backward_compiles_and_matches():
    """Regression: sub-128 renders (un-antialiased 64^2, and the 1x grad
    pass of anti_aliasing='approx') must not engage the CSR reduction —
    backward_pallas._csr_kernel's dynamic lane rotation needs full
    128-lane channel blocks and Mosaic rejects it at 64 lanes
    ('unsupported unaligned shape' tpu.dynamic_rotate).  The auto path
    gates on forward_pallas.csr_supported and an explicit grad_csr_rows
    is dropped (perf knob, not semantics); gradients must still match the
    dense XLA path."""
    if not _tpu():
        return
    v, f = _teapot(bs=1)
    fc = nr.vertices_to_faces(
        nr.perspective(nr.look_at(v, nr.get_points_from_angles(
            np.float32(2.732), np.float32(30.0), np.float32(45.0)))),
        jnp.concatenate([f, f[:, :, ::-1]], axis=1))
    ga_seed = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64))

    def loss(fc, overrides):
        sil = nr.rasterize_silhouettes(
            fc, image_size=64, anti_aliasing=False, runtime_checks=False,
            **overrides)
        return jnp.sum(sil * ga_seed)

    g_auto = jax.jit(jax.grad(lambda a: loss(a, {})))(fc)
    g_csr = jax.jit(jax.grad(lambda a: loss(          # explicit knob
        a, dict(grad_csr_rows=128 * 64))))(fc)
    g_ref = jax.jit(jax.grad(lambda a: loss(
        a, dict(backend='xla', auto_fast=False))))(fc)
    _assert_close([g_auto, g_csr], [g_ref, g_ref],
                  ['faces:auto', 'faces:explicit-csr'])
