"""Large-mesh multi-pass forward: face slices beyond the per-pass VMEM
budget must merge to EXACTLY the single-pass (and oracle) result, first-wins
tie rule included (reference K3 handles arbitrary nf by just looping more,
rasterize.py:300; the slice merge must be invisible)."""

import functools
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_renderer_tpu as nr
from neural_renderer_tpu.rasterize import core, forward_pallas, forward_xla
from neural_renderer_tpu.rasterize.config import RasterizeSettings


def _random_scene(nf, bs=2, seed=7, dup=True):
    key = jax.random.PRNGKey(seed)
    fc = jax.random.uniform(key, (bs, nf, 3, 3), minval=-0.9, maxval=0.9)
    fc = fc.at[..., 2].set(1.0 + 0.3 * fc[..., 2])
    if dup and nf >= 40:
        # duplicated geometry across slice boundaries: exact z ties whose
        # winner must be the LOWER original id regardless of slicing
        fc = fc.at[:, -10:].set(fc[:, 10:20])
    return fc


def test_multipass_matches_single_pass_interpret():
    """Shrunken slice size (128 faces/pass) in interpret mode: the merged
    multi-pass maps must be bit-identical to one pass over the full list."""
    is_, nf = 64, 300
    fc = _random_scene(nf)
    tx = jax.random.uniform(jax.random.PRNGKey(1),
                            (2, nf, 2, 2, 2, 3)).astype(jnp.float32)
    s = RasterizeSettings(image_size=is_, return_rgb=True,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False, backend='pallas')

    orig = forward_pallas.forward_shaded
    interp = functools.partial(orig, interpret=True)
    with mock.patch.object(forward_pallas, 'forward_shaded', interp), \
            mock.patch.object(forward_pallas, 'slice_size',
                              lambda nfeat=None: 128):
        multi = core._pallas_multipass_maps(s, fc, tx, True)
    with mock.patch.object(forward_pallas, 'forward_shaded', interp):
        single = core._pallas_forward_maps(s, fc, tx, True)

    assert int(np.asarray((single['face_index_map'] >= 0).sum())) > 1000
    for k in ('face_index_map', 'depth_map', 'weight_map', 'face_w',
              'rgb_raw'):
        assert np.array_equal(np.asarray(multi[k]), np.asarray(single[k])), k


def test_multipass_index_map_interpret():
    """Same for the plain face-index-map kernel (tune's measurement path)."""
    is_, nf = 64, 300
    fc = _random_scene(nf)
    s = RasterizeSettings(image_size=is_, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False, backend='pallas')
    orig = forward_pallas.forward_face_index_map
    interp = functools.partial(orig, interpret=True)
    with mock.patch.object(forward_pallas, 'slice_size',
                           lambda nfeat=None: 128):
        mi, md = interp(s, fc)
    si, sd = interp(s, fc)
    assert np.array_equal(np.asarray(mi), np.asarray(si))
    assert np.array_equal(np.asarray(md), np.asarray(sd))


def test_100k_face_mesh_matches_oracle_tpu():
    """>= 100k faces (many multi-pass slices) must stay bit-exact vs the
    streaming XLA oracle — the reference K3's arbitrary-nf contract
    (rasterize.py:300) at ShapeNet/scan scale."""
    if jax.default_backend() != 'tpu':
        pytest.skip('needs the TPU chip (compiled Mosaic path)')
    is_, nf = 128, 104_000
    fc = _random_scene(nf, bs=1, dup=True)
    s = RasterizeSettings(image_size=is_, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False, backend='pallas')
    mi, _ = jax.jit(lambda a: forward_pallas.forward_face_index_map(s, a))(fc)
    oi, _ = jax.jit(lambda a: forward_xla.forward_face_index_map(s, a))(fc)
    assert np.array_equal(np.asarray(mi), np.asarray(oi))
    assert int(np.asarray((oi >= 0).sum())) > 1000


def test_large_mesh_renders_and_differentiates_tpu():
    """A > slice_size mesh must ride the Pallas multi-pass path on TPU:
    the winner map equals the XLA oracle's exactly, and full silhouette
    gradients match the capacity-free dense reference."""
    if jax.default_backend() != 'tpu':
        pytest.skip('needs the TPU chip (compiled Mosaic path)')
    is_ = 128
    nf = forward_pallas.slice_size() + 4000        # 2 passes
    fc = _random_scene(nf, bs=1, dup=True)
    s = RasterizeSettings(image_size=is_, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False, backend='pallas')

    mi, _ = jax.jit(lambda a: forward_pallas.forward_face_index_map(s, a))(fc)
    oi, _ = jax.jit(lambda a: forward_xla.forward_face_index_map(s, a))(fc)
    assert np.array_equal(np.asarray(mi), np.asarray(oi)), (
        'multi-pass winner map differs from the oracle')
    assert int(np.asarray((oi >= 0).sum())) > 1000

    ga_seed = jax.random.normal(jax.random.PRNGKey(4), (1, is_, is_))

    def loss(fc, overrides):
        sil = nr.rasterize_silhouettes(
            fc, image_size=is_, anti_aliasing=False, runtime_checks=False,
            **overrides)
        return jnp.sum(sil * ga_seed)

    g_auto = jax.jit(jax.grad(lambda a: loss(a, {})))(fc)
    g_ref = jax.jit(jax.grad(lambda a: loss(
        a, dict(backend='xla', auto_fast=False))))(fc)
    g_auto, g_ref = np.asarray(g_auto), np.asarray(g_ref)
    scale = np.abs(g_ref).max() + 1e-9
    assert np.abs(g_ref).max() > 0
    np.testing.assert_allclose(g_auto, g_ref, rtol=1e-4, atol=scale * 1e-5)
