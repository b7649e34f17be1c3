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


def test_multipass_csr_grad_matches_global_interpret():
    """Per-slice CSR reduction on the multi-pass backward (interpret mode):
    full rasterize_core gradients with grad_csr_rows set over a 3-slice
    mesh must match the capacity-free global segment reduction — the merge
    re-points losing slices' position maps at the no-slot marker, so each
    pixel's channels land on exactly its global winner's face."""
    import dataclasses

    from neural_renderer_tpu.rasterize import backward_pallas

    is_, nf, bs = 128, 300, 2
    fc = _random_scene(nf, bs=bs)
    tx = jax.random.uniform(jax.random.PRNGKey(3),
                            (bs, nf, 2, 2, 2, 3)).astype(jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)
    ga = jax.random.normal(jax.random.PRNGKey(9), (bs, is_, is_, 3))

    kw = dict(image_size=is_, return_rgb=True, return_alpha=True,
              return_depth=False, runtime_checks=False, backend='pallas',
              grad_csr_rows=128 * 64)
    s_csr = RasterizeSettings(**kw)
    s_glob = dataclasses.replace(s_csr, grad_csr_rows=None)

    def interp(fn):
        return functools.partial(fn, interpret=True)

    patches = [
        mock.patch.object(forward_pallas, 'forward_shaded',
                          interp(forward_pallas.forward_shaded)),
        mock.patch.object(backward_pallas, 'csr_partial_channels',
                          interp(backward_pallas.csr_partial_channels)),
        mock.patch.object(forward_pallas, 'supported', lambda s, f: True),
        mock.patch.object(forward_pallas, 'slice_size',
                          lambda nfeat=None: 128),
    ]

    def grads(s):
        def loss(a, t):
            rgb, al, _ = core.rasterize_core(s, a, t, bg)
            return jnp.sum(rgb * ga) + 1.7 * jnp.sum(al)
        return jax.jit(jax.grad(loss, argnums=(0, 1)))(fc, tx)

    with patches[0], patches[1], patches[2], patches[3]:
        g_csr = grads(s_csr)
        # multipass must actually have emitted per-slice CSR artifacts
        maps = core._pallas_multipass_maps(s_csr, fc, tx, True)
        assert 'csr_slices' in maps and len(maps['csr_slices']) == 3
        g_glob = grads(s_glob)

    for name, a, b in (('faces', g_glob[0], g_csr[0]),
                       ('textures', g_glob[1], g_csr[1])):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-9
        assert np.abs(a).max() > 0
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=scale * 1e-5,
                                   err_msg=name)
