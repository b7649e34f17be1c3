"""Spatial face ordering (ops/spatial.py) + the forward kernel's windowed
feature fetch.

The reorder is pure preprocessing: rendering must be IDENTICAL (the
one-hot MXU fetch is exact — a single addend per output — so windowed vs
full-width fetch is bit-equal; z-ties between coincident faces are the
only divergence, and the teapot has none).  The windowed path only
engages for nf_pad > _FWT * 128 faces, so these tests use the real teapot
(2464 faces, doubled to 4928 by fill_back) on the TPU backend.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_renderer_tpu as nr
from neural_renderer_tpu.rasterize import forward_pallas, forward_xla
from neural_renderer_tpu.rasterize.config import RasterizeSettings

DATA = os.path.join(os.path.dirname(__file__), 'data')


def test_face_spatial_order_is_permutation():
    v, f = nr.load_obj(os.path.join(DATA, 'teapot.obj'))
    perm = nr.face_spatial_order(v, f)
    nf = f.shape[0]
    assert perm.shape == (nf,)
    assert np.array_equal(np.sort(perm), np.arange(nf))

    # locality: successive faces must sit near each other in space (this
    # is the whole point of the sort)
    fs, _, _ = nr.spatial_sort(v, f)
    c0 = np.asarray(v)[np.asarray(f)].mean(axis=1)
    c1 = np.asarray(v)[np.asarray(fs)].mean(axis=1)
    d0 = np.linalg.norm(np.diff(c0, axis=0), axis=1).mean()
    d1 = np.linalg.norm(np.diff(c1, axis=0), axis=1).mean()
    assert d1 < d0, (d0, d1)         # successive faces are near each other


def test_spatial_order_mesh_construction():
    """Mesh(spatial_order=True): faces/textures permuted together, and
    face_order survives pytree round-trips (it lives in static aux data —
    set_lr and tree_map rebuild the Mesh via tree_unflatten)."""
    v, f = nr.load_obj(os.path.join(DATA, 'teapot.obj'))
    rng = np.random.RandomState(0)
    tx = rng.uniform(0, 1, (f.shape[0], 2, 2, 2, 3)).astype('float32')
    m0 = nr.Mesh(vertices=jnp.asarray(v), textures=jnp.asarray(tx),
                 faces=f)
    m1 = nr.Mesh(vertices=jnp.asarray(v), textures=jnp.asarray(tx),
                 faces=f, spatial_order=True)
    assert not np.array_equal(np.asarray(m1.faces), np.asarray(f))
    assert np.array_equal(np.asarray(m1.faces),
                          np.asarray(f)[m1.face_order])
    assert np.array_equal(np.asarray(m1.textures),
                          np.asarray(tx)[m1.face_order])
    assert np.array_equal(m1.set_lr(0.1, 1.0).face_order, m1.face_order)
    m1rt = jax.tree.map(lambda x: x, m1)
    assert np.array_equal(m1rt.face_order, m1.face_order)
    assert m0.face_order is None


def test_spatial_order_mesh_renders_identically():
    if jax.default_backend() != 'tpu':
        pytest.skip('needs the TPU chip (compiled Mosaic path)')
    v, f = nr.load_obj(os.path.join(DATA, 'teapot.obj'))
    rng = np.random.RandomState(0)
    tx = rng.uniform(0, 1, (f.shape[0], 2, 2, 2, 3)).astype('float32')

    m0 = nr.Mesh(vertices=jnp.asarray(v), textures=jnp.asarray(tx),
                 faces=f)
    m1 = nr.Mesh(vertices=jnp.asarray(v), textures=jnp.asarray(tx),
                 faces=f, spatial_order=True)

    r = nr.Renderer()
    r.image_size = 128
    # windowed fetch on for BOTH meshes: runtime-gated, exact either way
    r.perf_overrides = dict(windowed_fetch=True)
    r.eye = nr.get_points_from_angles(
        np.float32(2.732), np.float32(30.0), np.float32(45.0))

    outs = []
    for m in (m0, m1):
        vb, fb, tb = m.get_batch(1)
        # bypass the sigmoid for determinism of the comparison inputs
        tb = jnp.broadcast_to(m.textures, (1,) + m.textures.shape)
        sil = jax.jit(r.render_silhouettes)(vb, fb)
        rgb = jax.jit(r.render)(vb, fb, tb)
        outs.append((np.asarray(sil), np.asarray(rgb)))

    assert np.array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_windowed_fetch_matches_oracle_interpret():
    """CPU interpret mode: the windowed fetch must be bit-equal to the
    oracle for ANY face order (the gate is a per-(patch, chunk) runtime
    check), including the two-segment mirror_split configuration the
    Renderer's fill_back doubling produces."""
    v, f = nr.load_obj(os.path.join(DATA, 'teapot.obj'))
    fs, _, _ = nr.spatial_sort(v, f)
    eye = jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30.0), np.float32(90.0)))
    is_ = 64
    for label, faces_np, mirrored in [
            ('unsorted', np.asarray(f), False),
            ('sorted', np.asarray(fs), False),
            ('sorted+mirror_split', np.asarray(fs), True)]:
        ff = jnp.asarray(faces_np)[None]
        split = None
        if mirrored:
            ff = jnp.concatenate([ff, ff[:, :, ::-1]], axis=1)
            split = faces_np.shape[0]
        fc = jax.jit(lambda vv, ff=ff: nr.vertices_to_faces(
            nr.perspective(nr.look_at(vv, eye), 30.0), ff))(
                jnp.asarray(v)[None])
        assert fc.shape[1] > forward_pallas._FWT * forward_pallas._CHUNK
        s = RasterizeSettings(image_size=is_, return_rgb=False,
                              return_alpha=True, return_depth=False,
                              runtime_checks=False, backend='pallas',
                              mirror_split=split, windowed_fetch=True)
        got = forward_pallas.forward_shaded(s, fc, interpret=True)[
            'face_index_map']
        want, _ = jax.jit(
            lambda a: forward_xla.forward_face_index_map(s, a))(fc)
        assert int(np.asarray((want >= 0).sum())) > 400
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=label)


def test_windowed_fetch_matches_oracle_on_sorted_teapot():
    if jax.default_backend() != 'tpu':
        pytest.skip('needs the TPU chip (compiled Mosaic path)')
    v, f = nr.load_obj(os.path.join(DATA, 'teapot.obj'))
    fs, _, _ = nr.spatial_sort(v, f)
    is_ = 256
    eye = jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30.0), np.float32(90.0)))
    f2 = jnp.concatenate([jnp.asarray(fs)[None],
                          jnp.asarray(fs)[None][:, :, ::-1]], axis=1)
    fc = jax.jit(lambda vv: nr.vertices_to_faces(
        nr.perspective(nr.look_at(vv, eye), 30.0), f2))(
            jnp.asarray(v)[None])
    assert fc.shape[1] > forward_pallas._FWT * forward_pallas._CHUNK

    s = RasterizeSettings(image_size=is_, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False, backend='pallas',
                          mirror_split=fs.shape[0], windowed_fetch=True)
    got = jax.jit(lambda a: forward_pallas.forward_shaded(
        s, a)['face_index_map'])(fc)
    want, _ = jax.jit(
        lambda a: forward_xla.forward_face_index_map(s, a))(fc)
    assert int(np.asarray((want >= 0).sum())) > 1000
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
