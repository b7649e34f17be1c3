"""Spatial face ordering (ops/spatial.py).

The reorder is pure preprocessing: rendering must be IDENTICAL (z-ties
between coincident faces are the only divergence, and the teapot has
none).  The r3 windowed feature fetch this order originally fed was
removed in r4 (measured on-chip regression); the sort remains a
documented utility, so only order-invariance is pinned here.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_renderer_tpu as nr

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
