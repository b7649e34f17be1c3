"""OBJ loading tests (reference tests/test_load_obj.py)."""

import os

import jax
import numpy as np

import neural_renderer_tpu as nr
from utils import DATA_DIR


def test_tetrahedron():
    vertices_ref = np.array(
        [[1., 0., 0.], [0., 1., 0.], [0., 0., 1.], [0., 0., 0.]], 'float32')
    faces_ref = np.array(
        [[1, 3, 2], [3, 1, 0], [2, 0, 1], [0, 2, 3]], 'int32')

    path = os.path.join(DATA_DIR, 'tetrahedron.obj')
    vertices, faces = nr.load_obj(path, False)
    assert np.allclose(vertices_ref, vertices)
    assert np.allclose(faces_ref, faces)
    vertices, faces = nr.load_obj(path, True)
    assert np.allclose(vertices_ref * 2 - 1.0, vertices)
    assert np.allclose(faces_ref, faces)


def test_teapot():
    vertices, faces = nr.load_obj(os.path.join(DATA_DIR, 'teapot.obj'))
    assert faces.shape[0] == 2464
    assert vertices.shape[0] == 1292


def test_texture_loading(tmp_path):
    """Synthetic OBJ+MTL+PNG texture loading (the reference's ShapeNet asset
    was stripped from the mount; this covers the same K8 path)."""
    from neural_renderer_tpu.io.image import imsave

    # 2-color texture image: left red, right blue (before vertical flip)
    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :4] = [255, 0, 0]
    img[:, 4:] = [0, 0, 255]
    imsave(str(tmp_path / 'tex.png'), img)

    (tmp_path / 'model.mtl').write_text(
        'newmtl mat_tex\nmap_Kd tex.png\n'
        'newmtl mat_green\nKd 0.0 1.0 0.0\n')
    (tmp_path / 'model.obj').write_text(
        'mtllib model.mtl\n'
        'v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n'
        'vt 0.1 0.5\nvt 0.2 0.5\nvt 0.15 0.6\n'   # left (red) region
        'vt 0.8 0.5\nvt 0.9 0.5\nvt 0.85 0.6\n'   # right (blue) region
        'usemtl mat_tex\n'
        'f 1/1 2/2 3/3\n'
        'f 2/4 4/5 3/6\n'
        'usemtl mat_green\n'
        'f 1/1 2/2 4/3\n')

    vertices, faces, textures = nr.load_obj(
        str(tmp_path / 'model.obj'), normalization=False, texture_size=4,
        load_texture=True)
    assert textures.shape == (3, 4, 4, 4, 3)
    # face 0 samples the red region, face 1 the blue one, face 2 is flat Kd.
    assert textures[0, ..., 0].mean() > 0.9
    assert textures[0, ..., 2].mean() < 0.1
    assert textures[1, ..., 2].mean() > 0.9
    np.testing.assert_allclose(
        textures[2], np.broadcast_to([0., 1., 0.], textures[2].shape))


def test_texture_real_model():
    """Render a real multi-material ShapeNet model end-to-end (reference
    test_load_obj.test_texture, tests/test_load_obj.py:52-59 — which saved
    a PNG with no assertion; here the render is checked for sane coverage
    and texture color diversity)."""
    path = os.path.join(DATA_DIR, '4e49873292196f02574b5684eaec43e9',
                        'model.obj')
    vertices, faces, textures = nr.load_obj(
        path, load_texture=True, texture_size=4)
    assert vertices.ndim == 2 and vertices.shape[1] == 3
    assert faces.shape[1] == 3 and faces.shape[0] > 1000
    assert textures.shape == (faces.shape[0], 4, 4, 4, 3)
    assert np.isfinite(textures).all()
    assert 0.0 <= textures.min() and textures.max() <= 1.0
    # multi-material: textures must not be a single flat color
    assert textures.reshape(-1, 3).std(0).max() > 0.05

    renderer = nr.Renderer()
    renderer.eye = nr.get_points_from_angles(2, 15, -90)
    images = np.asarray(jax.jit(renderer.render)(
        vertices[None], faces[None], textures[None]))
    assert images.shape == (1, 3, 256, 256)
    assert np.isfinite(images).all()
    cover = (images.max(1) > 0.05).mean()
    assert 0.05 < cover < 0.9, f'implausible coverage {cover}'


def test_real_model_gradients_tuned():
    """Full forward+backward through per-scene-tuned fast paths on REAL
    scanned geometry (multi-material, duplicated/degenerate faces — the
    cases synthetic scenes miss).  On TPU this drives the Pallas + CSR
    kernels; elsewhere the exact XLA paths."""
    import jax.numpy as jnp
    path = os.path.join(DATA_DIR, '4e49873292196f02574b5684eaec43e9',
                        'model.obj')
    vertices, faces, textures = nr.load_obj(
        path, load_texture=True, texture_size=2)

    renderer = nr.Renderer()
    renderer.image_size = 128
    renderer.eye = nr.get_points_from_angles(2, 15, -90)
    overrides = nr.tune(renderer, vertices, faces)
    assert overrides['faces_per_tile_cap'] >= 128

    def loss(v, t):
        images = renderer.render(v, faces[None], t)
        return jnp.sum(images * jnp.sin(images))

    gv, gt = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        jnp.asarray(vertices)[None], jnp.asarray(textures)[None])
    gv, gt = np.asarray(gv), np.asarray(gt)
    assert np.isfinite(gv).all() and np.isfinite(gt).all()
    assert np.abs(gv).max() > 0
    assert np.abs(gt).max() > 0
    # gradients only where geometry is: uncovered texels get exact zeros
    assert (np.abs(gt).reshape(gt.shape[1], -1).max(1) == 0).any()
