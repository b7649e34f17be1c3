"""OBJ saving tests (reference tests/test_save_obj.py)."""

import os

import numpy as np

import neural_renderer_tpu as nr
from utils import DATA_DIR


def test_save_obj_roundtrip(tmp_path):
    path = os.path.join(DATA_DIR, 'teapot.obj')
    vertices, faces = nr.load_obj(path)
    out = str(tmp_path / 'teapot2.obj')
    nr.save_obj(out, vertices, faces)
    vertices2, faces2 = nr.load_obj(out)
    assert np.allclose(vertices, vertices2)
    assert np.allclose(faces, faces2)


def test_save_obj_textured_roundtrip(tmp_path):
    """Textured save -> load roundtrip: flat-colored cubes must survive the
    atlas bake + reload within quantization tolerance (K9/K10 + K8)."""
    vertices = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], 'float32')
    faces = np.array([[0, 1, 2], [1, 2, 3]], 'int32')
    colors = np.array([[0.8, 0.2, 0.1], [0.1, 0.9, 0.3]], 'float32')
    textures = np.broadcast_to(
        colors[:, None, None, None, :], (2, 4, 4, 4, 3)).copy()

    out = str(tmp_path / 'mesh.obj')
    nr.save_obj(out, vertices, faces, textures)
    assert os.path.exists(str(tmp_path / 'mesh.mtl'))
    assert os.path.exists(str(tmp_path / 'mesh.png'))

    v2, f2, t2 = nr.load_obj(out, normalization=False, texture_size=4,
                             load_texture=True)
    assert np.allclose(vertices, v2)
    assert np.allclose(faces, f2)
    for i in range(2):
        np.testing.assert_allclose(
            t2[i].reshape(-1, 3).mean(0), colors[i], atol=0.05)


def test_create_texture_image_shapes():
    textures = np.random.RandomState(0).uniform(
        size=(5, 4, 4, 4, 3)).astype('float32')
    image, uv = nr.create_texture_image(textures, texture_size_out=16)
    assert uv.shape == (5, 3, 2)
    assert image.ndim == 3 and image.shape[2] == 3
    assert (uv >= 0).all() and (uv <= 1).all()
