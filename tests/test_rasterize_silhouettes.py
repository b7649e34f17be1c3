"""Silhouette tests (reference tests/test_rasterize_silhouettes.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_renderer_tpu as nr
import utils


@pytest.fixture(scope='module')
def teapot_batch():
    return utils.load_teapot_batch()


def test_case1_blender_golden(teapot_batch):
    vertices, faces, _ = teapot_batch
    renderer = nr.Renderer()
    renderer.image_size = 256
    renderer.anti_aliasing = False

    images = np.asarray(
        jax.jit(renderer.render_silhouettes)(vertices, faces))
    image = images[2]

    ref = utils.load_blender_silhouette()
    np.testing.assert_allclose(ref, image, rtol=1e-4, atol=1e-5)


def _backward_case(vertices, faces_idx, pyi, pxi, grad_ref, on_face):
    renderer = nr.Renderer()
    renderer.image_size = 64
    renderer.anti_aliasing = False
    renderer.perspective = False

    vertices = np.array(vertices, 'float32')
    faces = np.array(faces_idx, 'int32')
    grad_ref = np.array(grad_ref, 'float32')
    vertices, faces, grad_ref = utils.to_minibatch(
        (vertices, faces, grad_ref))

    def loss_fn(v):
        images = renderer.render_silhouettes(v, faces)
        if on_face:
            return jnp.sum(jnp.abs(images[:, pyi, pxi]))
        return jnp.sum(jnp.abs(images[:, pyi, pxi] - 1))

    grad = np.asarray(jax.jit(jax.grad(loss_fn))(jnp.asarray(vertices)))
    np.testing.assert_allclose(grad, grad_ref, rtol=1e-2, atol=1e-5)


def test_backward_case1():
    _backward_case(
        vertices=[[0.8, 0.8, 1.], [0.0, -0.5, 1.], [0.2, -0.4, 1.]],
        faces_idx=[[0, 1, 2]],
        pyi=25, pxi=35,
        grad_ref=[[1.6725862, -0.26021874, 0.],
                  [1.41986704, -1.64284933, 0.],
                  [0., 0., 0.]],
        on_face=False)


def test_backward_case2():
    _backward_case(
        vertices=[[0.8, 0.8, 1.], [-0.5, -0.8, 1.], [0.8, -0.8, 1.]],
        faces_idx=[[0, 1, 2]],
        pyi=40, pxi=50,
        grad_ref=[[0.98646867, 1.04628897, 0.],
                  [-1.03415668, -0.10403691, 0.],
                  [3.00094461, -1.55173182, 0.]],
        on_face=True)
