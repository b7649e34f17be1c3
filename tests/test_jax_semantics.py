"""JAX-specific contracts the Chainer reference never had to state:
jit == eager, vmap == batched, batch independence, and pallas == xla."""

import numpy as np
import pytest

import neural_renderer_tpu as nr
import utils


def _triangle_batch():
    vertices = np.array(
        [[0.8, 0.8, 1.], [-0.5, -0.8, 1.], [0.6, -0.6, 1.]], 'float32')
    faces = np.array([[0, 1, 2]], 'int32')
    return utils.to_minibatch((vertices, faces))


def test_jit_matches_eager():
    import jax
    vertices, faces = _triangle_batch()
    renderer = nr.Renderer()
    renderer.image_size = 32
    renderer.anti_aliasing = False
    renderer.perspective = False
    eager = np.asarray(renderer.render_silhouettes(vertices, faces))
    jitted = np.asarray(jax.jit(renderer.render_silhouettes)(vertices, faces))
    np.testing.assert_array_equal(eager, jitted)


def test_batch_independence():
    """The index-2-of-4 fixture: zero rows must render empty and the data
    row identically to a batch-1 render (reference tests/utils.py:7-14)."""
    import jax
    vertices, faces = _triangle_batch()
    renderer = nr.Renderer()
    renderer.image_size = 32
    renderer.anti_aliasing = False
    renderer.perspective = False
    images = np.asarray(jax.jit(renderer.render_silhouettes)(vertices, faces))
    assert images[0].max() == 0
    assert images[1].max() == 0
    assert images[3].max() == 0
    single = np.asarray(jax.jit(renderer.render_silhouettes)(
        vertices[2:3], faces[2:3]))
    np.testing.assert_array_equal(images[2], single[0])


def test_vmap_over_views():
    """vmap over eye positions == loop over eye positions."""
    import jax
    import jax.numpy as jnp
    vertices, faces = nr.load_obj('tests/data/tetrahedron.obj')
    vertices, faces = jnp.asarray(vertices[None]), jnp.asarray(faces[None])
    renderer = nr.Renderer()
    renderer.image_size = 32
    renderer.anti_aliasing = False

    eyes = jnp.asarray(np.stack([
        np.asarray(nr.get_points_from_angles(
            np.float32(2.732), np.float32(15.0), np.float32(a)))
        for a in (0.0, 90.0, 180.0)]))

    def render_one(eye):
        renderer.eye = eye
        return renderer.render_silhouettes(vertices, faces)[0]

    batched = np.asarray(jax.jit(jax.vmap(render_one))(eyes))
    for i in range(3):
        one = np.asarray(jax.jit(render_one)(eyes[i]))
        np.testing.assert_array_equal(batched[i], one)


def test_pallas_matches_xla_oracle():
    """The production Pallas forward must be bit-exact vs the pure-XLA
    oracle (on non-TPU hosts the pallas kernel runs in interpreter mode)."""
    import jax
    import jax.numpy as jnp
    from neural_renderer_tpu.rasterize import forward_pallas, forward_xla
    from neural_renderer_tpu.rasterize.config import RasterizeSettings
    from neural_renderer_tpu.ops.transforms import look_at, perspective
    from neural_renderer_tpu.ops.vertices_to_faces import vertices_to_faces

    vertices, faces = nr.load_obj('tests/data/teapot.obj')
    f2 = np.concatenate([faces, faces[:, ::-1]], 0)[None]
    eye = np.asarray(
        nr.get_points_from_angles(2.732, 15.0, 30.0), 'float32')
    v = perspective(look_at(vertices[None], eye), 30.0)
    fc = vertices_to_faces(v, jnp.asarray(f2))

    # exact cap: at 128^2 one 8x128 tile spans the whole image width, so
    # ~1300 teapot faces can overlap a single tile — cap must cover them
    # (faces_per_tile_cap clamps to nf).
    s = RasterizeSettings(image_size=128, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          faces_per_tile_cap=8192)
    idx_x, dep_x = jax.jit(
        lambda f: forward_xla.forward_face_index_map(s, f))(fc)
    interpret = jax.default_backend() != 'tpu'
    idx_p, dep_p = jax.jit(
        lambda f: forward_pallas.forward_face_index_map(
            s, f, interpret=interpret))(fc)
    np.testing.assert_array_equal(np.asarray(idx_x), np.asarray(idx_p))
    np.testing.assert_array_equal(np.asarray(dep_x), np.asarray(dep_p))
