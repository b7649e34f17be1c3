"""Closed-form tests for the math ops (reference test_look_at /
test_perspective / test_cross cases, plus tests for the reference's TODO
stubs: look, vertices_to_faces, get_points_from_angles, lighting)."""

import jax
import jax.numpy as jnp
import numpy as np

import neural_renderer_tpu as nr


def test_cross_forward():
    rng = np.random.RandomState(0)
    a = rng.normal(size=(10, 3)).astype('float32')
    b = rng.normal(size=(10, 3)).astype('float32')
    c_ref = np.cross(a, b)
    c = np.asarray(nr.cross(a, b))
    np.testing.assert_allclose(c_ref, c, rtol=1e-5, atol=1e-6)


def test_cross_backward():
    """Autodiff of cross must equal the reference's analytic backward
    ga = b x gc, gb = gc x a (cross.py:50-55)."""
    rng = np.random.RandomState(1)
    a = rng.normal(size=(10, 3)).astype('float32')
    b = rng.normal(size=(10, 3)).astype('float32')
    gy = rng.normal(size=(10, 3)).astype('float32')

    ga, gb = jax.vjp(nr.cross, jnp.asarray(a), jnp.asarray(b))[1](
        jnp.asarray(gy))
    np.testing.assert_allclose(np.asarray(ga), np.cross(b, gy),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), np.cross(gy, a),
                               rtol=1e-5, atol=1e-6)


def test_look_at():
    """Reference test_look_at.py:12-28 closed-form cases."""
    eyes = [[1, 0, 1], [0, 0, -10], [-1, 1, 0]]
    answers = [
        [-np.sqrt(2) / 2, 0, np.sqrt(2) / 2],
        [1, 0, 10],
        [0, np.sqrt(2) / 2, 3.0 / 2.0 * np.sqrt(2)],
    ]
    vertices = np.array([1, 0, 0], 'float32')[None, None, :]
    for e, a in zip(eyes, answers):
        transformed = nr.look_at(vertices, np.array(e, 'float32'))
        np.testing.assert_allclose(
            np.asarray(transformed).flatten(), np.array(a, 'float32'),
            rtol=1e-4, atol=1e-4)


def test_look():
    """look with direction = at - eye must match look_at toward the origin."""
    rng = np.random.RandomState(2)
    vertices = rng.normal(size=(2, 5, 3)).astype('float32')
    eye = np.array([0.5, -0.5, -3.0], 'float32')
    via_look_at = nr.look_at(vertices, eye)
    via_look = nr.look(vertices, eye, direction=-eye)
    np.testing.assert_allclose(np.asarray(via_look_at), np.asarray(via_look),
                               rtol=1e-4, atol=1e-4)


def test_perspective():
    """Reference test_perspective.py:12-18."""
    vertices = np.array([1, 2, 10], 'float32')[None, None, :]
    transformed = nr.perspective(vertices)
    v_out = np.array([np.sqrt(3) / 10, 2 * np.sqrt(3) / 10, 10], 'float32')
    np.testing.assert_allclose(np.asarray(transformed).flatten(), v_out,
                               rtol=1e-4, atol=1e-5)


def test_get_points_from_angles():
    scalar = nr.get_points_from_angles(2.732, 30, 45)
    arr = nr.get_points_from_angles(
        np.array([2.732], 'float32'), np.array([30.0], 'float32'),
        np.array([45.0], 'float32'))
    np.testing.assert_allclose(np.asarray(arr)[0], np.array(scalar),
                               rtol=1e-5, atol=1e-6)


def test_vertices_to_faces():
    rng = np.random.RandomState(3)
    vertices = rng.normal(size=(2, 7, 3)).astype('float32')
    faces = rng.randint(0, 7, size=(2, 4, 3)).astype('int32')
    out = np.asarray(nr.vertices_to_faces(vertices, faces))
    for b in range(2):
        for f in range(4):
            for k in range(3):
                np.testing.assert_array_equal(out[b, f, k],
                                              vertices[b, faces[b, f, k]])


def test_vertices_to_faces_grad_is_scatter_add():
    vertices = jnp.zeros((1, 4, 3), jnp.float32)
    faces = jnp.array([[[0, 1, 1]]], jnp.int32)

    def f(v):
        return jnp.sum(nr.vertices_to_faces(v, faces))

    g = np.asarray(jax.grad(f)(vertices))
    np.testing.assert_allclose(g[0, 0], [1, 1, 1])
    np.testing.assert_allclose(g[0, 1], [2, 2, 2])   # used twice
    np.testing.assert_allclose(g[0, 2], [0, 0, 0])


def test_vertices_to_faces_grad_paths_agree():
    """The MXU incidence-contraction backward (shared faces across the
    batch) and the scatter-add backward (per-batch topologies / over the
    one-hot budget) compute the same gradient, and both match a numpy
    scatter reference."""
    from neural_renderer_tpu.ops import vertices_to_faces as v2f_mod

    rng = np.random.RandomState(7)
    vertices = rng.normal(size=(3, 9, 3)).astype('float32')
    f_shared = np.tile(rng.randint(0, 9, size=(1, 5, 3)), (3, 1, 1)) \
        .astype('int32')
    f_differ = rng.randint(0, 9, size=(3, 5, 3)).astype('int32')
    cot = rng.normal(size=(3, 5, 3, 3)).astype('float32')

    def ref_grad(faces):
        g = np.zeros_like(vertices)
        for b in range(3):
            for f in range(5):
                for k in range(3):
                    g[b, faces[b, f, k]] += cot[b, f, k]
        return g

    def grad_of(faces):
        def f(v):
            return jnp.sum(nr.vertices_to_faces(v, jnp.asarray(faces))
                           * jnp.asarray(cot))
        return np.asarray(jax.jit(jax.grad(f))(jnp.asarray(vertices)))

    # shared faces -> the runtime cond picks the matmul branch
    np.testing.assert_allclose(grad_of(f_shared), ref_grad(f_shared),
                               rtol=1e-5, atol=1e-6)
    # per-batch topologies -> the scatter branch
    np.testing.assert_allclose(grad_of(f_differ), ref_grad(f_differ),
                               rtol=1e-5, atol=1e-6)
    # over-budget meshes skip the cond entirely and scatter
    orig = v2f_mod._ONEHOT_MAX_ELEMS
    try:
        v2f_mod._ONEHOT_MAX_ELEMS = 0
        np.testing.assert_allclose(grad_of(f_shared), ref_grad(f_shared),
                                   rtol=1e-5, atol=1e-6)
    finally:
        v2f_mod._ONEHOT_MAX_ELEMS = orig


def test_lighting_executable_and_ambient():
    """Reference test_lighting.py smoke + a checkable ambient-only case."""
    rng = np.random.RandomState(4)
    faces = rng.normal(size=(4, 16, 3, 3)).astype('float32')
    textures = rng.normal(size=(4, 16, 8, 8, 8, 3)).astype('float32')
    nr.lighting(faces, textures)

    lit = nr.lighting(faces, textures, intensity_ambient=1.0,
                      intensity_directional=0.0)
    np.testing.assert_allclose(np.asarray(lit), textures, rtol=1e-5,
                               atol=1e-6)

    lit = nr.lighting(faces, textures, intensity_ambient=0.25,
                      intensity_directional=0.0)
    np.testing.assert_allclose(np.asarray(lit), 0.25 * textures, rtol=1e-5,
                               atol=1e-6)
