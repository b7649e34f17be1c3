"""Per-scene tuning: ``nr.tune`` must produce capacities that cover the
measured poses, and rendering gradients with the tuned fast paths must
equal the exact defaults (the knobs are exact-iff-covering by contract)."""

import numpy as np

import conftest  # noqa: F401  (forces the CPU platform)


def _scene():
    import jax.numpy as jnp
    vertices = jnp.asarray(
        [[1., 0., 0.], [0., 1., 0.], [0., 0., 1.], [0., 0., 0.]],
        jnp.float32) * 2 - 1
    faces = jnp.asarray(
        [[1, 3, 2], [3, 1, 0], [2, 0, 1], [0, 2, 3]], jnp.int32)
    return vertices, faces


def test_tune_sets_covering_overrides():
    import jax.numpy as jnp
    import neural_renderer_tpu as nr
    from neural_renderer_tpu.rasterize.config import RasterizeSettings

    vertices, faces = _scene()
    renderer = nr.Renderer()
    renderer.image_size = 32
    renderer.anti_aliasing = False

    eyes = [nr.get_points_from_angles(
        np.float32(2.732), np.float32(15.0), np.float32(a))
        for a in (0.0, 90.0, 180.0)]
    saved_eye = renderer.eye
    overrides = nr.tune(renderer, vertices, faces, eyes=eyes)

    assert renderer.eye is saved_eye
    assert renderer.perf_overrides == overrides
    assert set(overrides) >= {'faces_per_tile_cap', 'grad_csr_rows',
                              'grad_offset_radius'}
    assert overrides['grad_csr_rows'] >= 256
    assert overrides['grad_csr_rows'] % 128 == 0

    # the chosen capacities must cover every measured pose exactly
    from neural_renderer_tpu.ops.vertices_to_faces import vertices_to_faces
    s = RasterizeSettings(image_size=32, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False)
    f2 = renderer._fill_back_faces(faces[None])
    for eye in eyes:
        renderer.eye = eye
        fc = vertices_to_faces(
            renderer._transform(jnp.asarray(vertices)[None]), f2)
        m = nr.measure_scene(s, fc)
        assert int(np.asarray(m['binned_faces'])) <= \
            overrides['faces_per_tile_cap']
        assert int(np.asarray(m['csr_rows'])) <= overrides['grad_csr_rows']
        assert int(np.asarray(m['out_offset'])) < \
            overrides['grad_offset_radius']
        if 'grad_out_cap' in overrides:
            assert int(np.asarray(m['out_crossings'])) <= \
                overrides['grad_out_cap']
    renderer.eye = saved_eye


def test_tuned_gradients_match_exact_defaults():
    import jax
    import jax.numpy as jnp
    import neural_renderer_tpu as nr

    vertices, faces = _scene()
    eye = nr.get_points_from_angles(
        np.float32(2.732), np.float32(15.0), np.float32(30.0))

    def grads(overrides):
        renderer = nr.Renderer()
        renderer.image_size = 32
        renderer.anti_aliasing = False
        renderer.eye = eye
        renderer.perf_overrides = dict(overrides, backend='xla',
                                       runtime_checks=False)

        def loss(v):
            return jnp.sum(jnp.square(
                renderer.render_silhouettes(v, faces[None]) - 0.5))

        return np.asarray(jax.jit(jax.grad(loss))(
            jnp.asarray(vertices)[None]))

    renderer = nr.Renderer()
    renderer.image_size = 32
    renderer.anti_aliasing = False
    renderer.eye = eye
    tuned = nr.tune(renderer, vertices, faces)
    tuned.pop('grad_csr_rows')        # pallas-forward-only artifact

    g_exact = grads({})
    g_tuned = grads(tuned)
    assert np.abs(g_exact).max() > 0
    # same crossings, different summation order (dense vs compacted sweep)
    scale = np.abs(g_exact).max()
    np.testing.assert_allclose(g_tuned, g_exact, rtol=1e-5,
                               atol=scale * 1e-6)
