"""In-kernel K4 shading beyond ts=2: the per-axis hat-product trilinear
(forward_pallas._shaded_kernel) must match the XLA sampling path
(texture.sample_textures — reference rasterize.py:398-425 semantics) for
ts=3 and the reference Mesh default ts=4 (reference mesh.py:21)."""

import jax
import jax.numpy as jnp
import numpy as np

from neural_renderer_tpu.rasterize import forward_pallas, forward_xla
from neural_renderer_tpu.rasterize import texture as tex
from neural_renderer_tpu.rasterize.config import RasterizeSettings


def _scene(nf=40, bs=2):
    key = jax.random.PRNGKey(7)
    fc = jax.random.uniform(key, (bs, nf, 3, 3), minval=-0.9, maxval=0.9)
    return fc.at[..., 2].set(1.0 + 0.3 * fc[..., 2])


def test_hat_product_shading_matches_xla_sampling():
    is_ = 64
    fc = _scene()
    s = RasterizeSettings(image_size=is_, return_rgb=True,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False, backend='pallas', eps=1e-3)
    fim, _ = jax.jit(
        lambda a: forward_xla.forward_face_index_map(s, a))(fc)
    face_w = forward_xla.gather_face_rows(fc, fim)
    wm, dm, _ = forward_xla.winner_attributes(s, fc, fim, face_w,
                                              need_face_inv=False)
    assert int(np.asarray((fim >= 0).sum())) > 500
    for ts in (3, 4):
        tx = jax.random.uniform(jax.random.PRNGKey(ts),
                                (2, 40, ts, ts, ts, 3)).astype(jnp.float32)
        out = forward_pallas.forward_shaded(s, fc, tx, interpret=True)
        want = np.asarray(tex.sample_textures(s, fc, tx, fim, face_w,
                                              wm, dm))
        got = np.asarray(out['rgb'].transpose(0, 2, 3, 1))
        assert np.array_equal(np.asarray(out['face_index_map']),
                              np.asarray(fim))
        # hat terms (1-|tif-c|) round differently than the lo/frac corner
        # form and the 64-cell sum reorders the 8 nonzero addends — ulp
        # noise only, no approximation
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=f'ts={ts}')


def test_cell_channel_k6_matches_eight_pass_scatter():
    """ts=3/4 texture gradients via the fused cell-resolved channels equal
    the legacy 8-pass per-corner segment_sums (summation order only) —
    end-to-end through rasterize_core's custom VJP."""
    from neural_renderer_tpu.rasterize import core as rcore

    is_ = 64
    fc = _scene()
    bg = jnp.zeros((3,), jnp.float32)
    s = RasterizeSettings(image_size=is_, return_rgb=True,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False, backend='xla', eps=1e-3)

    for ts in (3, 4):
        tx = jax.random.uniform(jax.random.PRNGKey(10 + ts),
                                (2, 40, ts, ts, ts, 3)).astype(jnp.float32)

        def loss(fcc, txx):
            rgb, a, _ = rcore.rasterize_core(s, fcc, txx, bg)
            return jnp.sum(rgb * rgb) + jnp.sum(a)

        assert tex.cell_channels_fit(s, 2, ts)
        g_new = jax.jit(jax.grad(loss, argnums=(0, 1)))(fc, tx)

        orig = tex.cell_channels_fit
        try:
            tex.cell_channels_fit = lambda *a: False   # force legacy path
            g_old = jax.jit(jax.grad(loss, argnums=(0, 1)))(fc, tx)
        finally:
            tex.cell_channels_fit = orig

        for a, b, name in [(g_new[0], g_old[0], 'faces'),
                           (g_new[1], g_old[1], 'textures')]:
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-6)
            np.testing.assert_allclose(
                a, b, rtol=1e-5, atol=scale * 1e-6,
                err_msg=f'ts={ts} grad_{name}')
        assert float(np.abs(np.asarray(g_new[1])).max()) > 0
