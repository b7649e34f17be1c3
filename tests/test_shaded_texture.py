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
