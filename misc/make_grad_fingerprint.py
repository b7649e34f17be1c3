"""Regenerate tests/data/teapot_grad_fingerprint.npz — the stored
production-path teapot gradient that tests/test_grad_parity64.py pins
future runs against.  Run on the production backend (TPU) after INTENDED
numeric changes; commit the refreshed file with a note saying why."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', 'tests'))

import jax
import jax.numpy as jnp
import numpy as np

import neural_renderer_tpu as nr
import utils


def main():
    vertices, faces, _ = utils.load_teapot_batch()
    renderer = nr.Renderer()
    renderer.image_size = 64
    renderer.anti_aliasing = False

    # fixed random cotangent: exercises sign-dependent gating everywhere
    # (a constant seed would zero the diff_grad > 0 gate on most edges)
    seed = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1234), (4, 64, 64)), 'float32')

    def loss(v):
        img = renderer.render_silhouettes(v, faces)
        return jnp.sum(img * jnp.asarray(seed))

    grad = np.asarray(jax.jit(jax.grad(loss))(vertices))
    out = os.path.join(utils.DATA_DIR, 'teapot_grad_fingerprint.npz')
    np.savez_compressed(out, seed=seed, grad=grad,
                        backend=jax.default_backend())
    print(f'wrote {out} (backend={jax.default_backend()}, '
          f'|grad|max={np.abs(grad).max():.6g})')


if __name__ == '__main__':
    main()
