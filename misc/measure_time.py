"""Wall-clock benchmark harness mirroring the reference protocol.

Reference ``misc/measure_time.py``: teapot.obj, 24 azimuth steps (0..360 by
15 degrees), forward = render + device sync, backward = grad of sum(image),
first sample dropped.  Flags match the reference (-i/-bs/-is; -us accepted
as a no-op).  Here forward and backward are each jitted XLA programs.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp
import numpy as np
import tqdm

import neural_renderer_tpu as nr


def _sync(tree):
    """Force completion via a tiny np.asarray readback.  NOT
    jax.block_until_ready: on this platform's tunneled TPU runtime its
    polling path measures ~500 ms regardless of the work (NOTES.md), while
    an element readback costs one link round trip."""
    _ = np.asarray(jax.tree.leaves(tree)[0].ravel()[0])


def run():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--filename_input', type=str,
                        default=os.path.join(
                            os.path.dirname(os.path.abspath(__file__)),
                            '..', 'tests', 'data', 'teapot.obj'))
    parser.add_argument('-bs', '--batch_size', type=int, default=1)
    parser.add_argument('-is', '--image_size', type=int, default=256)
    parser.add_argument('-us', '--unsafe', type=int, default=0)  # no-op
    parser.add_argument('--backend', type=str, default='auto')
    args = parser.parse_args()

    camera_distance = 2.732
    elevation = 30
    texture_size = 2

    vertices, faces = nr.load_obj(args.filename_input)
    vertices = jnp.asarray(np.tile(vertices[None], (args.batch_size, 1, 1)))
    faces = jnp.asarray(np.tile(faces[None], (args.batch_size, 1, 1)))
    textures = jnp.ones(
        (args.batch_size, faces.shape[1], texture_size, texture_size,
         texture_size, 3), jnp.float32)

    renderer = nr.Renderer()
    renderer.image_size = args.image_size
    renderer.perf_overrides = dict(backend=args.backend)

    # ---------------- silhouettes ----------------
    def render_sil(v, eye):
        renderer.eye = eye
        return renderer.render_silhouettes(v, faces)

    fwd_sil = jax.jit(render_sil)
    bwd_sil = jax.jit(jax.grad(lambda v, eye: jnp.sum(render_sil(v, eye))))

    times_forward, times_backward = [], []
    loop = tqdm.tqdm(range(0, 360, 15))
    for azimuth in loop:
        loop.set_description('Drawing (silhouette)')
        eye = jnp.asarray(nr.get_points_from_angles(
            np.float32(camera_distance), np.float32(elevation),
            np.float32(azimuth)))
        t0 = time.time()
        images = fwd_sil(vertices, eye)
        _sync(images)
        times_forward.append(time.time() - t0)
        t0 = time.time()
        g = bwd_sil(vertices, eye)
        _sync(g)
        times_backward.append(time.time() - t0)

    print('silhouette forward time: %.3f ms' %
          (np.sum(times_forward[1:]) / len(times_forward[1:]) * 1000))
    print('silhouette backward time: %.3f ms' %
          (np.sum(times_backward[1:]) / len(times_backward[1:]) * 1000))

    # ---------------- textured ----------------
    def render_rgb(v, tx, eye):
        renderer.eye = eye
        return renderer.render(v, faces, tx)

    fwd_rgb = jax.jit(render_rgb)
    bwd_rgb = jax.jit(jax.grad(
        lambda v, tx, eye: jnp.sum(render_rgb(v, tx, eye)), argnums=(0, 1)))

    times_forward, times_backward = [], []
    loop = tqdm.tqdm(range(0, 360, 15))
    for azimuth in loop:
        loop.set_description('Drawing (textured)')
        eye = jnp.asarray(nr.get_points_from_angles(
            np.float32(camera_distance), np.float32(elevation),
            np.float32(azimuth)))
        t0 = time.time()
        images = fwd_rgb(vertices, textures, eye)
        _sync(images)
        times_forward.append(time.time() - t0)
        t0 = time.time()
        g = bwd_rgb(vertices, textures, eye)
        _sync(g)
        times_backward.append(time.time() - t0)

    print('texture forward time: %.3f ms' %
          (np.sum(times_forward[1:]) / len(times_forward[1:]) * 1000))
    print('texture backward time: %.3f ms' %
          (np.sum(times_backward[1:]) / len(times_backward[1:]) * 1000))


if __name__ == '__main__':
    run()
