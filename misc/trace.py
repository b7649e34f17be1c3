"""jax.profiler trace capture around the bench workload (SURVEY.md section 5:
the reference has no profiling story beyond wall-clock prints; here the full
step can be captured for xprof/tensorboard analysis).

    python misc/trace.py --logdir /tmp/nr_trace [--steps 3]

View with: tensorboard --logdir /tmp/nr_trace (or xprof).  Some experimental
TPU platforms don't implement the profiler hooks; the script then falls back
to wall-clock prints so it still produces evidence.
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

import neural_renderer_tpu as nr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--logdir', default='/tmp/nr_trace')
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--batch_size', type=int, default=32)
    ap.add_argument('--image_size', type=int, default=256)
    args = ap.parse_args()

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                        'tests', 'data', 'teapot.obj')
    vertices, faces = nr.load_obj(path)
    vertices = jnp.asarray(np.tile(vertices[None], (args.batch_size, 1, 1)))
    faces = jnp.asarray(np.tile(faces[None], (args.batch_size, 1, 1)))
    textures = jnp.ones(
        (args.batch_size, faces.shape[1], 2, 2, 2, 3), jnp.float32)

    renderer = nr.Renderer()
    renderer.image_size = args.image_size
    renderer.eye = nr.get_points_from_angles(
        np.float32(2.732), np.float32(30), np.float32(90))
    # default auto-fast path (the bench headline configuration); explicit
    # capacity knobs measured SLOWER than auto on this workload (r4)
    renderer.perf_overrides = dict(runtime_checks=False)

    fwd_bwd = jax.jit(jax.value_and_grad(
        lambda v, t: jnp.sum(renderer.render(v, faces, t)),
        argnums=(0, 1)))

    # compile outside the trace
    _, g = fwd_bwd(vertices, textures)
    _ = np.asarray(jax.tree.leaves(g)[0].ravel()[0])

    def run_steps():
        t0 = time.perf_counter()
        for _ in range(args.steps):
            _, g = fwd_bwd(vertices, textures)
            _ = np.asarray(jax.tree.leaves(g)[0].ravel()[0])
        dt = (time.perf_counter() - t0) / args.steps
        print(f'{dt * 1e3:.1f} ms/step '
              f'({args.batch_size / dt:.1f} images/sec)')

    try:
        with jax.profiler.trace(args.logdir):
            run_steps()
        print(f'trace written to {args.logdir}')
    except Exception as exc:   # profiler hooks missing on some platforms
        print(f'jax.profiler unavailable here ({type(exc).__name__}); '
              'wall-clock only:')
        run_steps()


if __name__ == '__main__':
    main()
