"""RTT-amortized ablation of the default (auto-fast) bench step.

Times each variant by dispatching N iterations asynchronously with ONE
readback at the end (per-iteration readbacks add the host<->TPU tunnel's
fixed ~20-40 ms round trip to every sample — NOTES.md).  Differences
between variants attribute device time to components of the real
production path, unlike stage-level jits which run different layouts.

    python misc/ablate_step.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

import jax

jax.config.update('jax_compilation_cache_dir', os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)

import jax.numpy as jnp
import numpy as np

import neural_renderer_tpu as nr

BATCH_SIZE = int(os.environ.get('BENCH_BATCH_SIZE', 32))
IMAGE_SIZE = int(os.environ.get('BENCH_IMAGE_SIZE', 256))
ITERS = int(os.environ.get('ABLATE_ITERS', 8))


def timeit(label, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f'{label:<52s} {dt * 1e3:8.1f} ms/iter', flush=True)
    return dt


def main():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                        'tests', 'data', 'teapot.obj')
    vertices, faces = nr.load_obj(path)
    vertices = jnp.asarray(np.tile(vertices[None], (BATCH_SIZE, 1, 1)))
    faces_i = jnp.asarray(np.tile(faces[None], (BATCH_SIZE, 1, 1)))
    textures = jnp.ones(
        (BATCH_SIZE, faces_i.shape[1], 2, 2, 2, 3), jnp.float32)
    eye = jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30), np.float32(90)))

    def make(render_kind='render', **perf):
        r = nr.Renderer()
        r.image_size = IMAGE_SIZE
        r.eye = eye
        r.perf_overrides = dict(runtime_checks=False, **perf)

        if render_kind == 'sil':
            def loss(v):
                return jnp.sum(r.render_silhouettes(v, faces_i))
            return jax.jit(jax.grad(loss))

        def loss(v, t):
            return jnp.sum(r.render(v, faces_i, t))
        if render_kind == 'fwd':
            return jax.jit(loss)
        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    base = timeit('full fwd+bwd (default auto-fast)', make(),
                  vertices, textures)
    fwd = timeit('forward only', make('fwd'), vertices, textures)
    print(f'{"  -> backward total":<52s} {(base - fwd) * 1e3:8.1f} ms')
    no_out = timeit('fwd+bwd, grad_out_cap=0 (out-sweep removed)',
                    make(grad_out_cap=0), vertices, textures)
    print(f'{"  -> out-sweep":<52s} {(base - no_out) * 1e3:8.1f} ms')
    sil = timeit('silhouette fwd+bwd', make('sil'), vertices)
    del sil
    try:
        import dataclasses  # noqa: F401
        no_csr = timeit('fwd+bwd, auto_fast=False + explicit radius '
                        '(global segment reduction)',
                        make(grad_offset_radius=44, grad_out_cap=20480),
                        vertices, textures)
        del no_csr
    except Exception as e:                                 # noqa: BLE001
        print(f'variant failed: {e!r}')


if __name__ == '__main__':
    main()
