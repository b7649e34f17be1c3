"""RTT-amortized ablation of the ts=4 textured workload (bench secondary:
teapot bs8, 256^2 + AA, texture_size 4 — the reference Mesh default).

    python misc/ablate_ts4.py
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
    bs = 8
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                        'tests', 'data', 'teapot.obj')
    vertices, faces = nr.load_obj(path)
    vertices = jnp.asarray(np.tile(vertices[None], (bs, 1, 1)))
    faces_i = jnp.asarray(np.tile(faces[None], (bs, 1, 1)))
    eye = jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30), np.float32(90)))

    def make(ts, kind='grad'):
        tx = jnp.ones((bs, faces_i.shape[1], ts, ts, ts, 3), jnp.float32)
        r = nr.Renderer()
        r.image_size = 256
        r.eye = eye
        r.perf_overrides = dict(runtime_checks=False)

        def loss(v, t):
            return jnp.sum(r.render(v, faces_i, t))
        if kind == 'fwd':
            return jax.jit(loss), tx
        if kind == 'gradv':
            return jax.jit(jax.grad(loss, argnums=0)), tx
        return jax.jit(jax.grad(loss, argnums=(0, 1))), tx

    for ts in (2, 4):
        f, tx = make(ts)
        base = timeit(f'ts={ts} fwd+bwd', f, vertices, tx)
        f, tx = make(ts, 'fwd')
        fwd = timeit(f'ts={ts} forward only', f, vertices, tx)
        f, tx = make(ts, 'gradv')
        gv = timeit(f'ts={ts} fwd+bwd grad(vertices only, no K6)', f,
                    vertices, tx)
        print(f'{"  -> bwd total":<52s} {(base - fwd) * 1e3:8.1f} ms')
        print(f'{"  -> K6 texture grad share":<52s} '
              f'{(base - gv) * 1e3:8.1f} ms')


if __name__ == '__main__':
    main()
