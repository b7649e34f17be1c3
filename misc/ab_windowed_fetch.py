"""A/B: windowed feature fetch on vs off, unsorted vs Morton-sorted teapot.

Decides whether `windowed_fetch` can default to True: if the unsorted
(default-contract) forward pays nothing measurable for the span
bookkeeping, flip the default; otherwise keep it opt-in for sorted
meshes.  Run on the real chip:

    python misc/ab_windowed_fetch.py
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

BS = int(os.environ.get('BENCH_BATCH_SIZE', 32))
IS = int(os.environ.get('BENCH_IMAGE_SIZE', 256))
ITERS = 8


def throughput(fn, args_list):
    out = fn(*args_list[0])
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for a in args_list:
        out = fn(*a)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    return BS / ((time.perf_counter() - t0) / len(args_list))


def main():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        '..', 'tests', 'data', 'teapot.obj')
    v0, f0 = nr.load_obj(path)
    fs, _, _ = nr.spatial_sort(v0, f0)
    eyes = [jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30.0), np.float32(a)))
        for a in np.linspace(0, 360, ITERS, endpoint=False)]
    vertices = jnp.asarray(np.tile(v0[None], (BS, 1, 1)))

    for label, f_np, wf in [('unsorted  wf=off', f0, False),
                            ('unsorted  wf=ON ', f0, True),
                            ('sorted    wf=off', np.asarray(fs), False),
                            ('sorted    wf=ON ', np.asarray(fs), True)]:
        faces = jnp.asarray(np.tile(np.asarray(f_np)[None], (BS, 1, 1)))
        tx = jnp.ones((BS, faces.shape[1], 2, 2, 2, 3), jnp.float32)
        r = nr.Renderer()
        r.image_size = IS
        r.perf_overrides = dict(windowed_fetch=wf)

        def loss(vv, txx, eye, r=r, faces=faces):
            r.eye = eye
            return jnp.sum(r.render(vv, faces, txx))

        fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        ips = throughput(fn, [(vertices, tx, e) for e in eyes])

        def fwd(vv, txx, eye, r=r, faces=faces):
            r.eye = eye
            return r.render(vv, faces, txx)

        fips = throughput(jax.jit(fwd), [(vertices, tx, e) for e in eyes])
        print(f'{label}: fwd+bwd {ips:7.1f} img/s   fwd-only '
              f'{fips:7.1f} img/s', flush=True)


if __name__ == '__main__':
    main()
