"""A/B: where does the default-vs-tuned throughput gap come from?

Rows (teapot bs32 256^2+AA textured fwd+bwd):
  1. default Renderer (auto fast path, runtime_checks=True)   — headline
  2. default + runtime_checks=False   — isolates the warning-callback cost
     (one scalar host readback per capacity check per step; suspected to
     serialize dispatch on this ~38 ms-RTT tunnel)
  3. nr.tune'd (exact-fit capacities + runtime_checks=False)  — the ceiling
  4. tuned + runtime_checks=True      — isolates capacity-fit vs callbacks

Run on the real chip:  python misc/ab_knobs.py
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
    vertices = jnp.asarray(np.tile(v0[None], (BS, 1, 1)))
    faces = jnp.asarray(np.tile(f0[None], (BS, 1, 1)))
    tx = jnp.ones((BS, faces.shape[1], 2, 2, 2, 3), jnp.float32)
    eyes = [jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30.0), np.float32(a)))
        for a in np.linspace(0, 360, ITERS, endpoint=False)]

    tuned_overrides = None
    for label, tune_it, checks in [('default            checks=on ', 0, True),
                                   ('default            checks=off', 0, False),
                                   ('tuned              checks=off', 1, False),
                                   ('tuned              checks=on ', 1, True)]:
        r = nr.Renderer()
        r.image_size = IS
        if tune_it:
            r.perf_overrides = dict(runtime_checks=checks)
            if tuned_overrides is None:
                tuned_overrides = nr.tune(r, vertices, faces, eyes=eyes,
                                          margin=1.0)
            else:
                r.perf_overrides = dict(tuned_overrides,
                                        runtime_checks=checks)
        else:
            r.perf_overrides = dict(runtime_checks=checks)

        def loss(vv, txx, eye, r=r):
            r.eye = eye
            return jnp.sum(r.render(vv, faces, txx))

        fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
        ips = throughput(fn, [(vertices, tx, e) for e in eyes])
        print(f'{label}: fwd+bwd {ips:7.1f} img/s', flush=True)


if __name__ == '__main__':
    main()
