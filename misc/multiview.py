"""BASELINE config 5: batched multi-view RGB+depth+silhouette rendering,
64 views @ 512^2, sharded over the device mesh.

Renders the teapot from a ring of viewpoints through ``render_rgbad`` (all
three channels in one rasterization pass), with the view batch sharded over
``jax.devices()`` via ``parallel.sharded_render`` — on a single chip that
is one shard; on a pod slice each device renders its local views with zero
inter-chip communication.  Prints throughput.

    python misc/multiview.py [--views 64] [--image_size 512] [--iters 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..'))

import jax

# persistent compile cache (the remote-compile tunnel costs minutes/program)
jax.config.update('jax_compilation_cache_dir', os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)

import jax.numpy as jnp
import numpy as np

import neural_renderer_tpu as nr
from neural_renderer_tpu import parallel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--views', type=int, default=64)
    ap.add_argument('--image_size', type=int, default=512)
    ap.add_argument('--iters', type=int, default=4)
    ap.add_argument('--distance', type=float, default=2.732)
    ap.add_argument('--elevation', type=float, default=30.0)
    args = ap.parse_args()

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                        'tests', 'data', 'teapot.obj')
    vertices, faces = nr.load_obj(path)
    nv = args.views
    v = jnp.broadcast_to(jnp.asarray(vertices), (nv,) + vertices.shape)
    f = jnp.broadcast_to(jnp.asarray(faces), (nv,) + faces.shape)
    tx = jnp.ones((nv, faces.shape[0], 2, 2, 2, 3), jnp.float32)

    eyes = jnp.asarray(np.stack([
        np.asarray(nr.get_points_from_angles(
            np.float32(args.distance), np.float32(args.elevation),
            np.float32(a)))
        for a in np.linspace(0, 360, nv, endpoint=False)]))

    renderer = nr.Renderer()
    renderer.image_size = args.image_size
    renderer.perf_overrides = dict(runtime_checks=False)
    nr.tune(renderer, np.asarray(v), np.asarray(f),
            eyes=[eyes[i] for i in range(0, nv, max(1, nv // 8))])
    # drop backward-only capacities: this is a forward workload
    renderer.perf_overrides.pop('grad_out_cap', None)
    renderer.perf_overrides.pop('grad_csr_rows', None)

    mesh = parallel.default_mesh()
    ndev = len(mesh.devices.ravel())
    renderer.eye = parallel.shard_batch(mesh, eyes)
    v, f, tx = parallel.shard_batch(mesh, v, f, tx)

    render = parallel.make_sharded_render(renderer, mesh, mode='rgbad')

    def once():
        return render(v, f, tx)

    out = once()                                 # compile + warmup
    _ = np.asarray(out['rgb'].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = once()
    _ = np.asarray(out['rgb'].ravel()[0])
    dt = (time.perf_counter() - t0) / args.iters
    print(f'{nv} views @ {args.image_size}^2 rgb+alpha+depth over '
          f'{ndev} device(s): {dt * 1e3:.1f} ms/batch '
          f'({nv / dt:.1f} images/s)')
    for k in ('rgb', 'alpha', 'depth'):
        a = np.asarray(out[k])
        assert np.isfinite(a).all(), k
        print(f'  {k}: shape {a.shape}, mean {a.mean():.4f}')


if __name__ == '__main__':
    main()
