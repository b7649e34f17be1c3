"""RTT-amortized ablation of the Pallas forward's internals at the bench
raster size (512^2, bs32, teapot+fill_back, ts=2 texels in-table).

Splits: binning prefix (XLA), feature table (XLA), the shaded kernel with
prefix precomputed, and the auto path's fit arithmetic.

    python misc/ablate_forward.py
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
from neural_renderer_tpu.ops.transforms import look_at, perspective
from neural_renderer_tpu.ops.vertices_to_faces import vertices_to_faces
from neural_renderer_tpu.rasterize import forward_pallas
from neural_renderer_tpu.rasterize.config import RasterizeSettings

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
    fi = jnp.asarray(np.tile(faces[None], (BATCH_SIZE, 1, 1)))
    f2 = jnp.concatenate([fi, fi[:, :, ::-1]], axis=1)
    ts = 2
    tx = jnp.ones((BATCH_SIZE, fi.shape[1], ts, ts, ts, 3), jnp.float32)
    t2 = jnp.concatenate([tx, tx.transpose(0, 1, 4, 3, 2, 5)], axis=1)
    eye = jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30), np.float32(90)))
    is_ = IMAGE_SIZE * 2
    s = RasterizeSettings(image_size=is_, return_rgb=True, return_alpha=True,
                          return_depth=False, runtime_checks=False)

    fc = jax.jit(lambda v: vertices_to_faces(
        perspective(look_at(v, eye), 30.0), f2))(vertices)
    _ = np.asarray(fc.ravel()[0])

    timeit('membership prefix (XLA binning)',
           jax.jit(lambda fc: forward_pallas._membership_prefix(s, fc)), fc)
    timeit('feature table (XLA, texels in-table)',
           jax.jit(lambda fc, t: forward_pallas._feature_table(s, fc, t)),
           fc, t2)

    pc = jax.jit(lambda fc: forward_pallas._membership_prefix(s, fc))(fc)
    _ = np.asarray(pc[1].ravel()[0])
    timeit('shaded kernel (prefix precomputed)',
           jax.jit(lambda fc, t, p, c: forward_pallas.forward_shaded(
               s, fc, t, prefix_counts=(p, c), guarded_budget=True)),
           fc, t2, pc[0], pc[1])
    timeit('full forward_shaded (incl. prefix)',
           jax.jit(lambda fc, t: forward_pallas.forward_shaded(s, fc, t)),
           fc, t2)

    def fits(fc, counts):
        capacity = forward_pallas.chunk_capacity(s, fc.shape[1])
        return ((counts.max() <= capacity)
                & forward_pallas.schedule_fits(
                    s, counts, capacity, fc.shape[0], fc.shape[1]))
    timeit('auto fit arithmetic (counts given)',
           jax.jit(fits), fc, pc[1])


if __name__ == '__main__':
    main()
