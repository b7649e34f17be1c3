"""RTT-amortized ablation of the 163k-face multi-pass workload (bench's
large_mesh point: icosphere subdiv 6, fill_back-doubled, bs 4, silhouette
fwd+bwd at 256^2 + AA).

    python misc/ablate_large.py
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

ITERS = int(os.environ.get('ABLATE_ITERS', 4))
SUBDIV = int(os.environ.get('BENCH_LARGE_SUBDIV', 6))


def timeit(label, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f'{label:<56s} {dt * 1e3:8.1f} ms/iter', flush=True)
    return dt


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    lbs = 4
    lv, lf = bench._icosphere(SUBDIV)
    vertices = jnp.asarray(np.tile(lv[None], (lbs, 1, 1)))
    faces_i = jnp.asarray(np.tile(lf[None], (lbs, 1, 1)))
    eye = jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30), np.float32(90)))

    r = nr.Renderer()
    r.image_size = 256
    r.eye = eye

    def loss(v):
        return jnp.sum(r.render_silhouettes(v, faces_i))

    timeit('full fwd+bwd silhouette', jax.jit(jax.grad(loss)), vertices)
    timeit('forward only', jax.jit(loss), vertices)

    # forward stages on NDC faces
    f2 = jnp.concatenate([faces_i, faces_i[:, :, ::-1]], axis=1)
    fc = jax.jit(lambda v: vertices_to_faces(
        perspective(look_at(v, eye), 30.0), f2))(vertices)
    _ = np.asarray(fc.ravel()[0])
    s = RasterizeSettings(image_size=512, return_rgb=False,
                          return_alpha=True, return_depth=False,
                          runtime_checks=False)
    ssize = forward_pallas.slice_size()
    print(f'# nf={fc.shape[1]}, slice_size={ssize}, '
          f'slices={-(-fc.shape[1] // ssize)}')

    timeit('multipass_fits (binning x slices)',
           jax.jit(lambda f: forward_pallas.multipass_fits(s, f, ssize)), fc)

    def one_slice(f):
        i, d = forward_pallas.forward_face_index_map(s, f[:, :ssize])
        return jnp.sum(d) + jnp.sum(i)

    timeit('one slice: face_index_map (binning + kernel)',
           jax.jit(one_slice), fc)

    def one_slice_binning(f):
        pz, counts = forward_pallas._membership_prefix(s, f[:, :ssize])
        return jnp.sum(counts) + jnp.sum(pz[..., -1])

    timeit('one slice: binning only', jax.jit(one_slice_binning), fc)


if __name__ == '__main__':
    main()
