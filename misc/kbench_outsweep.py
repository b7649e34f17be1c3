"""Isolated out-sweep / in-sweep kernel timing on the bench scene.

Feeds the kernels the REAL maps of the bench workload (teapot bs32,
512^2 raster) as precomputed device arrays, so the measured time is the
kernel alone — RTT-amortized (NOTES.md).

    python misc/kbench_outsweep.py
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
from neural_renderer_tpu.rasterize import backward_pallas, forward_pallas
from neural_renderer_tpu.rasterize import geometry
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
    faces_i = jnp.asarray(np.tile(faces[None], (BATCH_SIZE, 1, 1)))
    ts = 2
    textures = jnp.ones(
        (BATCH_SIZE, faces_i.shape[1], ts, ts, ts, 3), jnp.float32)
    eye = jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30), np.float32(90)))
    f2 = jnp.concatenate([faces_i, faces_i[:, :, ::-1]], axis=1)
    t2 = jnp.concatenate([textures, textures.transpose(0, 1, 4, 3, 2, 5)],
                         axis=1)
    is_ = IMAGE_SIZE * 2
    s = RasterizeSettings(image_size=is_, return_rgb=True, return_alpha=True,
                          return_depth=False, runtime_checks=False)

    @jax.jit
    def prep(v):
        fc = vertices_to_faces(perspective(look_at(v, eye), 30.0), f2)
        out = forward_pallas.forward_shaded(s, fc, t2)
        xy = out['xy']
        z = out['z']
        face_w = jnp.stack(
            [jnp.stack([xy[:, 2 * k], xy[:, 2 * k + 1], z[:, k]], axis=-1)
             for k in range(3)], axis=-2)
        ppx = geometry.to_pixel_coords(face_w[..., 0], is_)
        ppy = geometry.to_pixel_coords(face_w[..., 1], is_)
        alpha = (out['face_index_map'] >= 0).astype(jnp.float32)
        rgb = out['rgb'].transpose(0, 2, 3, 1)
        ga = jnp.ones_like(alpha)
        grgb = jnp.ones_like(rgb)
        s1 = alpha * ga + jnp.sum(rgb * grgb, axis=-1)
        return ppx, ppy, alpha, s1, ga, grgb, rgb

    ppx, ppy, alpha, s1, ga, grgb, rgb = jax.tree.map(
        lambda x: jax.block_until_ready(x) if False else x, prep(vertices))
    _ = np.asarray(alpha.ravel()[0])

    def out_axis(a, compact=False):
        def f(ppx, ppy, alpha, s1, ga, grgb, rgb):
            out = backward_pallas.outsweep_channels(
                s, a, ppx, ppy, alpha, s1, ga, grgb, rgb, row_cap=256,
                compact=compact)
            six, rw = out[0], out[1]
            return jnp.sum(six) + rw
        return jax.jit(f)

    def in_axis(a):
        import dataclasses
        s_in = dataclasses.replace(s, grad_offset_radius=44)

        def f(ppx, ppy, alpha, ga, rgb, grgb):
            six, ow = backward_pallas.insweep_channels(
                s_in, a, ppx, ppy, alpha, ga, rgb, grgb)
            return jnp.sum(six) + ow
        return jax.jit(f)

    args = (ppx, ppy, alpha, s1, ga, grgb, rgb)
    t0 = timeit('outsweep axis 0', out_axis(0), *args)
    t1 = timeit('outsweep axis 1', out_axis(1), *args)
    c0 = timeit('outsweep axis 0 COMPACT', out_axis(0, True), *args)
    c1 = timeit('outsweep axis 1 COMPACT', out_axis(1, True), *args)
    print(f'{"outsweep compact total":<52s} {(c0 + c1) * 1e3:8.1f} ms')
    i0 = timeit('insweep axis 0', in_axis(0), ppx, ppy, alpha, ga, rgb, grgb)
    i1 = timeit('insweep axis 1', in_axis(1), ppx, ppy, alpha, ga, rgb, grgb)
    print(f'{"outsweep total":<52s} {(t0 + t1) * 1e3:8.1f} ms')
    print(f'{"insweep total":<52s} {(i0 + i1) * 1e3:8.1f} ms')


if __name__ == '__main__':
    main()
