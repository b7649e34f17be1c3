"""Breakdown profiler: times each stage of the textured fwd+bwd step.

Times with forced np.asarray readback (block_until_ready under-reports on
this platform — NOTES.md).  Each stage is a self-contained jit from
layout-safe inputs (face coords + face index map); per-pixel small-minor
arrays (face_w, weight_map, rgb_map) never cross a jit boundary, because
TPU output layouts lane-pad a trailing dim of 3 up to 128 (measured 56x
memory blowup -> OOM).  A shared ``prep`` recompute is timed alone and can
be subtracted from stage times.

    python misc/profile_step.py [--caps]
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
from neural_renderer_tpu.ops.transforms import look_at, perspective
from neural_renderer_tpu.ops.vertices_to_faces import vertices_to_faces
from neural_renderer_tpu.rasterize import backward as bwd
from neural_renderer_tpu.rasterize import core as rcore
from neural_renderer_tpu.rasterize import forward_pallas, forward_xla
from neural_renderer_tpu.rasterize import texture as tex
from neural_renderer_tpu.rasterize.config import RasterizeSettings

BATCH_SIZE = int(os.environ.get('BENCH_BATCH_SIZE', 32))
IMAGE_SIZE = int(os.environ.get('BENCH_IMAGE_SIZE', 256))


def timeit(label, fn, *args, iters=4):
    out = fn(*args)                                   # compile + warmup
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f'{label:<44s} {dt * 1e3:8.1f} ms', flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--caps', action='store_true',
                    help='use the bench grad_out_cap/offset-radius knobs')
    args = ap.parse_args()

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

    # NDC face coords exactly like Renderer.render
    f2 = jnp.concatenate([faces_i, faces_i[:, :, ::-1]], axis=1)
    t2 = jnp.concatenate([textures, textures.transpose(0, 1, 4, 3, 2, 5)],
                         axis=1)
    fc = jax.jit(lambda v: vertices_to_faces(
        perspective(look_at(v, eye), 30.0), f2))(vertices)

    is_ = IMAGE_SIZE * 2   # AA supersampling
    perf = {}
    if args.caps:
        perf = dict(grad_out_cap=20480, grad_offset_radius=36)
    s_rgb = RasterizeSettings(image_size=is_, return_rgb=True,
                              return_alpha=True, return_depth=False,
                              runtime_checks=False, **perf)
    bg = jnp.zeros((3,), jnp.float32)

    print(f'== teapot bs{BATCH_SIZE} raster {is_}^2 (AA internal) '
          f'caps={args.caps} ==', flush=True)

    # ---- forward stages ----
    fim, depth_scan = timeit(
        'fwd: pallas face_index_map',
        jax.jit(lambda f: forward_pallas.forward_face_index_map(s_rgb, f)),
        fc)

    def prep(f, i):
        """Per-pixel recompute shared by all backward stages (stays inside
        each stage's jit; layouts never cross the boundary)."""
        face_w = forward_xla.gather_face_rows(f, i)
        wm, dm, _ = forward_xla.winner_attributes(s_rgb, f, i, face_w,
                                                  need_face_inv=False)
        rgbm = tex.sample_textures(s_rgb, f, t2, i, face_w, wm, dm)
        alpha = (i >= 0).astype(jnp.float32)
        return face_w, wm, dm, rgbm, alpha

    timeit('fwd: prep recompute (gather+attrs+texture)',
           jax.jit(lambda f, i: jax.tree.map(jnp.sum, prep(f, i))), fc, fim)

    timeit('fwd: full rasterize_core',
           jax.jit(lambda f, t: rcore.rasterize_core(s_rgb, f, t, bg)),
           fc, t2)

    # ---- backward stages (each: prep + stage; subtract prep time) ----
    def k5(f, i):
        face_w, wm, dm, rgbm, alpha = prep(f, i)
        g_rgb = jnp.ones_like(rgbm)
        g_alpha = jnp.ones_like(alpha)
        return bwd.grad_faces_pixel_map(s_rgb, f, i, face_w, rgbm, alpha,
                                        g_rgb, g_alpha)

    timeit('bwd: prep + K5 grad_faces_pixel_map', jax.jit(k5), fc, fim)

    import dataclasses
    s_noout = dataclasses.replace(s_rgb, grad_out_cap=0)

    def k5_in(f, i):
        face_w, wm, dm, rgbm, alpha = prep(f, i)
        return bwd.grad_faces_pixel_map(s_noout, f, i, face_w, rgbm, alpha,
                                        jnp.ones_like(rgbm),
                                        jnp.ones_like(alpha))

    timeit('bwd: prep + K5 in-sweep only (cap=0)', jax.jit(k5_in), fc, fim)

    def k6(f, i):
        face_w, wm, dm, rgbm, alpha = prep(f, i)
        return tex.grad_textures(s_rgb, f, i, face_w, wm, dm,
                                 jnp.ones_like(rgbm), t2.shape)

    timeit('bwd: prep + K6 grad_textures', jax.jit(k6), fc, fim)

    s_d = RasterizeSettings(image_size=is_, return_rgb=False,
                            return_alpha=False, return_depth=True,
                            runtime_checks=False)

    def k7(f, i):
        face_w = forward_xla.gather_face_rows(f, i)
        wm, dm, fiv = forward_xla.winner_attributes(s_d, f, i, face_w,
                                                    need_face_inv=True)
        return bwd.grad_faces_depth(s_d, f, i, face_w, fiv, wm, dm,
                                    jnp.ones_like(dm))

    timeit('bwd: prep + K7 grad_faces_depth', jax.jit(k7), fc, fim)

    # ---- end-to-end ----
    def loss(f, t):
        rgb, a, d = rcore.rasterize_core(s_rgb, f, t, bg)
        return jnp.sum(rgb) + jnp.sum(a)

    timeit('e2e: rasterize fwd+bwd (core only)',
           jax.jit(jax.grad(loss, argnums=(0, 1))), fc, t2)

    renderer = nr.Renderer()
    renderer.image_size = IMAGE_SIZE
    renderer.eye = eye
    renderer.perf_overrides = dict(runtime_checks=False, **perf)

    def full_loss(v, t):
        return jnp.sum(renderer.render(v, faces_i, t))

    timeit('e2e: full render fwd+bwd (bench workload)',
           jax.jit(jax.grad(full_loss, argnums=(0, 1))), vertices, textures)


if __name__ == '__main__':
    main()
