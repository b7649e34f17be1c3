"""Attribute the approx-AA throughput between its two internal passes.

anti_aliasing='approx' = exact 2x VALUE pass (forward only, stop_gradient,
auto_fast=False, grad_csr_rows=None) + 1x grad pass (full fwd+bwd).  r4
shipped a 356.7 -> 87.6 img/s collapse in this mode with no api.py change,
so the culprit is in what those settings now select downstream.  This
harness times each pass in isolation with the bench protocol (async
dispatch, one readback).
"""

import os
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import neural_renderer_tpu as nr
from neural_renderer_tpu.rasterize import api

BS = 32
IS = 256
N = 8


def _sync(tree):
    _ = np.asarray(jax.tree.leaves(tree)[0].ravel()[0])


def timeit(name, fn, args_list):
    out = fn(*args_list[0])
    _sync(out)
    t0 = time.perf_counter()
    for a in args_list:
        out = fn(*a)
    _sync(out)
    ms = (time.perf_counter() - t0) / len(args_list) * 1e3
    print(f'{name:48s} {ms:8.2f} ms/step  {BS / ms * 1e3:8.1f} img/s',
          flush=True)
    return ms


def main():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests', 'data', 'teapot.obj')
    v, f = nr.load_obj(path)
    v = jnp.asarray(np.tile(v[None], (BS, 1, 1)))
    f = jnp.asarray(np.tile(f[None], (BS, 1, 1)))
    tx = jnp.ones((BS, f.shape[1], 2, 2, 2, 3), jnp.float32)

    azimuths = [float(a) for a in range(0, 360, 360 // N)]
    eyes = [jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(30), np.float32(az)))
        for az in azimuths]

    def mkrenderer(aa):
        r = nr.Renderer()
        r.image_size = IS
        r.anti_aliasing = aa
        return r

    # full approx mode (the regressed metric)
    ra = mkrenderer('approx')

    def loss_a(v, tx, eye):
        ra.eye = eye
        return jnp.sum(ra.render(v, f, tx))
    timeit('approx fwd+bwd (regressed metric)',
           jax.jit(jax.value_and_grad(loss_a, argnums=(0, 1))),
           [(v, tx, e) for e in eyes])

    # headline for scale
    rh = mkrenderer(True)

    def loss_h(v, tx, eye):
        rh.eye = eye
        return jnp.sum(rh.render(v, f, tx))
    timeit('exact-AA fwd+bwd (headline)',
           jax.jit(jax.value_and_grad(loss_h, argnums=(0, 1))),
           [(v, tx, e) for e in eyes])

    # grad pass alone: 1x render full fwd+bwd (defaults, 256^2, no pool)
    r1 = mkrenderer(False)

    def loss_g(v, tx, eye):
        r1.eye = eye
        return jnp.sum(r1.render(v, f, tx))
    timeit('1x grad pass alone (256^2 fwd+bwd)',
           jax.jit(jax.value_and_grad(loss_g, argnums=(0, 1))),
           [(v, tx, e) for e in eyes])

    # value pass alone: 2x forward only, with the approx overrides
    from neural_renderer_tpu.ops.transforms import (look_at, perspective)
    from neural_renderer_tpu.ops.vertices_to_faces import vertices_to_faces
    from neural_renderer_tpu.scene.renderer import Renderer

    def fwd_val(v, tx, eye, **ovr):
        fc = vertices_to_faces(perspective(look_at(v, eye), 30.0),
                               jnp.concatenate([f, f[:, :, ::-1]], 1))
        tx2 = jnp.concatenate([tx, tx], 1)
        out = api.rasterize_rgbad(
            fc, tx2, IS * 2, False, return_rgb=True, return_alpha=True,
            return_depth=False, **ovr)
        return out['rgb']

    timeit('2x value pass, approx overrides (auto_fast=False)',
           jax.jit(lambda v, tx, e: jnp.sum(
               fwd_val(v, tx, e, grad_csr_rows=None, auto_fast=False))),
           [(v, tx, e) for e in eyes])
    timeit('2x value pass, default overrides (auto_fast=True)',
           jax.jit(lambda v, tx, e: jnp.sum(fwd_val(v, tx, e))),
           [(v, tx, e) for e in eyes])


if __name__ == '__main__':
    main()
