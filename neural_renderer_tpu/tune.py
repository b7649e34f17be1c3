"""Per-scene performance tuning: measure a scene's exact capacity needs
and configure a ``Renderer`` for maximum throughput with zero approximation.

The rasterizer's performance knobs (``RasterizeSettings``: ``grad_out_cap``,
``grad_offset_radius``, ``faces_per_tile_cap``, ``grad_csr_rows``) are
exact *iff* they cover the scene being rendered — defaults are exact but
leave the fast compacted/CSR paths off.  ``tune`` measures the worst case
over a set of camera poses and sets ``renderer.perf_overrides`` to values
that are provably exact for every measured pose (the same validation the
benchmark harness performs; the renderer's ``runtime_checks`` additionally
warn at run time if a scene ever exceeds them).

The reference needs no equivalent — its CUDA kernels allocate per-scene on
the fly; XLA's static shapes are the price of the ahead-of-time compiled,
deterministic TPU pipeline.

Typical use::

    renderer = nr.Renderer()
    nr.tune(renderer, vertices, faces,
            eyes=[nr.get_points_from_angles(2.732, 30, a)
                  for a in range(0, 360, 15)])
    step = jax.jit(jax.value_and_grad(loss))   # now runs the fast paths
"""

import jax
import jax.numpy as jnp
import numpy as np


def measure_scene(settings, face_coords):
    """Exact capacity requirements of one NDC scene ``[bs, nf, 3, 3]``.

    Returns a dict: ``out_crossings`` (grad_out_cap requirement),
    ``row_crossings`` (per-row, must stay <= grad_row_cap for the Pallas
    out-sweep), ``out_offset`` (grad_offset_radius requirement - 1),
    ``binned_faces`` (faces_per_tile_cap requirement), ``csr_rows``
    (grad_csr_rows requirement)."""
    from neural_renderer_tpu.rasterize import backward, forward_pallas
    from neural_renderer_tpu.rasterize import forward_xla

    # the XLA oracle forward: exact on every backend with no capacity
    # limits of its own (the Pallas forward's auto cap could bias the
    # measurement on exactly the scenes that need tuning most)
    fim = forward_xla.forward_face_index_map(settings, face_coords)[0]
    out = dict(
        out_crossings=backward.count_out_crossings(
            settings, face_coords, fim),
        row_crossings=backward.count_out_crossings(
            settings, face_coords, fim, per_row=True),
        out_offset=backward.max_out_offset(settings, face_coords, fim),
        binned_faces=forward_pallas.binning_overflow(settings, face_coords),
    )
    if face_coords.shape[1] <= forward_pallas.slice_size():
        # CSR face reduction is single-pass-only; multi-pass meshes use
        # the global segment reduction (no capacity to tune)
        out['csr_rows'] = forward_pallas.csr_rows_needed(
            settings, face_coords)
    return out


def tune(renderer, vertices, faces, eyes=None, margin=1.25, textures=None,
         measure=False, measure_iters=8):
    """Measure ``renderer``'s workload on a scene over camera poses and set
    ``renderer.perf_overrides`` to provably-exact fast-path capacities.

    Args:
      renderer: a ``Renderer`` whose camera / image settings to honor.
      vertices: ``[nv, 3]`` or ``[bs, nv, 3]`` vertex positions.
      faces: matching int faces ``[nf, 3]`` or ``[bs, nf, 3]``.
      eyes: iterable of camera positions to cover (each anything
        ``renderer.eye`` accepts).  None = the renderer's current eye.
      margin: multiplier applied to the measured requirements before
        rounding up, to absorb small pose/geometry drift during an
        optimization loop (1.0 = exactly the measured poses).  The
        capacities stay *validated* for the measured poses either way, and
        ``runtime_checks`` warns if a later scene outgrows them.
      textures: optional ``[bs, nf, ts, ts, ts, 3]`` cubes — with
        ``measure=True`` the A/B probe then times the textured render
        (the workload the caller will actually run) instead of
        silhouettes.
      measure: A/B-guard the result: time one fwd+bwd step under the
        tuned overrides against the renderer's current (default) config
        on ``eyes[0]`` and install the overrides ONLY if they win — the
        auto fast path has grown strong enough that exact-fit static
        capacities are not automatically faster (BENCH_r04: tuned 251.6
        vs default 265.1), and a tune() that loses to doing nothing is
        worse than a no-op.  Costs two step compiles + ~2 x
        ``measure_iters`` timed steps.  When the probe says the default
        wins, the renderer is left untouched and {} is returned.
      measure_iters: timed dispatches per probe sweep (two sweeps each,
        best-of, async dispatch with one readback).

    Returns the override dict (also assigned to the renderer), or ``{}``
    when ``measure=True`` and the tuned config did not beat the default.
    """
    from neural_renderer_tpu.ops.vertices_to_faces import vertices_to_faces
    from neural_renderer_tpu.rasterize.config import RasterizeSettings

    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces)
    if vertices.ndim == 2:
        vertices = vertices[None]
    if faces.ndim == 2:
        faces = faces[None]
    faces_user = faces          # pre-fill_back: the A/B probe renders
    if renderer.fill_back:      # through the public API, which fills
        faces = renderer._fill_back_faces(faces)

    # anti_aliasing=True renders everything at 2x; 'approx' renders the
    # VALUE at 2x but the whole differentiable pass (where every grad_*
    # capacity lives) at 1x — measure the backward capacities at the size
    # the backward actually runs, and the binning capacity at both sizes
    # (faces_per_tile_cap applies to both passes).
    aa = renderer.anti_aliasing
    value_size = renderer.image_size * (2 if aa else 1)
    grad_size = renderer.image_size if aa == 'approx' else value_size

    def make_settings(size):
        return RasterizeSettings(
            image_size=size, near=float(renderer.near),
            far=float(renderer.far), return_rgb=False, return_alpha=True,
            return_depth=False, runtime_checks=False)

    settings = make_settings(grad_size)

    saved_eye = renderer.eye
    if eyes is None:
        eyes = [saved_eye]

    def coords(v, eye):
        # eye is a traced argument (NOT baked into the jit cache: a closure
        # read would freeze the first pose into the compiled program)
        renderer.eye = eye
        return vertices_to_faces(renderer._transform(v), faces)

    from neural_renderer_tpu.rasterize import backward, forward_pallas
    from neural_renderer_tpu.rasterize import forward_xla

    # phase 1 — binning capacity: cheap pure-XLA count (over every render
    # size in play: 'approx' AA runs two forwards, 2x value + 1x grad)
    bin_settings = sorted({value_size, grad_size})

    @jax.jit
    def measure_bins(v, eye):
        fc = coords(v, eye)
        return [forward_pallas.binning_overflow(make_settings(sz), fc)
                for sz in bin_settings]

    worst = {}
    try:
        for eye in eyes:
            for b in measure_bins(vertices, jnp.asarray(eye, jnp.float32)):
                worst['binned_faces'] = max(worst.get('binned_faces', 0),
                                            int(np.asarray(b)))

        # phase 2 — backward capacities, from a face-index map rendered at
        # a cap that phase 1 proved covering (the fast Pallas forward when
        # available; the XLA oracle elsewhere).  csr_rows is ALSO measured
        # here, with s2: counts clamp at faces_per_tile_cap, so measuring
        # with the default-cap settings would undercount CSR chunks on any
        # scene whose patches bin beyond the auto heuristic cap — and an
        # undersized grad_csr_rows silently drops gradient work.
        import dataclasses
        cap = max(128, -(-worst['binned_faces'] // 128) * 128)
        s2 = dataclasses.replace(settings, faces_per_tile_cap=cap)
        use_pallas = forward_pallas.supported(s2, faces)  # shape-only check
        # CSR face reduction exists only on the single-pass forward;
        # multi-pass (large-mesh) renders reduce via the global segment_sum
        use_csr = faces.shape[1] <= forward_pallas.slice_size()

        # the compact forward schedule's entry budget — measured at every
        # render size in play (one knob serves both of 'approx' AA's
        # passes; schedule_budget clamps at the dense size per pass), with
        # the tuned cap applied (counts clamp at faces_per_tile_cap)
        s2sizes = [dataclasses.replace(make_settings(sz),
                                       faces_per_tile_cap=cap)
                   for sz in bin_settings]

        @jax.jit
        def measure_sweeps(v, eye):
            fc = coords(v, eye)
            if use_pallas:
                fim, _ = forward_pallas.forward_face_index_map(s2, fc)
            else:
                fim = forward_xla.forward_face_index_map(s2, fc)[0]
            chunks = jnp.max(jnp.stack(
                [forward_pallas.chunks_needed(s, fc) for s in s2sizes]))
            return (backward.count_out_crossings(s2, fc, fim),
                    backward.count_out_crossings(s2, fc, fim, per_row=True),
                    backward.max_out_offset(s2, fc, fim),
                    forward_pallas.csr_rows_needed(s2, fc) if use_csr
                    else jnp.int32(0),
                    chunks)

        for eye in eyes:
            oc, rc, oo, c, ch = measure_sweeps(vertices,
                                               jnp.asarray(eye, jnp.float32))
            worst['out_crossings'] = max(worst.get('out_crossings', 0),
                                         int(np.asarray(oc)))
            worst['row_crossings'] = max(worst.get('row_crossings', 0),
                                         int(np.asarray(rc)))
            worst['out_offset'] = max(worst.get('out_offset', 0),
                                      int(np.asarray(oo)))
            worst['csr_rows'] = max(worst.get('csr_rows', 0),
                                    int(np.asarray(c)))
            worst['chunks'] = max(worst.get('chunks', 0),
                                  int(np.asarray(ch)))
    finally:
        renderer.eye = saved_eye

    def up(v, unit):
        return max(unit, -(-int(v * margin) // unit) * unit)

    overrides = dict(
        faces_per_tile_cap=up(worst['binned_faces'], 128),
        grad_out_cap=up(worst['out_crossings'], 1024),
        grad_offset_radius=worst['out_offset'] + 1,
        # keep the compact (patch, chunk) forward grid: an explicit
        # faces_per_tile_cap alone would drop the forward onto the dense
        # patches x capacity schedule (schedule_budget guards lean budgets
        # behind the auto path's cond) — measured as the tuned path's main
        # loss vs default in r4 (251.6 vs 265.1 img/s)
        forward_chunk_budget=up(worst['chunks'], 64),
    )
    if worst['csr_rows']:
        # csr_base requires >= 2 chunks (data + dump)
        overrides['grad_csr_rows'] = max(256, up(worst['csr_rows'], 128))
    if worst['row_crossings'] > RasterizeSettings.grad_row_cap:
        # the Pallas out-sweep's row capacity is a compile-time kernel
        # parameter (chunks of 64 record slots) — raise it to cover the
        # measured worst row instead of losing the kernel entirely.  Cost
        # scales only in skipped grid steps for sparser rows.
        overrides['grad_row_cap'] = up(worst['row_crossings'], 64)

    if measure:
        import time

        def probe(install):
            prev = dict(renderer.perf_overrides)
            if install:
                renderer.perf_overrides = dict(prev, **overrides)
            try:
                if textures is None:
                    def loss(v, eye):
                        renderer.eye = eye
                        return jnp.sum(
                            renderer.render_silhouettes(v, faces_user))
                    fn = jax.jit(jax.value_and_grad(loss))
                    args = (vertices,)
                else:
                    def loss(v, tx, eye):
                        renderer.eye = eye
                        return jnp.sum(renderer.render(v, faces_user, tx))
                    fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
                    args = (vertices, jnp.asarray(textures, jnp.float32))
                eye0 = jnp.asarray(eyes[0], jnp.float32)
                out = fn(*args, eye0)                 # compile + warm
                _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
                best = float('inf')
                for _sweep in range(2):               # best-of-2 (noise)
                    t0 = time.perf_counter()
                    for _i in range(measure_iters):
                        out = fn(*args, eye0)
                    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
                    best = min(best,
                               (time.perf_counter() - t0) / measure_iters)
                return best
            finally:
                renderer.eye = saved_eye
                renderer.perf_overrides = prev

        t_default = probe(install=False)
        t_tuned = probe(install=True)
        if not t_tuned < t_default:
            import warnings
            warnings.warn(
                f'nr.tune: measured step {t_tuned * 1e3:.2f} ms under the '
                f'tuned capacities vs {t_default * 1e3:.2f} ms default — '
                'the default (auto fast path) already wins on this scene; '
                'leaving the renderer untuned.')
            return {}

    renderer.perf_overrides = dict(renderer.perf_overrides, **overrides)
    return overrides
