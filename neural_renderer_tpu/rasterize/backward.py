"""Backward pass: the paper's approximate vertex gradient (K5) re-derived
pixel-centrically, plus the analytic depth gradient (K7).

The reference K5 (``rasterize.py:517-748``) launches one CUDA thread per
(batch, face) which, for each of the face's 3 edges x 2 walk axes, serially
walks the columns (rows) crossed by the edge and, at every crossing, sweeps
pixels "out" toward the image border and "in" toward the opposite edge,
accumulating ``-diff_grad / dist`` whenever moving the edge over a pixel
would decrease the loss (``diff_grad > 0`` gating, rasterize.py:647,717).

Serial data-dependent walks don't map to TPU.  Two observations make the
same math fully parallel:

  * **in-sweep**: a pixel q participates in face fn's in-sweep iff
    ``face_index_map[q] == fn`` (rasterize.py:707) — i.e. q is *covered by
    its own face*.  So instead of walking from each crossing, every covered
    pixel independently reconstructs the unique crossing of its own face's
    edge with its own column/row and tests membership in the sweep interval.
    O(pixels x 6), exact, no caps, embarrassingly parallel.

  * **out-sweep**: a crossing is active iff its "in" pixel is visibly owned
    by the face (rasterize.py:604) — again discoverable per covered pixel
    (q is the in-pixel of its own face's crossing iff ``d1_in == q.d1``).
    Each active crossing then contributes a masked reduction along its full
    column/row, evaluated densely in row-chunks (exact; O(pixels x 6 x is)
    worst case, bounded working set).

All scatter accumulation is ``segment_sum`` — deterministic, no atomics.
Gradients are with respect to NDC face coordinates (the reference maps pixel
distances back with ``2/is``, rasterize.py:649), so they flow on through
``vertices_to_faces`` / ``perspective`` / ``look_at`` by plain JAX autodiff.
"""

import warnings

import jax
import jax.numpy as jnp

from neural_renderer_tpu.rasterize import checks, geometry

# (edge, axis) walk order — AXIS-major so the 12-channel K5 stacks are the
# two Pallas sweep kernels' native per-axis channel blocks concatenated
# (each kernel emits [bs, 6, is, is] = (c0, c1) x 3 edges for ONE axis);
# every consumer maps channels through _EA.index, so the order is free to
# choose and axis-major kills a 12-plane interleave relayout per stack
_EA = [(e, a) for a in range(2) for e in range(3)]


def _warn_out_cap(count, cap):
    if int(count) > int(cap):
        warnings.warn(
            f'rasterizer backward: {int(count)} active out-sweep crossings '
            f'but grad_out_cap={int(cap)} — overflow crossings are DROPPED '
            'and vertex gradients are wrong.  Raise grad_out_cap (validate '
            'with backward.count_out_crossings) or use grad_out_cap=None '
            '(dense, exact).')


def _warn_row_cap(worst, cap):
    if int(worst) > int(cap):
        warnings.warn(
            f'rasterizer backward: a row/column hosts {int(worst)} active '
            f'out-sweep crossings but grad_row_cap={int(cap)} — overflow '
            'records are DROPPED and vertex gradients are wrong.  Raise '
            'grad_row_cap (validate with count_out_crossings(per_row=True)).')


def _warn_offset_radius(worst, radius):
    if float(worst) > float(radius):
        warnings.warn(
            'rasterizer backward: an active crossing needs an out-pixel '
            f'offset of {float(worst):.0f} but grad_offset_radius='
            f'{float(radius):.0f} — those in-sweep contributions read the '
            'wrong pixel.  Raise grad_offset_radius (validate with '
            'backward.max_out_offset) or use None (exact gathers).')


def _edge_coords(ppx, ppy, e, a):
    """Walk-frame coordinates of the edge (and opposite vertex).

    ppx/ppy: ``[..., 3]`` pixel-space vertex coords of each pixel's face.
    Returns X (walk-axis coords) and Y (sweep-axis coords) for vertex order
    pi = [(e+0)%3, (e+1)%3, (e+2)%3] (rasterize.py:547-556).
    """
    pi = [(e + k) % 3 for k in range(3)]
    if a == 0:
        X = [ppx[..., i] for i in pi]
        Y = [ppy[..., i] for i in pi]
    else:
        X = [ppy[..., i] for i in pi]
        Y = [ppx[..., i] for i in pi]
    return X, Y


def _direction(X0, X1, a):
    """Sweep direction (rasterize.py:559-564): +-1 as f32."""
    if a == 0:
        return jnp.where(X0 < X1, -1.0, 1.0)
    return jnp.where(X0 < X1, 1.0, -1.0)


def _crossing(settings, X, Y, a, d0):
    """Per-crossing quantities at walk coordinate d0 (float arrays).

    Returns dict with direction, d1_cross, d1_in, d1_out (floats holding
    exact integers) and ``valid`` (crossing exists & on-screen,
    rasterize.py:567-579).
    """
    is_ = settings.image_size
    X0, X1, _ = X
    Y0, Y1, _ = Y
    direction = _direction(X0, X1, a)

    # d0 loop bounds (rasterize.py:568-569); C float->int truncation on the
    # upper bound is emulated with trunc.
    d0_from = jnp.maximum(jnp.ceil(jnp.minimum(X0, X1)), 0.0)
    d0_to = jnp.trunc(jnp.minimum(jnp.maximum(X0, X1), is_ - 1.0))
    in_extent = (d0 >= d0_from) & (d0 <= d0_to)

    d1_cross = (Y1 - Y0) / (X1 - X0) * (d0 - X0) + Y0
    d1_in = jnp.where(direction > 0, jnp.floor(d1_cross), jnp.ceil(d1_cross))
    d1_out = d1_in + direction

    ok = (in_extent
          & (d1_in >= 0) & (d1_in <= is_ - 1)
          & (d1_out >= 0) & (d1_out <= is_ - 1))
    return dict(direction=direction, d1_cross=d1_cross,
                d1_in=d1_in, d1_out=d1_out, valid=ok)


def _in_limit(settings, X, Y, d0, direction):
    """Opposite-edge sweep limit for the in-sweep (rasterize.py:663-670)."""
    X0, X1, X2 = X
    Y0, Y1, Y2 = Y
    mid = (d0 - X0) * (d0 - X2) < 0
    c_a = (Y2 - Y0) / (X2 - X0) * (d0 - X0) + Y0
    c_b = (Y1 - Y2) / (X1 - X2) * (d0 - X2) + Y2
    d0_cross2 = jnp.where(mid, c_a, c_b)
    lim = jnp.where(direction > 0, jnp.ceil(d0_cross2), jnp.floor(d0_cross2))
    # CUDA float->int of NaN yields 0; +-inf saturates (then clamps to the
    # screen in the min/max downstream, which jnp.minimum/maximum handle).
    return jnp.where(jnp.isnan(lim), 0.0, lim)


def _dist_contrib(settings, diff_grad, delta, X0, X1, d0):
    """The two ``-diff_grad / dist`` terms (rasterize.py:648-657,719-728).

    Returns (c0, c1): contribution to vertex pi[0] and pi[1] (sweep-axis
    coordinate), already gated on ``diff_grad > 0``.
    """
    is_ = settings.image_size
    eps = settings.eps
    gate = diff_grad > 0

    def one(k_num, k_den):
        dist = k_num / k_den * delta * 2.0 / is_
        dist = jnp.where(dist > 0, dist + eps, dist - eps)
        return -diff_grad / dist

    c0 = jnp.where(gate & (X1 != d0), one(X1 - X0, X1 - d0), 0.0)
    c1 = jnp.where(gate & (X0 != d0), one(X1 - X0, d0 - X0), 0.0)
    return c0, c1


def _offset_select(m, delta, axis, radius):
    """``m[b, .., i + delta, ..]`` along ``axis`` for |delta| <= radius.

    A (2R+1)-way select over statically shifted copies — XLA fuses it into
    sliding-window elementwise work (~ns/element) instead of the ~40ns/index
    scalar gathers TPU would otherwise use.  Out-of-range deltas produce 0
    (callers mask those pixels via crossing validity anyway).
    """
    delta = delta.astype(jnp.int32)
    pads = [(0, 0)] * m.ndim
    pads[axis] = (radius, radius)
    padded = jnp.pad(m, pads)
    out = jnp.zeros_like(m)
    extra = (Ellipsis,) + (None,) * (m.ndim - 3)
    for s in range(-radius, radius + 1):
        start = [0] * m.ndim
        start[axis] = s + radius
        limit = list(m.shape)
        limit[axis] = m.shape[axis] + s + radius
        shifted = jax.lax.slice(padded, start, limit)
        out = jnp.where((delta == s)[extra], shifted, out)
    return out


def _out_pixel_values(settings, m, a, d1_out, d1, d0):
    """Value of the crossing's out-pixel for every pixel (q = (d1, d0) in
    walk-frame): either a bounded shifted select (fast path) or an exact
    per-pixel gather."""
    is_ = settings.image_size
    r = settings.grad_offset_radius
    if r is not None:
        delta = jnp.clip(d1_out - d1, -(r + 1), r + 1)
        return _offset_select(m, delta, 1 if a == 0 else 2, r)
    out_d1 = jnp.clip(d1_out, 0, is_ - 1).astype(jnp.int32)
    d0_i = d0.astype(jnp.int32)
    row_o = out_d1 if a == 0 else d0_i
    col_o = d0_i if a == 0 else out_d1
    return _map_gather(m, row_o, col_o)


def max_out_offset(settings, faces, face_index_map):
    """Max |d1_out - pixel| over valid crossings of covered pixels — the
    minimum safe ``grad_offset_radius`` for this scene."""
    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    covered = face_index_map >= 0
    fidx = jnp.clip(face_index_map, 0, nf - 1)
    face_w = jnp.take_along_axis(
        faces.reshape(bs, nf, 9), fidx.reshape(bs, -1, 1), axis=1
    ).reshape(bs, is_, is_, 3, 3)
    ppx = geometry.to_pixel_coords(face_w[..., 0], is_)
    ppy = geometry.to_pixel_coords(face_w[..., 1], is_)
    yi = jnp.broadcast_to(
        jnp.arange(is_, dtype=jnp.float32)[None, :, None], (bs, is_, is_))
    xi = jnp.broadcast_to(
        jnp.arange(is_, dtype=jnp.float32)[None, None, :], (bs, is_, is_))
    worst = 0.0
    for e, a in _EA:
        X, Y = _edge_coords(ppx, ppy, e, a)
        d0 = xi if a == 0 else yi
        d1 = yi if a == 0 else xi
        cr = _crossing(settings, X, Y, a, d0)
        off = jnp.where(covered & cr['valid'],
                        jnp.abs(cr['d1_out'] - d1), 0.0)
        worst = jnp.maximum(worst, off.max())
    return worst


def _map_gather(m, row, col):
    """m: [bs, is, is(, c)]; row/col: [bs, ...] int32 -> gathered values.

    Formulated as take_along_axis over the flattened pixel axis — XLA lowers
    this to a fast vectorized gather, whereas vmap'd integer indexing picks
    a scalar-loop lowering (~100x slower, measured).
    """
    bs, is_ = m.shape[0], m.shape[1]
    flat = m.reshape(bs, is_ * is_, *m.shape[3:])
    idx = (row * is_ + col).reshape(bs, -1)
    if flat.ndim == 3:
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out.reshape(row.shape + m.shape[3:])
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(row.shape)


def face_segments(settings, faces, face_index_map):
    """Per-pixel segment ids (pixel -> its face's [bs*nf] slot; uncovered
    pixels route to the ``bs*nf`` overflow bucket).  Shared by the K5 / K6
    (ts=2) / K7 scatter so ``core._bwd`` pays the segment reduction ONCE."""
    bs, nf = faces.shape[:2]
    covered = face_index_map >= 0
    fidx = jnp.clip(face_index_map, 0, nf - 1)
    return jnp.where(
        covered,
        jnp.arange(bs, dtype=jnp.int32)[:, None, None] * nf + fidx,
        bs * nf)


def _auto_channels(settings, faces, face_index_map, face_w, rgb_map,
                   alpha_map, grad_rgb_map, grad_alpha_map):
    """Auto fast path: Pallas in/out-sweep kernels at static auto
    capacities, each under a runtime exactness guard (lax.cond) that falls
    back to the capacity-free XLA path when the scene exceeds the
    capacity.  The kernels run SPECULATIVELY and report the scene's actual
    capacity requirements themselves (stats measured where the crossing
    math already lives — a dense XLA stats pre-pass measured 63 ms/step at
    512^2 bs32, dwarfing the kernels it guarded); the cond then either
    keeps the kernel result or recomputes exactly.  Scenes that fit pay
    ~nothing for the guard; scenes that overflow pay kernel + fallback for
    that step.  Returns the stacked 12 channels (extra is always None)."""
    import dataclasses

    from neural_renderer_tpu.rasterize import backward_pallas
    from neural_renderer_tpu.rasterize import config as rconfig

    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    covered = face_index_map >= 0
    ppx = geometry.to_pixel_coords(face_w[..., 0], is_)
    ppy = geometry.to_pixel_coords(face_w[..., 1], is_)
    yi = jnp.broadcast_to(
        jnp.arange(is_, dtype=jnp.float32)[None, :, None], (bs, is_, is_))
    xi = jnp.broadcast_to(
        jnp.arange(is_, dtype=jnp.float32)[None, None, :], (bs, is_, is_))

    radius = rconfig.auto_offset_radius(is_)
    s_in = dataclasses.replace(settings, grad_offset_radius=radius)

    # speculative kernel runs; each reports its own worst-case stat.
    # channel-LEADING stacks ([bs, 12, is, is]): the fused reduction's
    # consumers (the CSR partial kernel, the channel slicing) all run on
    # channel-leading layouts, and each kernel natively emits its axis's
    # [bs, 6, is, is] block in _EA's axis-major channel order — the
    # 12-channel stack is a pure concat, no interleave relayout
    in6 = []
    off_worst = None
    for a in (0, 1):
        six, ow = backward_pallas.insweep_channels(
            s_in, a, ppx, ppy, alpha_map, grad_alpha_map,
            rgb_map if settings.return_rgb else None,
            grad_rgb_map if settings.return_rgb else None)
        off_worst = ow if off_worst is None else jnp.maximum(off_worst, ow)
        in6.append(six)
    in12k = jnp.concatenate(in6, axis=1)

    s1_map = jnp.zeros_like(alpha_map)
    if settings.return_alpha:
        s1_map = s1_map + alpha_map * grad_alpha_map
    if settings.return_rgb:
        s1_map = s1_map + jnp.sum(rgb_map * grad_rgb_map, axis=-1)
    out6 = []
    row_worst = None
    for a in (0, 1):
        # compact (block, chunk) schedule; on schedule overflow the kernel
        # internally takes its dense Pallas grid, so the result is exact
        # whenever row_worst fits — `fits` is diagnostics only, never an
        # exactness condition (r5: gating the XLA fallback on it cost one
        # bench azimuth ~0.5 s/step)
        six, rw, _fits = backward_pallas.outsweep_channels(
            settings, a, ppx, ppy, alpha_map, s1_map, grad_alpha_map,
            grad_rgb_map if settings.return_rgb else None,
            rgb_map if settings.return_rgb else None,
            row_cap=settings.grad_row_cap, compact=True)
        row_worst = rw if row_worst is None else jnp.maximum(row_worst, rw)
        out6.append(six)
    out12k = jnp.concatenate(out6, axis=1)

    def in_xla(_):
        chans = []
        for e, a in _EA:
            X, Y = _edge_coords(ppx, ppy, e, a)
            d0 = xi if a == 0 else yi
            d1 = yi if a == 0 else xi
            cr = _crossing(settings, X, Y, a, d0)
            lim = _in_limit(settings, X, Y, d0, cr['direction'])
            lo2 = jnp.maximum(jnp.minimum(cr['d1_in'], lim), 0.0)
            hi2 = jnp.minimum(jnp.maximum(cr['d1_in'], lim), is_ - 1.0)
            act_in = covered & cr['valid'] & (d1 >= lo2) & (d1 <= hi2)
            dg = jnp.zeros_like(d0)
            if settings.return_alpha:
                a_out = _out_pixel_values(settings, alpha_map, a,
                                          cr['d1_out'], d1, d0)
                dg = dg + (alpha_map - a_out) * grad_alpha_map
            if settings.return_rgb:
                rgb_out = _out_pixel_values(settings, rgb_map, a,
                                            cr['d1_out'], d1, d0)
                dg = dg + jnp.sum((rgb_map - rgb_out) * grad_rgb_map,
                                  axis=-1)
            delta = d1 - cr['d1_cross']
            c0, c1 = _dist_contrib(settings, dg, delta, X[0], X[1], d0)
            chans.append((jnp.where(act_in, c0, 0.0),
                          jnp.where(act_in, c1, 0.0)))
        return jnp.stack([c for pair in chans for c in pair], axis=1)

    def out_dense(_):
        chans = []
        for e, a in _EA:
            X, Y = _edge_coords(ppx, ppy, e, a)
            d0 = xi if a == 0 else yi
            d1 = yi if a == 0 else xi
            cr = _crossing(settings, X, Y, a, d0)
            act_out = covered & cr['valid'] & (cr['d1_in'] == d1)
            chans.append(_out_sweep(settings, a, act_out, cr, X, d0,
                                    alpha_map, rgb_map, grad_rgb_map,
                                    grad_alpha_map))
        return jnp.stack([c for pair in chans for c in pair], axis=1)

    in12 = jax.lax.cond(off_worst <= radius, lambda _: in12k, in_xla, 0)
    out12 = jax.lax.cond(row_worst <= settings.grad_row_cap,
                         lambda _: out12k, out_dense, 0)
    return in12 + out12, None


def pixel_map_channels(settings, faces, face_index_map, face_w, rgb_map,
                       alpha_map, grad_rgb_map, grad_alpha_map):
    """K5 per-pixel contributions: channel-leading ``[bs, 12, is, is]``
    (c0, c1 per edge x axis) to be segment-reduced by the caller, plus an
    already-reduced extra grad from the compacted out-sweep (or None when
    the out-sweep is dense — then it's folded into the channels)."""
    from neural_renderer_tpu.rasterize import backward_pallas
    if (settings.auto_fast
            and settings.grad_offset_radius is None
            and settings.grad_out_cap is None
            and backward_pallas.supported_outsweep(settings)):
        return _auto_channels(settings, faces, face_index_map, face_w,
                              rgb_map, alpha_map, grad_rgb_map,
                              grad_alpha_map)
    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    covered = face_index_map >= 0
    fidx = jnp.clip(face_index_map, 0, nf - 1)

    ppx = geometry.to_pixel_coords(face_w[..., 0], is_)   # [bs, is, is, 3]
    ppy = geometry.to_pixel_coords(face_w[..., 1], is_)

    yi = jnp.broadcast_to(
        jnp.arange(is_, dtype=jnp.float32)[None, :, None], (bs, is_, is_))
    xi = jnp.broadcast_to(
        jnp.arange(is_, dtype=jnp.float32)[None, None, :], (bs, is_, is_))

    act_out_masks = {}
    contribs = []          # per (e, a): (c0, c1) maps, reduced in ONE pass
    worst_offset = jnp.float32(0.0)   # runtime check for grad_offset_radius

    # In-sweep via the Pallas kernel when the bounded-offset contract is in
    # force (grad_offset_radius set): the out-pixel fetch + crossing math
    # fuse into one VMEM pass per axis instead of 2R+1 material shifted
    # copies per (edge, axis).  Note kernel c0/c1 require the same
    # alpha+rgb dg as this XLA path, so it only runs for the standard
    # mode combinations.
    from neural_renderer_tpu.rasterize import backward_pallas

    kernel_in = None
    if (settings.grad_offset_radius is not None
            and backward_pallas.supported(settings)):
        kernel_in = {}
        for a in (0, 1):
            six, ow = backward_pallas.insweep_channels(
                settings, a, ppx, ppy, alpha_map, grad_alpha_map,
                rgb_map if settings.return_rgb else None,
                grad_rgb_map if settings.return_rgb else None)
            # the kernel measures the scene's own offset requirement —
            # the runtime_checks warning needs no dense recompute
            worst_offset = jnp.maximum(worst_offset, ow.astype(jnp.float32))
            for e in range(3):
                kernel_in[(e, a)] = (six[:, 2 * e], six[:, 2 * e + 1])

    # Out-sweep Pallas kernel: fuses discovery, per-row record compaction,
    # and the border sweep — replaces the XLA mask compaction + chunked
    # sweeps entirely when the shape allows.
    use_out_kernel = (settings.grad_out_cap is not None
                      and backward_pallas.supported_outsweep(settings))
    need_checks = settings.runtime_checks and checks.callbacks_enabled()
    row_overflow = jnp.int32(0)

    for e, a in _EA:
        # the loop's own crossing math is only needed for the paths that
        # stay in XLA (dense out-sweep, mask compaction) — both kernels
        # rederive it in VMEM and report their own capacity stats
        need_cr = (kernel_in is None or not use_out_kernel
                   or settings.grad_out_cap is None)
        if need_cr:
            X, Y = _edge_coords(ppx, ppy, e, a)
            d0 = xi if a == 0 else yi
            d1 = yi if a == 0 else xi
            cr = _crossing(settings, X, Y, a, d0)

        if kernel_in is not None:
            c0, c1 = kernel_in[(e, a)]
        else:
            # -------------- in-sweep (exact, per covered pixel) -----------
            lim = _in_limit(settings, X, Y, d0, cr['direction'])
            lo2 = jnp.maximum(jnp.minimum(cr['d1_in'], lim), 0.0)
            hi2 = jnp.minimum(jnp.maximum(cr['d1_in'], lim), is_ - 1.0)
            act_in = covered & cr['valid'] & (d1 >= lo2) & (d1 <= hi2)

            if (settings.grad_offset_radius is not None
                    and settings.runtime_checks
                    and checks.callbacks_enabled()):
                worst_offset = jnp.maximum(worst_offset, jnp.max(jnp.where(
                    act_in, jnp.abs(cr['d1_out'] - d1), 0.0)))

            # out-pixel reference values (rasterize.py:688-695); only the
            # channels the mode uses are fetched (fetches are the expensive
            # op)
            dg = jnp.zeros_like(d0)
            if settings.return_alpha:
                a_out = _out_pixel_values(settings, alpha_map, a,
                                          cr['d1_out'], d1, d0)
                dg = dg + (alpha_map - a_out) * grad_alpha_map
            if settings.return_rgb:
                rgb_out = _out_pixel_values(settings, rgb_map, a,
                                            cr['d1_out'], d1, d0)
                dg = dg + jnp.sum((rgb_map - rgb_out) * grad_rgb_map,
                                  axis=-1)
            delta = d1 - cr['d1_cross']
            c0, c1 = _dist_contrib(settings, dg, delta, X[0], X[1], d0)
            c0 = jnp.where(act_in, c0, 0.0)
            c1 = jnp.where(act_in, c1, 0.0)

        # ---------------- out-sweep ---------------------------------------
        # r is the in-pixel of its own face's crossing iff d1_in == r.d1.
        if settings.grad_out_cap is None:
            act_out = covered & cr['valid'] & (cr['d1_in'] == d1)
            o0, o1 = _out_sweep(settings, a, act_out, cr, X, d0, alpha_map,
                                rgb_map, grad_rgb_map, grad_alpha_map)
            c0 = c0 + o0
            c1 = c1 + o1
        elif use_out_kernel:
            pass          # row capacity measured by the kernel itself
        else:
            act_out = covered & cr['valid'] & (cr['d1_in'] == d1)
            act_out_masks[(e, a)] = act_out

        contribs.append((c0, c1))

    if settings.grad_offset_radius is not None and need_checks:
        checks.maybe_callback(_warn_offset_radius, worst_offset,
                              jnp.float32(settings.grad_offset_radius))

    extra = None
    if use_out_kernel:
        s1_map = jnp.zeros_like(alpha_map)
        if settings.return_alpha:
            s1_map = s1_map + alpha_map * grad_alpha_map
        if settings.return_rgb:
            s1_map = s1_map + jnp.sum(rgb_map * grad_rgb_map, axis=-1)
        from neural_renderer_tpu.rasterize import backward_pallas
        for a in (0, 1):
            six, rw = backward_pallas.outsweep_channels(
                settings, a, ppx, ppy, alpha_map, s1_map, grad_alpha_map,
                grad_rgb_map if settings.return_rgb else None,
                rgb_map if settings.return_rgb else None,
                row_cap=settings.grad_row_cap)
            row_overflow = jnp.maximum(row_overflow, rw)
            for e in range(3):
                idx = _EA.index((e, a))
                c0, c1 = contribs[idx]
                contribs[idx] = (c0 + six[:, 2 * e], c1 + six[:, 2 * e + 1])
        if need_checks:
            checks.maybe_callback(_warn_row_cap, row_overflow,
                                  jnp.int32(settings.grad_row_cap))
    elif settings.grad_out_cap is not None:
        extra = jnp.zeros((bs, nf, 3, 3), jnp.float32)
        for a in (0, 1):
            masks = jnp.stack([act_out_masks[(e, a)] for e in range(3)],
                              axis=1)                        # [bs, 3, is, is]
            extra = extra + _out_sweep_compact(
                settings, a, masks, fidx, nf, ppx, ppy,
                alpha_map, rgb_map, grad_rgb_map, grad_alpha_map)

    stacked = jnp.stack([c for pair in contribs for c in pair], axis=1)
    return stacked, extra


def scatter_pixel_channels(sums, bs, nf, grad=None):
    """Distribute the 12 segment-reduced K5 channels into grad_faces rows.

    sums: ``[bs*nf, 12]`` (the caller's fused segment reduction).

    The channel->slot map is STATIC: slot (vertex v, coord c) receives
    exactly the c0 column of walk (e=v, a=1-c) plus the c1 column of walk
    (e=(v+2)%3, a=1-c) — so this is pure column arithmetic (6 adds + one
    stack), not 24 scatter-adds over bs*nf rows (~20 ns/row each on TPU).
    Bit-exact vs the scatter formulation: each slot sums the same two
    columns (two-term f32 addition is commutative)."""
    g2 = None if grad is None else grad.reshape(-1, 3, 3)
    cols = []
    for v in range(3):
        for c in range(2):
            ch0 = _EA.index((v, 1 - c))            # c0 of the (v, 1-c) walk
            ch1 = _EA.index(((v + 2) % 3, 1 - c))  # c1: (e+1)%3 == v
            c0, c1 = sums[:, 2 * ch0], sums[:, 2 * ch1 + 1]
            # scatter-order adds: the old loop applied whichever walk has
            # the lower channel index first (matters only when grad given)
            first, second = (c0, c1) if ch0 < ch1 else (c1, c0)
            cols.append(c0 + c1 if g2 is None
                        else (g2[:, v, c] + first) + second)
        cols.append(jnp.zeros_like(cols[-1]) if g2 is None
                    else g2[:, v, 2])              # z column (K5 is x/y-only)
    return jnp.stack(cols, axis=-1).reshape(bs, nf, 3, 3)


def grad_faces_pixel_map(settings, faces, face_index_map, face_w, rgb_map,
                         alpha_map, grad_rgb_map, grad_alpha_map):
    """K5: approximate d(loss)/d(faces x,y) from rgb/alpha map gradients.

    face_w: each pixel's own face rows (forward residual — covered pixels
    always hold front faces, so the reference's backface return at
    rasterize.py:540 is implicit).
    Returns grad_faces ``[bs, nf, 3, 3]`` (z rows zero).

    Standalone entry point (tests / profiling); the production path fuses
    the segment reduction with K6/K7 in ``core._bwd`` via
    ``pixel_map_channels``.
    """
    bs, nf = faces.shape[:2]
    stacked, extra = pixel_map_channels(
        settings, faces, face_index_map, face_w, rgb_map, alpha_map,
        grad_rgb_map, grad_alpha_map)
    seg_flat = face_segments(settings, faces, face_index_map).reshape(-1)
    # the barrier keeps per-pixel producers out of the scatter fusion,
    # whose fused producers lower to scalar loops
    stacked = jax.lax.optimization_barrier(stacked)
    # stacked is channel-LEADING [bs, 12, is, is]; segment_sum wants
    # pixel rows, so transpose channels to the minor axis first (matches
    # core._bwd's _global_reduce and grad_faces_depth)
    sums = jax.ops.segment_sum(
        jnp.transpose(stacked, (0, 2, 3, 1)).reshape(-1, 12), seg_flat,
        num_segments=bs * nf + 1)[:-1]
    grad = scatter_pixel_channels(sums, bs, nf)
    if extra is not None:
        grad = grad + extra
    return grad


def count_out_crossings(settings, faces, face_index_map, per_row=False):
    """Max active out-sweep crossings per (batch element, axis) — or, with
    ``per_row=True``, per image row (the capacity unit of the compacted
    path: it needs ``grad_out_cap // image_size`` slots per row).  Validate
    before trusting a compacted backward on a scene."""
    bs, nf = faces.shape[:2]
    is_ = settings.image_size
    covered = face_index_map >= 0
    fidx = jnp.clip(face_index_map, 0, nf - 1)
    face_w = jnp.take_along_axis(
        faces.reshape(bs, nf, 9), fidx.reshape(bs, -1, 1), axis=1
    ).reshape(bs, is_, is_, 3, 3)
    ppx = geometry.to_pixel_coords(face_w[..., 0], is_)
    ppy = geometry.to_pixel_coords(face_w[..., 1], is_)
    yi = jnp.broadcast_to(
        jnp.arange(is_, dtype=jnp.float32)[None, :, None], (bs, is_, is_))
    xi = jnp.broadcast_to(
        jnp.arange(is_, dtype=jnp.float32)[None, None, :], (bs, is_, is_))
    best = 0
    for a in (0, 1):
        total = 0
        for e in range(3):
            X, Y = _edge_coords(ppx, ppy, e, a)
            d0 = xi if a == 0 else yi
            d1 = yi if a == 0 else xi
            cr = _crossing(settings, X, Y, a, d0)
            act = covered & cr['valid'] & (cr['d1_in'] == d1)
            total = total + act.sum(
                axis=2 if per_row else (1, 2), dtype=jnp.int32)
        best = jnp.maximum(best, total.max())
    return best


def _out_sweep_compact(settings, a, masks, fidx, nf, ppx, ppy,
                       alpha_map, rgb_map, grad_rgb_map, grad_alpha_map):
    """Compacted out-sweep for one axis: gather the (rare) active crossings
    to a static per-batch cap, then sweep each along its full row/column.

    masks: [bs, 3(edges), is, is] bool activity from the dense discovery.
    Returns grad contribution [bs, nf, 3, 3].  Exact iff the per-batch
    active-crossing count <= settings.grad_out_cap (validate with
    ``count_out_crossings``); overflow records are dropped.
    """
    bs = masks.shape[0]
    is_ = settings.image_size
    cap = settings.grad_out_cap

    counts = masks.reshape(bs, -1).sum(axis=1)
    if settings.runtime_checks:
        checks.maybe_callback(_warn_out_cap, counts.max(), jnp.int32(cap))

    # Two-level compaction by prefix-rank INVERSION (scatter cost on TPU is
    # ~10ns/INDEX regardless of values, and jnp.nonzero's sort machinery
    # costs ~220ms/axis here):
    #   level 1: compact pixels HOSTING any of the 3 edge crossings — one
    #     scatter on the [bs, is*is] pixel domain (~84ms), carrying the
    #     3-bit edge mask packed into the value;
    #   level 2: expand each host's <=3 edge records — a scatter on the
    #     tiny [bs, cap*3] domain (~19ms).
    # Host count <= record count <= cap, so cap host slots provably
    # suffice.  Overflow ranks route to the dumpster slot `cap`.
    def compact(mask, values, out_cap):
        """mask/values [bs, N] -> values at the mask's ones, packed left
        into [bs, out_cap] slots (rank order)."""
        prefix = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        pos = jnp.where(mask, jnp.minimum(prefix - 1, out_cap), out_cap)
        src = jax.lax.optimization_barrier(  # scalar-fusion guard
            jnp.where(mask, values, 0))
        return jax.vmap(lambda p, s: jax.ops.segment_sum(
            s, p, num_segments=out_cap + 1))(pos, src)[:, :out_cap]

    host_bits = (masks[:, 0].astype(jnp.int32)
                 + masks[:, 1] * 2 + masks[:, 2] * 4).reshape(bs, -1)
    pix_idx = jnp.arange(is_ * is_, dtype=jnp.int32)[None]
    rec1 = compact(host_bits > 0, pix_idx * 8 + host_bits, cap)

    bits1 = rec1 & 7
    sub = jnp.concatenate(
        [(bits1 >> e) & 1 for e in range(3)], axis=1)        # [bs, cap*3]
    sub_val = jnp.concatenate(
        [(rec1 >> 3) * 4 + e for e in range(3)], axis=1)
    rec2 = compact(sub > 0, sub_val, cap)

    valid = (jnp.arange(cap, dtype=jnp.int32)[None, :]
             < jnp.minimum(counts, cap)[:, None])

    e_r = rec2 & 3
    pix_r = rec2 >> 2
    yi_r = pix_r // is_
    xi_r = pix_r % is_

    def gmap(m):
        return _map_gather(m, yi_r, xi_r)

    f_r = gmap(fidx)                                         # [bs, cap]
    ppx_r = gmap(ppx)                                        # [bs, cap, 3]
    ppy_r = gmap(ppy)
    a_in = gmap(alpha_map)
    rgb_in = gmap(rgb_map)

    # walk-frame coords with data-dependent edge index
    pi0 = e_r
    pi1 = (e_r + 1) % 3
    pi2 = (e_r + 2) % 3

    def vert(arr, pi):
        return jnp.take_along_axis(arr, pi[..., None], axis=-1)[..., 0]

    if a == 0:
        Xs = [vert(ppx_r, p) for p in (pi0, pi1, pi2)]
        Ys = [vert(ppy_r, p) for p in (pi0, pi1, pi2)]
    else:
        Xs = [vert(ppy_r, p) for p in (pi0, pi1, pi2)]
        Ys = [vert(ppx_r, p) for p in (pi0, pi1, pi2)]

    d0 = (xi_r if a == 0 else yi_r).astype(jnp.float32)
    cr = _crossing(settings, Xs, Ys, a, d0)
    d1_limit = jnp.where(cr['direction'] > 0, float(is_ - 1), 0.0)
    lo = jnp.maximum(jnp.minimum(cr['d1_out'], d1_limit), 0.0)
    hi = jnp.minimum(jnp.maximum(cr['d1_out'], d1_limit), is_ - 1.0)

    # sweep lines: record r's own column (a=0) / row (a=1).  The own-value
    # terms are pre-contracted with the grads per pixel (S1 = a*ga +
    # sum_c rgb_c*grgb_c), so each record's sweep fetches 5 line channels
    # (S1, ga, grgb*3) instead of 8 and does ~3 fewer ops per position:
    # dg(r, q') = S1(q') - a_in(r)*ga(q') - sum_c rgb_in_c(r)*grgb_c(q').
    s1_map = jnp.zeros_like(alpha_map)
    if settings.return_alpha:
        s1_map = s1_map + alpha_map * grad_alpha_map
    if settings.return_rgb:
        s1_map = s1_map + jnp.sum(rgb_map * grad_rgb_map, axis=-1)
    if a == 0:
        line_s1 = s1_map.transpose(0, 2, 1)
        line_ga = grad_alpha_map.transpose(0, 2, 1)
        line_grgb = grad_rgb_map.transpose(0, 2, 1, 3)
        line_id = xi_r
    else:
        line_s1, line_ga = s1_map, grad_alpha_map
        line_grgb = grad_rgb_map
        line_id = yi_r

    d1s = jnp.arange(is_, dtype=jnp.float32)

    rc = max(1, (64 * 1024 * 1024) // max(1, bs * is_ * 4))
    n_chunks = -(-cap // rc)
    pad = n_chunks * rc - cap

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
        return jnp.moveaxis(
            x.reshape((bs, n_chunks, rc) + x.shape[2:]), 1, 0)

    grids = jax.tree.map(prep, (
        valid.astype(jnp.float32), line_id, cr['d1_cross'], lo, hi,
        Xs[0], Xs[1], d0, a_in, rgb_in))

    def chunk_fn(args):
        (v_c, lid_c, d1c_c, lo_c, hi_c, X0_c, X1_c, d0_c,
         a_in_c, rgb_in_c) = args
        dg = _take_rows(line_s1, lid_c)                      # [bs, rc, is]
        if settings.return_alpha:
            lsga = _take_rows(line_ga, lid_c)
            dg = dg - a_in_c[..., None] * lsga
        if settings.return_rgb:
            lsgrgb = _take_rows(line_grgb, lid_c)
            dg = dg - jnp.sum(rgb_in_c[..., None, :] * lsgrgb, axis=-1)
        in_range = ((d1s >= lo_c[..., None]) & (d1s <= hi_c[..., None])
                    & (v_c[..., None] > 0))
        dg = jnp.where(in_range, dg, 0.0)
        delta = d1s - d1c_c[..., None]
        c0, c1 = _dist_contrib(settings, dg, delta,
                               X0_c[..., None], X1_c[..., None],
                               d0_c[..., None])
        return jnp.sum(c0, axis=-1), jnp.sum(c1, axis=-1)

    c0, c1 = jax.lax.map(chunk_fn, grids)
    c0 = jnp.moveaxis(c0, 0, 1).reshape(bs, -1)[:, :cap]
    c1 = jnp.moveaxis(c1, 0, 1).reshape(bs, -1)[:, :cap]
    c0 = jnp.where(valid, c0, 0.0)
    c1 = jnp.where(valid, c1, 0.0)

    # scatter-add into [bs, nf, 3, 3]: vertex pi0/pi1, coordinate (1 - a)
    grad = jnp.zeros((bs, nf, 3, 3), jnp.float32)
    b_idx = jnp.broadcast_to(jnp.arange(bs, dtype=jnp.int32)[:, None],
                             f_r.shape)
    grad = grad.at[b_idx, f_r, pi0, 1 - a].add(c0)
    grad = grad.at[b_idx, f_r, pi1, 1 - a].add(c1)
    return grad


def _out_sweep(settings, a, act_out, cr, X, d0,
               alpha_map, rgb_map, grad_rgb_map, grad_alpha_map):
    """Out-sweep totals per in-pixel r: masked reduction along r's column/row.

    Dense and exact.  Row-chunked with ``lax.map`` so the [rows, is, is]
    working set stays bounded by ``settings.grad_pixel_chunk``.
    Returns (c0, c1) with the same [bs, is, is] shape as the discovery grid.
    """
    is_ = settings.image_size
    bs = alpha_map.shape[0]

    d1_limit = jnp.where(cr['direction'] > 0, float(is_ - 1), 0.0)
    lo = jnp.maximum(jnp.minimum(cr['d1_out'], d1_limit), 0.0)
    hi = jnp.minimum(jnp.maximum(cr['d1_out'], d1_limit), is_ - 1.0)

    # Sweep line per r: its own column (a=0) / row (a=1).  Lay the maps out
    # as [bs, line_id, sweep_pos(, c)] so r's line is line[:, r_line_id].
    if a == 0:
        line_a = alpha_map.transpose(0, 2, 1)
        line_ga = grad_alpha_map.transpose(0, 2, 1)
        line_rgb = rgb_map.transpose(0, 2, 1, 3)
        line_grgb = grad_rgb_map.transpose(0, 2, 1, 3)
    else:
        line_a, line_ga = alpha_map, grad_alpha_map
        line_rgb, line_grgb = rgb_map, grad_rgb_map

    d1s = jnp.arange(is_, dtype=jnp.float32)

    # Row-chunking: pad image rows to a multiple of R, then lax.map.
    # grad_pixel_chunk bounds the [bs, R, is, is] working set per step.
    rows_per_chunk = max(1, min(is_, settings.grad_pixel_chunk
                                // max(1, is_ * bs)))
    n_chunks = -(-is_ // rows_per_chunk)
    pad = n_chunks * rows_per_chunk - is_

    def prep(x):
        """[bs, is, is] -> [n_chunks, bs, R, is] (row-padded)."""
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return (x.reshape(bs, n_chunks, rows_per_chunk, is_)
                .transpose(1, 0, 2, 3))

    grids = jax.tree.map(prep, (
        act_out.astype(jnp.float32), cr['d1_cross'], lo, hi,
        X[0], X[1], d0, alpha_map, rgb_map.transpose(0, 3, 1, 2)[:, 0],
        rgb_map.transpose(0, 3, 1, 2)[:, 1],
        rgb_map.transpose(0, 3, 1, 2)[:, 2],
    ))

    def chunk_fn(args):
        (act_c, d1c_c, lo_c, hi_c, X0_c, X1_c, d0_c,
         a_in_c, r0_c, r1_c, r2_c) = args
        rgb_in_c = jnp.stack([r0_c, r1_c, r2_c], axis=-1)
        # line values for every r in the chunk: [bs, R, is, is(, c)]
        if a == 0:
            # line_id == column index == third grid axis
            lsa = line_a[:, None, :, :]
            lsga = line_ga[:, None, :, :]
            lsrgb = line_rgb[:, None, :, :, :]
            lsgrgb = line_grgb[:, None, :, :, :]
        else:
            # line_id == row index == second grid axis: rows of this chunk.
            # Select the chunk's rows via the (integer) d0 of the chunk,
            # which equals the global row index for a == 1.
            ridx = d0_c[:, :, 0].astype(jnp.int32)          # [bs, R]
            lsa = _take_rows(line_a, ridx)[:, :, None, :]
            lsga = _take_rows(line_ga, ridx)[:, :, None, :]
            lsrgb = _take_rows(line_rgb, ridx)[:, :, None, :, :]
            lsgrgb = _take_rows(line_grgb, ridx)[:, :, None, :, :]

        dg = jnp.zeros(act_c.shape + (is_,), jnp.float32)
        if settings.return_alpha:
            dg = dg + (lsa - a_in_c[..., None]) * lsga
        if settings.return_rgb:
            dg = dg + jnp.sum(
                (lsrgb - rgb_in_c[..., None, :]) * lsgrgb, axis=-1)
        in_range = ((d1s >= lo_c[..., None])
                    & (d1s <= hi_c[..., None])
                    & (act_c[..., None] > 0))
        dg = jnp.where(in_range, dg, 0.0)
        delta = d1s - d1c_c[..., None]
        c0, c1 = _dist_contrib(settings, dg, delta,
                               X0_c[..., None], X1_c[..., None],
                               d0_c[..., None])
        return jnp.sum(c0, axis=-1), jnp.sum(c1, axis=-1)

    c0, c1 = jax.lax.map(chunk_fn, grids)
    c0 = c0.transpose(1, 0, 2, 3).reshape(bs, n_chunks * rows_per_chunk, is_)
    c1 = c1.transpose(1, 0, 2, 3).reshape(bs, n_chunks * rows_per_chunk, is_)
    return c0[:, :is_], c1[:, :is_]


def _take_rows(m, ridx):
    """m: [bs, is, ...]; ridx: [bs, R] int32 -> [bs, R, ...]."""
    return jax.vmap(lambda mm, ii: mm[ii])(m, ridx)


def depth_channels(settings, faces, face_index_map, face_w, face_inv_map,
                   weight_map, depth_map, grad_depth_map):
    """K7 per-pixel contributions, channel-leading ``[bs, 9, is, is]``
    (rasterize.py:794-847); channel ``v*3 + c`` is (vertex v, coord c).

    dL/dz_k += g * w_k * d^2 / z_k^2 ;
    dL/d(x,y)_k += -g * tmp_l * w_k * d^2 * is/2,
    tmp_l = sum_rows(-face_inv[row, l] / z_row).

    Per-channel multiply order matches the previous broadcast formulation
    bit-for-bit (left-associated elementwise products).
    """
    is_ = settings.image_size
    covered = face_index_map >= 0

    z = face_w[..., 2]                  # winner vertex depths [bs,is,is,3]

    d2 = depth_map * depth_map
    g = grad_depth_map

    tmp = jnp.sum(-face_inv_map / z[..., None], axis=-2)       # [bs,is,is,3]
    ng = -g
    chans = []
    for v in range(3):
        for c in range(2):
            chans.append(ng * tmp[..., c] * weight_map[..., v]
                         * d2 * (is_ / 2.0))
        chans.append(g * weight_map[..., v] * d2 / (z[..., v] * z[..., v]))
    contrib = jnp.stack(chans, axis=1)                # [bs, 9, is, is]
    return jnp.where(covered[:, None], contrib, 0.0)


def grad_faces_depth(settings, faces, face_index_map, face_w, face_inv_map,
                     weight_map, depth_map, grad_depth_map):
    """K7: standalone entry point (tests / profiling); production fuses the
    scatter with K5/K6 in ``core._bwd``.  Scatter-add per pixel into its
    face — segment_sum, no atomics."""
    bs, nf = faces.shape[:2]
    contrib = depth_channels(settings, faces, face_index_map, face_w,
                             face_inv_map, weight_map, depth_map,
                             grad_depth_map)
    seg = face_segments(settings, faces, face_index_map)
    contrib = jax.lax.optimization_barrier(contrib)   # scalar-fusion guard
    flat = jax.ops.segment_sum(
        contrib.transpose(0, 2, 3, 1).reshape(-1, 9), seg.reshape(-1),
        num_segments=bs * nf + 1)[:-1]
    return flat.reshape(bs, nf, 3, 3)
