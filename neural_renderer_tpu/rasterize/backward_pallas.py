"""Pallas TPU kernel for the K5 in-sweep (the per-pixel half of the paper's
approximate vertex gradient).

The XLA in-sweep (``backward.pixel_map_channels``) is dominated by the
out-pixel value fetch: for every pixel q, the value of its crossing's
out-pixel at lane ``d1_out`` — a per-pixel dynamic gather along the sweep
axis.  XLA's best formulation (pad + 2R+1 shifted selects) costs ~42 ms
per edge/axis pass at 512^2 bs32 because every shifted copy is material.
Here the whole in-sweep runs in one kernel per axis:

  * maps are laid out with the sweep axis on lanes (axis 0 passes get
    transposed inputs and outputs — cheap, HBM-bandwidth bound);
  * the bounded-offset fetch is a chain of 2R+1 single-lane rolls of the
    value planes held in vector registers, with a per-pixel select —
    no materialization, no MXU padding waste;
  * the crossing / gating / 1-dist contribution math (reference
    rasterize.py:661-730) is fused into the same pass, so each map is
    read from HBM exactly once per axis.

Exact iff every active pixel's |d1_out - d1| <= radius — the same
contract as ``RasterizeSettings.grad_offset_radius`` (validate with
``backward.max_out_offset``; ``runtime_checks`` warns at run time).
Rolls wrap, but a wrapped lane can only be selected if ``d1_out`` were
out of bounds, which the crossing validity test already excludes.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128


def _out_struct(shape, dtype, like):
    """vma-annotated out shape: composes with jax.shard_map (check_vma)."""
    vma = getattr(jax.typeof(like), 'vma', None)
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def supported(settings):
    if jax.default_backend() != 'tpu':
        return False
    if settings.grad_offset_radius is None:
        return False
    is_ = settings.image_size
    return is_ % _LANE == 0 and is_ % 8 == 0


def supported_outsweep(settings):
    if jax.default_backend() != 'tpu':
        return False
    is_ = settings.image_size
    return is_ % _LANE == 0 and is_ % 8 == 0


def _rows_per_block(is_):
    # small blocks: the unrolled 3-edge roll chain keeps a few hundred
    # [rows, is] temporaries live on Mosaic's VMEM stack
    for r in (16, 8):
        if is_ % r == 0:
            return r
    return is_


def _kernel(settings, dir_lt, radius, rows, is_, nch,
            in_ref, out_ref, stat_ref, *acc_refs):
    """One axis of the in-sweep.

    All per-pixel maps arrive as ONE stacked input ([1, nin, rows, is]
    block of a [bs, nin, is, is] array): plane order xs0-2, ys0-2, alpha
    (the coverage mask — always present), then the nch value planes
    (alpha again when return_alpha [, rgb x3]), then their nch grad
    planes.  One strided DMA per block visit replaces nin separate 32 KB
    block fetches — the per-transfer setup of 14 small DMAs per visit was
    the measured floor of this kernel (NOTES r5).  Channels emit into one
    [bs, 6, is, is] stacked output ((c0, c1) x 3 edges, the _EA axis-major
    block)."""
    eps = settings.eps

    i = pl.program_id(1)
    d0 = (i * rows
          + jax.lax.broadcasted_iota(jnp.int32, (rows, is_), 0)
          ).astype(jnp.float32)
    d1 = jax.lax.broadcasted_iota(jnp.int32, (rows, is_), 1).astype(
        jnp.float32)

    xs = [in_ref[0, k] for k in range(3)]
    ys = [in_ref[0, 3 + k] for k in range(3)]
    av = in_ref[0, 6]                       # coverage plane
    covered = av >= 0.5
    # the nch value planes and their grads, contiguous in the stack: the
    # roll chain consumes them as single [nch*rows, is] slabs (the leading
    # dims collapse is layout-free — sublane-tiled rows stay in place)
    stacked_v = in_ref[0, 7:7 + nch].reshape(nch * rows, is_)
    stacked_g = in_ref[0, 7 + nch:7 + 2 * nch].reshape(nch * rows, is_)
    s1 = jnp.zeros((rows, is_), jnp.float32)
    for cch in range(nch):
        s1 = s1 + in_ref[0, 7 + cch] * in_ref[0, 7 + nch + cch]

    # phase A: per-edge crossing math (reference rasterize.py:567-579,
    # 663-670; same op order as backward._crossing / _in_limit)
    per_edge = []
    for e in range(3):
        pi = [(e + k) % 3 for k in range(3)]
        X0, X1, X2 = (xs[p] for p in pi)
        Y0, Y1, Y2 = (ys[p] for p in pi)

        direction = jnp.where(X0 < X1, jnp.float32(dir_lt),
                              jnp.float32(-dir_lt))

        d0_from = jnp.maximum(jnp.ceil(jnp.minimum(X0, X1)), 0.0)
        d0_to = jnp.trunc(jnp.minimum(jnp.maximum(X0, X1), is_ - 1.0))
        in_extent = (d0 >= d0_from) & (d0 <= d0_to)
        d1_cross = (Y1 - Y0) / (X1 - X0) * (d0 - X0) + Y0
        d1_in = jnp.where(direction > 0, jnp.floor(d1_cross),
                          jnp.ceil(d1_cross))
        d1_out = d1_in + direction
        valid = (in_extent
                 & (d1_in >= 0) & (d1_in <= is_ - 1)
                 & (d1_out >= 0) & (d1_out <= is_ - 1))

        mid = (d0 - X0) * (d0 - X2) < 0
        c_a = (Y2 - Y0) / (X2 - X0) * (d0 - X0) + Y0
        c_b = (Y1 - Y2) / (X1 - X2) * (d0 - X2) + Y2
        d0_cross2 = jnp.where(mid, c_a, c_b)
        lim = jnp.where(direction > 0, jnp.ceil(d0_cross2),
                        jnp.floor(d0_cross2))
        lim = jnp.where(jnp.isnan(lim), 0.0, lim)
        lo2 = jnp.maximum(jnp.minimum(d1_in, lim), 0.0)
        hi2 = jnp.minimum(jnp.maximum(d1_in, lim), is_ - 1.0)
        act_in = covered & valid & (d1 >= lo2) & (d1 <= hi2)

        delta = (d1_out - d1).astype(jnp.int32)
        per_edge.append(dict(X0=X0, X1=X1, d1_cross=d1_cross,
                             act_in=act_in, delta=delta))

    # block-wide offset requirement, shared by the stat export and the
    # chunk-skip ladder below
    ov = None
    for e in range(3):
        m = jnp.where(per_edge[e]['act_in'],
                      jnp.abs(per_edge[e]['delta']), 0)
        ov = m if ov is None else jnp.maximum(ov, m)
    dmax = jnp.max(ov)

    # phase B: out-pixel value fetch (sum_c out_c * grad_c per edge).
    # The fetch is an exact (2R+1)-step single-lane roll chain — per-pixel
    # variable shifts admit no log-step shortcut (a rolled value carries
    # the NEIGHBOR's selection state; measured dead end, NOTES.md) — but
    # most 8/16-row blocks of a real scene only contain small offsets
    # (interior pixels have |delta| ~ 1; only silhouette-grazing rows
    # approach the radius).  The chain therefore runs in |s| chunks of
    # CHUNK steps, each guarded by pl.when(dmax >= chunk base): interior
    # blocks pay ~15 steps instead of 2R+1, and the cost scales with the
    # scene's actual offsets instead of the static radius.
    for e in range(3):
        acc_refs[e][...] = jnp.zeros((rows, is_), jnp.float32)

    def chain(lo, hi):
        """Accumulate select(delta == s, psum) for s in [lo, hi]."""
        outp = [jnp.zeros((rows, is_), jnp.float32) for _ in range(3)]
        rolled = (jnp.roll(stacked_v, -lo, axis=1) if lo else stacked_v)
        for s in range(lo, hi + 1):
            prod = rolled * stacked_g
            psum = prod if nch == 1 else sum(
                prod[c * rows:(c + 1) * rows] for c in range(nch))
            for e in range(3):
                outp[e] = jnp.where(per_edge[e]['delta'] == s, psum,
                                    outp[e])
            if s < hi:
                rolled = jnp.roll(rolled, -1, axis=1)
        for e in range(3):
            acc_refs[e][...] += outp[e]

    _CH = 8
    chain(-min(_CH - 1, radius), min(_CH - 1, radius))   # always: |s| < 8
    for k in range(1, (radius // _CH) + 1):
        lo, hi = k * _CH, min(k * _CH + _CH - 1, radius)

        @pl.when(dmax >= lo)
        def _far(lo=lo, hi=hi):
            chain(lo, hi)
            chain(-hi, -lo)

    outprod = [acc_refs[e][...] for e in range(3)]

    # stat export: per-row max |d1_out - d1| over active pixels — the
    # scene's actual offset requirement, measured by the kernel itself
    # (free: phase A already computed delta).  The auto fast path compares
    # the max against the radius and falls back to the exact XLA gather
    # when this speculative run would have dropped work.
    stat_ref[0] = jnp.broadcast_to(
        jnp.max(ov, axis=1, keepdims=True), (rows, _LANE))

    # phase C: dg gating + the two -dg/dist terms
    # (reference rasterize.py:648-657,719-728)
    for e in range(3):
        pe = per_edge[e]
        X0, X1 = pe['X0'], pe['X1']
        dg = s1 - outprod[e]
        gate = dg > 0
        delta_f = d1 - pe['d1_cross']
        act_in = pe['act_in']

        def one(k_num, k_den):
            dist = k_num / k_den * delta_f * 2.0 / is_
            dist = jnp.where(dist > 0, dist + eps, dist - eps)
            return -dg / dist

        out_ref[0, 2 * e] = jnp.where(act_in & gate & (X1 != d0),
                                      one(X1 - X0, X1 - d0), 0.0)
        out_ref[0, 2 * e + 1] = jnp.where(act_in & gate & (X0 != d0),
                                          one(X1 - X0, d0 - X0), 0.0)


_KS = 64            # out-sweep record slots per chunk
# Fetch/sweep tile granularity.  16/32 measured WORSE than 64 (r5): the
# one-hot record fetch is MXU-padded to the same tiles regardless of slot
# count, so finer tiles multiply dispatch overhead without shrinking the
# dominant math.  Keep 64 (= one tile per chunk); the env knob remains for
# ablation only.
_SUB = int(os.environ.get('NR_OS_SUB', 64))
# Phase ablation for kernel-time attribution (misc/kbench_outsweep.py):
# 'zero' = grid+DMA+output zeroing only; 'disc' = + discovery;
# 'fetch' = + record fetch (tail replaced by a flat accumulate).
# Results are WRONG under any setting — timing harnesses only.
_ABLATE = os.environ.get('NR_OS_ABLATE', '')
_WINT = 2           # fetch-window width in 128-lane tiles (per edge)
_KCLAMP = 1e14      # |k| cap: keeps dist0 * dist1 finite in the sweep


def _lane_prefix(x, is_):
    """Inclusive prefix sum along lanes (Hillis-Steele log-shifts)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    sh = 1
    while sh < is_:
        x = x + jnp.where(lane >= sh, jnp.roll(x, sh, axis=-1), 0)
        sh *= 2
    return x


def _compact_schedule(nch, budget):
    """Compact (block, chunk) schedule over per-block chunk counts ``nch``
    (0 = block unvisited): entry c -> block ``pb[c]``, chunk ``kofs[c]``
    (-1 past the total — the kernel no-ops those).  Same scatter+cumsum
    construction as the forward's ``chunk_schedule`` but WITHOUT the
    one-entry-per-block floor: out-sweep blocks with no records are never
    visited at all (their output stays zero via input_output_aliasing of
    a zero-filled buffer)."""
    ends = jnp.cumsum(nch)
    total = ends[-1]
    base = (ends - nch).astype(jnp.int32)
    bc = jnp.minimum(base, budget - 1)
    ci = jnp.arange(budget, dtype=jnp.int32)
    # zero-chunk blocks share their base with the next block; the
    # (count of bases <= ci) - 1 rule then resolves to the LAST sharer —
    # the block that actually owns the entries
    marks = jnp.zeros((budget,), jnp.int32).at[bc].add(1, mode='drop')
    pb = jnp.cumsum(marks) - 1
    bvals = jnp.zeros((budget,), jnp.int32).at[bc].max(base, mode='drop')
    kofs = jnp.where(ci < total, ci - jax.lax.cummax(bvals), -1)
    pb = jnp.clip(pb, 0, nch.shape[0] - 1).astype(jnp.int32)
    # no-op tail entries (ci >= total) must map to the LAST visited block:
    # a trailing zero-count block's base == total scatters a mark there,
    # so the raw cumsum would point tails at an unvisited block — whose
    # final VMEM flush then clobbers the aliased zero buffer with stale
    # content.  Re-flushing the last real block is idempotent instead.
    pb = jnp.where(ci < jnp.maximum(total, 1),
                   pb, pb[jnp.maximum(total - 1, 0)])
    return pb, kofs.astype(jnp.int32), total


def _outsweep_kernel(settings, dir_lt, rows, is_, with_rgb, kc,
                     compact, nblk, *refs):
    """Out-sweep (reference rasterize.py:603-659): discovery, per-row
    record compaction, and the border sweep — one fused pass.

    Grid (bs, is/rows, kc).  Chunk 0 rasterizes the crossing math for all
    3 edges, ranks each row's active crossings with a lane prefix sum, and
    caches per-record attributes in VMEM as one [na, 3*is] matrix per row
    (edges segmented along lanes) so every later chunk fetches its records
    with a single one-hot MXU contraction — no per-chunk concatenation or
    rebuild.  The fetch + border sweep run in _SUB-record sub-chunks, each
    guarded by the row's prefetched count: a typical row hosts well under
    _KS records, so the [slots, is] sweep math scales with the row's
    actual crossings instead of paying the full 64-slot tile (measured
    ~12 ms/step of tail math at 512^2 bs32 before sub-chunking).

    All per-pixel maps arrive as ONE stacked input ([1, nin, rows, is]
    block; plane order xs0-2, ys0-2, alpha, s1, ga [, grgb x3, rgb x3]) —
    one strided DMA per block visit instead of nin separate 32 KB fetches
    (the 15-DMA setup train was the claimed "DMA floor" of r4's notes).

    All per-row SCALARS (record counts, the fetch-window tile bases, the
    window-fits flag) arrive packed in the scalar-prefetched ``pk_ref``,
    computed by an XLA pre-pass (``_outsweep_rowinfo``) — extracting them
    from vectors inside the kernel cost ~135 ns per vector->scalar move,
    ~22 ms/step at 512^2 bs32 (the dominant kernel cost, measured by
    ablation).  Blocks whose rows host no record skip discovery wholly.

    The crossing pixel r is covered by construction, so a_in == 1 exactly
    and dg(r, q') = S1(q') - ga(q') - sum_c rgb_in_c(r) * grgb_c(q').
    """
    eps = settings.eps
    na = 9 + (3 if with_rgb else 0)   # attr rows: 7 per-edge + xpos + eid
    if compact:
        # compact schedule: 1-D grid over the scene's (block, chunk)
        # entries; unvisited blocks keep the aliased zero buffer.  The
        # zeros operand itself is never read (minimal const block spec).
        (pk_ref, pb_ref, kofs_ref, in_ref, _zeros_ref, out_ref,
         rank_ref, attr_ref) = refs
        ce = pl.program_id(0)
        pt = pb_ref[ce]
        c = kofs_ref[ce]
        b = pt // nblk
        i = pt % nblk
    else:
        pk_ref, in_ref, out_ref, rank_ref, attr_ref = refs
        b = pl.program_id(0)
        c = pl.program_id(2)
        i = pl.program_id(1)

    # windowed fetch: a (row, edge)'s active crossings cluster in the
    # object's x-range — when each edge's span fits _WINT lane-tiles, the
    # record fetch contracts 3 x _WINT tiles instead of all 3*is lanes
    # the window clamp and span test assume lane-tile-aligned rows; a
    # non-128-multiple is_ could let a record in the partial last tile pass
    # the span check yet fall outside the clipped window (supported_outsweep
    # already requires is_ % 128 == 0 — this gate is belt-and-suspenders)
    windowed = is_ % _LANE == 0 and is_ >= _WINT * 2 * _LANE

    def pk(r):
        """Packed per-row scalars (see _outsweep_rowinfo for the layout)."""
        return pk_ref[(b * (is_ // rows) + i) * rows + r]

    cnts = [pk(r) & 0x3FFF for r in range(rows)]
    blk_any = cnts[0]
    for r in range(1, rows):
        blk_any = blk_any | cnts[r]

    d0 = (i * rows
          + jax.lax.broadcasted_iota(jnp.int32, (rows, is_), 0)
          ).astype(jnp.float32)
    d1i = jax.lax.broadcasted_iota(jnp.int32, (rows, is_), 1)
    d1 = d1i.astype(jnp.float32)

    # (compact: entry 0 must zero even as a no-op tail — with zero total
    # entries the out VMEM buffer is otherwise flushed uninitialized)
    zero_cond = (c == 0) if not compact else (c == 0) | (pl.program_id(0)
                                                         == 0)

    @pl.when(zero_cond)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref[...])

    if _ABLATE == 'zero':
        return

    @pl.when((c == 0) & (blk_any > 0))
    def _discover():
        av = in_ref[0, 6]
        covered = av >= 0.5
        xs = [in_ref[0, k] for k in range(3)]
        ys = [in_ref[0, 3 + k] for k in range(3)]

        counts = []
        for e in range(3):
            pi = [(e + k) % 3 for k in range(3)]
            X0, X1, X2 = (xs[p] for p in pi)
            Y0, Y1, _ = (ys[p] for p in pi)
            direction = jnp.where(X0 < X1, jnp.float32(dir_lt),
                                  jnp.float32(-dir_lt))
            d0_from = jnp.maximum(jnp.ceil(jnp.minimum(X0, X1)), 0.0)
            d0_to = jnp.trunc(jnp.minimum(jnp.maximum(X0, X1), is_ - 1.0))
            in_extent = (d0 >= d0_from) & (d0 <= d0_to)
            d1_cross = (Y1 - Y0) / (X1 - X0) * (d0 - X0) + Y0
            d1_in = jnp.where(direction > 0, jnp.floor(d1_cross),
                              jnp.ceil(d1_cross))
            d1_out = d1_in + direction
            valid = (in_extent
                     & (d1_in >= 0) & (d1_in <= is_ - 1)
                     & (d1_out >= 0) & (d1_out <= is_ - 1))
            act = covered & valid & (d1_in == d1)

            d1_limit = jnp.where(direction > 0, float(is_ - 1), 0.0)
            lo = jnp.maximum(jnp.minimum(d1_out, d1_limit), 0.0)
            hi = jnp.minimum(jnp.maximum(d1_out, d1_limit), is_ - 1.0)
            k0 = (X1 - X0) / (X1 - d0) * (2.0 / is_)
            k1 = (X1 - X0) / (d0 - X0) * (2.0 / is_)
            g0 = ((X1 != d0) & act).astype(jnp.float32)
            g1 = ((X0 != d0) & act).astype(jnp.float32)

            # attrs are fetched with a one-hot MXU dot, where nan * 0 = nan
            # poisons every slot — inactive pixels' values (nan/inf from
            # the crossing divisions on uncovered pixels) MUST be zeroed
            sl = pl.ds(e * is_, is_)
            attr_ref[:, 0, sl] = jnp.where(act, 1.0, 0.0)
            attr_ref[:, 1, sl] = jnp.where(act, d1_cross, 0.0)
            attr_ref[:, 2, sl] = jnp.where(act, lo, 0.0)
            attr_ref[:, 3, sl] = jnp.where(act, hi, 0.0)
            # |k| is clamped so the sweep's dist0 * dist1 product can't
            # overflow (contributions at |k| >= _KCLAMP are < 1e-14 *
            # |dg| — far below every tolerance in play)
            attr_ref[:, 4, sl] = jnp.where(
                (g0 > 0) & jnp.isfinite(k0),
                jnp.clip(k0, -_KCLAMP, _KCLAMP), 0.0)
            attr_ref[:, 5, sl] = jnp.where(
                (g1 > 0) & jnp.isfinite(k1),
                jnp.clip(k1, -_KCLAMP, _KCLAMP), 0.0)
            attr_ref[:, 6, sl] = g1           # g0 via k0 != 0
            if with_rgb:
                for cch in range(3):
                    attr_ref[:, 9 + cch, sl] = in_ref[0, 12 + cch]

            prefix = _lane_prefix(act.astype(jnp.int32), is_)
            count_e = jnp.max(prefix, axis=1, keepdims=True)
            rank = jnp.where(act, prefix - 1, jnp.int32(2 ** 30))
            counts.append((count_e, rank))

        # record coordinates shared by all rows (lane position / edge id)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, (rows, 3 * is_), 1)
        attr_ref[:, 7, :] = (lane3 % is_).astype(jnp.float32)
        attr_ref[:, 8, :] = (lane3 // is_).astype(jnp.float32)

        # global rank across the 3 edge segments (counts stay VECTORS —
        # the scalar per-row totals come prefetched, never extracted here)
        off = None
        for e in range(3):
            count_e, rank = counts[e]
            rank_ref[:, pl.ds(e * is_, is_)] = (rank if off is None
                                                else rank + off)
            off = count_e if off is None else off + count_e

    if _ABLATE == 'disc':
        return

    qi = jax.lax.broadcasted_iota(jnp.int32, (1, is_), 1)
    qf = qi.astype(jnp.float32)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)

    for r in range(rows):
        def _sweep_tail(r, rec):
            if _ABLATE == 'fetch':
                # keep the fetch live, replace the border sweep with a
                # flat accumulate (timing attribution only)
                out_ref[0, :, r, :] = out_ref[0, :, r, :] + jnp.sum(rec)
                return
            def col(j):
                return rec[:, j:j + 1]                       # [_SUB, 1]

            d1c, lo, hi, k0, k1, g1 = (col(j) for j in range(1, 7))
            xr, er = col(7), col(8)

            s1_row = in_ref[0, 7][r:r + 1, :]
            # a_in == 1 exactly at crossings, so the alpha term of
            # dg = (a(q') - a_in) * ga(q') is s1's alpha part minus ga
            dg = (s1_row - in_ref[0, 8][r:r + 1, :]
                  if settings.return_alpha else s1_row)
            if with_rgb:
                for cch in range(3):
                    dg = dg - col(9 + cch) * in_ref[0, 9 + cch][r:r + 1, :]

            # gated dg: relu applies the reference's diff_grad > 0 gate
            # (dg == 0 contributes exactly 0 either way), the range select
            # the sweep interval.  Per-record gates (slot validity, the
            # X != d0 masks) move to the [_SUB, 1] sums below — empty slots
            # fetch all-zero attrs, so k0 == 0 / g1 == 0 kills them there.
            rng = (qf >= lo) & (qf <= hi)
            dgm = jnp.where(rng, jnp.maximum(dg, 0.0), 0.0)
            delta = qf - d1c

            # the two -dg/dist terms share ONE divide: with
            # t = dg / (dist0 * dist1), c0 = -t * dist1 and c1 = -t * dist0
            # (f32 divides are multi-pass on the VPU and these two were
            # ~half the border-sweep math).  |dist| >= eps always, and the
            # discovery pass clamps |k| <= _KCLAMP so the product cannot
            # overflow.  Reassociation error is ~2 ulps — far inside the
            # reference anchors (rtol 1e-2) and the float64 parity (1e-3).
            dist0 = k0 * delta
            dist0 = jnp.where(dist0 > 0, dist0 + eps, dist0 - eps)
            dist1 = k1 * delta
            dist1 = jnp.where(dist1 > 0, dist1 + eps, dist1 - eps)
            t = -dgm / (dist0 * dist1)
            c0 = jnp.sum(t * dist1, axis=1, keepdims=True)
            c1 = jnp.sum(t * dist0, axis=1, keepdims=True)
            c0 = jnp.where(k0 != 0, c0, 0.0)
            c1 = jnp.where(g1 > 0, c1, 0.0)

            # scatter every record's (c0, c1) to its in-pixel lane for its
            # (edge, k) plane — ONE [6 x _SUB] x [_SUB x is] contraction
            ohx = (qi == xr.astype(jnp.int32)).astype(jnp.float32)
            cv6 = jnp.concatenate(
                [(c0 if kk == 0 else c1) * (er == e)
                 for e in range(3) for kk in (0, 1)], axis=1)  # [_SUB, 6]
            row_add = jax.lax.dot_general(
                cv6, ohx, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)          # [6, is]
            # channel-plane output ([1, 6, rows, is] block): the wrapper
            # hands each plane straight to the channel-leading stack — the
            # old (row, channel)-interleaved layout cost ~3 ms/step of XLA
            # reshape/transpose unshuffle at 512^2 bs32 (traced r4)
            out_ref[0, :, r, :] = out_ref[0, :, r, :] + row_add

        # _SUB-record sub-chunks, each alive only while the row still has
        # records past its base: a row with n crossings pays
        # ceil(n/_SUB) fetch+sweep tiles instead of kc full-_KS ones
        wok = (pk(r) >> 14) & 1 if windowed else None
        for sc in range(_KS // _SUB):
            base = c * _KS + sc * _SUB
            # (c >= 0 guards the compact schedule's no-op tail entries)
            live = (c >= 0) & (base < cnts[r])

            def _fetch_full(r=r, base=base):
                oh = (rank_ref[r:r + 1, :] == base + slot_iota).astype(
                    jnp.float32)                             # [_SUB, 3*is]
                return jax.lax.dot_general(
                    oh, attr_ref[r], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # [_SUB, na]

            if windowed:
                @pl.when(live & (wok == 1))
                def _sweep_win(r=r, base=base):
                    rec = None
                    for e in range(3):
                        tlo = (pk(r) >> (15 + 5 * e)) & 31
                        sl = pl.ds(e * is_ + tlo * _LANE, _WINT * _LANE)
                        ohw = (rank_ref[r:r + 1, sl]
                               == base + slot_iota).astype(jnp.float32)
                        d = jax.lax.dot_general(
                            ohw, attr_ref[r, :, sl],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                        rec = d if rec is None else rec + d
                    _sweep_tail(r, rec)

                @pl.when(live & (wok == 0))
                def _sweep_full(r=r, base=base, f=_fetch_full):
                    _sweep_tail(r, f())
            else:
                @pl.when(live)
                def _sweep(r=r, base=base, f=_fetch_full):
                    _sweep_tail(r, f())


def _outsweep_rowinfo(settings, dir_lt, xs, ys, alpha_map):
    """XLA pre-pass: per-walk-row packed scalars for the out-sweep kernel.

    Rederives the discovery activity mask (same op order as the kernel)
    and reduces it to the per-row scalars the kernel needs for control
    flow: record count, the per-edge fetch-window tile base, and the
    window-fits flag — packed as
    ``count | wok << 14 | tlo_e << (15 + 5*e)`` in one int32 per row.
    Extracting these from vectors inside the kernel cost ~135 ns per
    vector->scalar move (~22 ms/step at 512^2 bs32); here they are three
    fused reductions over maps XLA is already reading.

    The spans carry a +-1 lane margin: the kernel's Mosaic-compiled
    d1_cross arithmetic could differ from XLA's by an ulp (FMA
    contraction), which can move a record one lane — never off its row,
    so the COUNTS are drift-free (a drifted crossing stays in the same
    walk row; only extent/on-screen boundary flips could change a count,
    at exact-ulp geometry).

    Returns (packed [bs * is] int32, row_worst scalar int32).
    """
    is_ = settings.image_size
    covered = alpha_map >= 0.5
    bs = alpha_map.shape[0]
    d0 = jnp.broadcast_to(
        jnp.arange(is_, dtype=jnp.float32)[None, :, None], (bs, is_, is_))
    lane = jnp.broadcast_to(
        jnp.arange(is_, dtype=jnp.int32)[None, None, :], (bs, is_, is_))
    d1 = lane.astype(jnp.float32)

    nt_max = max(is_ // _LANE - _WINT, 0)
    big = jnp.int32(2 ** 30)
    cnt = jnp.zeros((bs, is_), jnp.int32)
    wok = None
    tlos = []
    for e in range(3):
        pi = [(e + k) % 3 for k in range(3)]
        X0, X1 = xs[pi[0]], xs[pi[1]]
        Y0, Y1 = ys[pi[0]], ys[pi[1]]
        direction = jnp.where(X0 < X1, jnp.float32(dir_lt),
                              jnp.float32(-dir_lt))
        d0_from = jnp.maximum(jnp.ceil(jnp.minimum(X0, X1)), 0.0)
        d0_to = jnp.trunc(jnp.minimum(jnp.maximum(X0, X1), is_ - 1.0))
        in_extent = (d0 >= d0_from) & (d0 <= d0_to)
        d1_cross = (Y1 - Y0) / (X1 - X0) * (d0 - X0) + Y0
        d1_in = jnp.where(direction > 0, jnp.floor(d1_cross),
                          jnp.ceil(d1_cross))
        d1_out = d1_in + direction
        valid = (in_extent
                 & (d1_in >= 0) & (d1_in <= is_ - 1)
                 & (d1_out >= 0) & (d1_out <= is_ - 1))
        act = covered & valid & (d1_in == d1)

        cnt = cnt + jnp.sum(act, axis=-1, dtype=jnp.int32)
        lo = jnp.min(jnp.where(act, lane, big), axis=-1) - 1   # ulp margin
        hi = jnp.max(jnp.where(act, lane, -big), axis=-1) + 1
        empty = hi < 0
        tlos.append(jnp.clip(jnp.where(empty, 0, lo // _LANE), 0, nt_max))
        ok_e = empty | (hi // _LANE - jnp.maximum(lo, 0) // _LANE < _WINT)
        wok = ok_e if wok is None else (wok & ok_e)

    packed = (jnp.minimum(cnt, 0x3FFF)
              | (wok.astype(jnp.int32) << 14))
    for e in range(3):
        packed = packed | (tlos[e] << (15 + 5 * e))
    return packed.reshape(-1), jnp.max(cnt)


def outsweep_channels(settings, a, ppx, ppy, alpha_map, s1_map,
                      grad_alpha_map, grad_rgb_map=None, rgb_map=None,
                      row_cap=256, interpret=False, compact=False,
                      budget=None):
    """Out-sweep contribution channels for one walk axis, written at each
    crossing's in-pixel (same attribution as the dense path).

    Returns (channels [bs, 6, is, is] — (c0, c1) per edge, the _EA
    axis-major block — and row_worst, the max active crossing count in
    any single row: the scene's actual row-capacity requirement, measured
    by the rowinfo pre-pass).  Exact iff row_worst <= row_cap — validate
    with ``backward.count_out_crossings(..., per_row=True)`` or compare
    the returned stat (the auto fast path conds on it).

    compact=True: iterate a compact (block, chunk) entry list instead of
    the dense (bs, is/rows, kc) grid — a dense grid step costs ~1.8 us of
    Mosaic machinery even when every row no-ops (measured: the 'zero'
    kernel ablation = 8.5 ms of the 22 ms axis at 512^2 bs32), and most
    blocks of a real scene host no records or need one chunk of the
    row_cap's four.  Unvisited blocks' outputs stay zero via
    input_output_aliasing of a zero buffer.  The result is ALWAYS exact
    (given row_worst <= row_cap): scenes whose entry list overflows the
    static ``budget`` (default ``2 * bs * nblocks``; no-op tail entries
    cost ~nothing, so the 2x headroom is cheap) take the dense Pallas grid
    via an internal ``lax.cond`` instead — NOT the caller's XLA fallback,
    which costs ~0.5 s/step at 512^2 bs32 (r5: the r4-end compact rewrite
    shipped with budget = bs * nblocks and the az=0 teapot view needs
    bs * nblocks + 1 axis-0 entries, so one bench azimuth in eight paid
    the XLA fallback and the headline read -33%).  Returns a third value
    ``fits`` (True = the compact grid ran) for diagnostics/tests."""
    is_ = settings.image_size
    bs = alpha_map.shape[0]
    # 16-row blocks halve the per-block DMA/discovery count (measured
    # ~1.4 ms at 512^2 bs32; 32 rows spills Mosaic's VMEM stack — NOTES)
    rows = int(os.environ.get('NR_OS_ROWS',
                              '16' if is_ % 16 == 0 else '8'))
    with_rgb = settings.return_rgb
    kc = -(-row_cap // _KS)

    if a == 0:
        xs = [ppx[..., k] for k in range(3)]
        ys = [ppy[..., k] for k in range(3)]
        dir_lt = -1.0
    else:
        xs = [ppy[..., k] for k in range(3)]
        ys = [ppx[..., k] for k in range(3)]
        dir_lt = 1.0

    # ONE stacked input (kernel plane order: xs, ys, alpha, s1, ga
    # [, grgb, rgb]) — the stack build fuses the walk-frame transpose for
    # a=0, and the kernel pays one strided DMA per block visit instead of
    # 9/15 separate 32 KB fetches (the r4 "DMA floor")
    planes = xs + ys + [alpha_map, s1_map, grad_alpha_map]
    if with_rgb:
        planes += [grad_rgb_map[..., c] for c in range(3)]
        planes += [rgb_map[..., c] for c in range(3)]
    stacked = jnp.stack(planes, axis=1)
    if a == 0:
        stacked = stacked.transpose(0, 1, 3, 2)
    nin = stacked.shape[1]

    # the rowinfo pre-pass rederives activity in the walk frame
    xs_w = [stacked[:, k] for k in range(3)]
    ys_w = [stacked[:, 3 + k] for k in range(3)]
    packed, row_worst = _outsweep_rowinfo(settings, dir_lt, xs_w, ys_w,
                                          stacked[:, 6])

    nblk = is_ // rows
    kernel = functools.partial(_outsweep_kernel, settings, dir_lt, rows,
                               is_, with_rgb, kc, compact, nblk)
    from jax.experimental.pallas import tpu as pltpu
    scratch = [
        pltpu.VMEM((rows, 3 * is_), jnp.int32),
        pltpu.VMEM((rows, 9 + (3 if with_rgb else 0), 3 * is_),
                   jnp.float32),
    ]
    out_shape = [_out_struct((bs, 6, is_, is_), jnp.float32, alpha_map)]

    def dense_call(packed, stacked):
        dkernel = functools.partial(_outsweep_kernel, settings, dir_lt,
                                    rows, is_, with_rgb, kc, False, nblk)
        in_spec = pl.BlockSpec((1, nin, rows, is_),
                               lambda b, i, c, pk: (b, 0, i, 0))
        out_spec = pl.BlockSpec((1, 6, rows, is_),
                                lambda b, i, c, pk: (b, 0, i, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bs, is_ // rows, kc),
            in_specs=[in_spec],
            out_specs=[out_spec],
            scratch_shapes=scratch,
        )
        out, = pl.pallas_call(
            dkernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(packed, stacked)
        return out

    if compact:
        # per-block chunk entries: ceil(min(worst row, row_cap) / _KS),
        # 0 for blocks hosting no record at all
        cnt_rows = (packed & 0x3FFF).reshape(bs * nblk, rows)
        blkmax = jnp.minimum(cnt_rows.max(axis=1), row_cap)
        nch = (blkmax + _KS - 1) // _KS
        if budget is None:
            budget = int(os.environ.get('NR_OS_BUDGET_FACTOR',
                                        '2')) * bs * nblk
        pb, kofs, total = _compact_schedule(nch, budget)
        fits = total <= budget

        def blk(ce, pk, pb, kofs):
            pt = pb[ce]
            return pt // nblk, 0, pt % nblk, 0

        def compact_call(packed, stacked):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(budget,),
                in_specs=[
                    pl.BlockSpec((1, nin, rows, is_),
                                 lambda ce, *s: (blk(ce, *s)[0], 0,
                                                 blk(ce, *s)[2], 0)),
                    # aliased zero buffer: never read — minimal const block
                    pl.BlockSpec((1, 1, 8, _LANE),
                                 lambda ce, *s: (0, 0, 0, 0)),
                ],
                out_specs=[pl.BlockSpec(
                    (1, 6, rows, is_),
                    lambda ce, *s: (blk(ce, *s)[0], 0, blk(ce, *s)[2], 0))],
                scratch_shapes=scratch,
            )
            zeros = jnp.zeros((bs, 6, is_, is_), jnp.float32)
            out, = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=out_shape,
                # operand index 4 = zeros (after 3 scalar-prefetch +
                # stacked)
                input_output_aliases={4: 0},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
                interpret=interpret,
            )(packed, pb, kofs, stacked, zeros)
            return out

        # schedule overflow falls back to the DENSE PALLAS grid (exact for
        # any entry count), not to the caller's XLA path — an overflowing
        # step costs one dense kernel, not ~0.5 s of XLA sweeps
        out = jax.lax.cond(fits, compact_call, dense_call, packed, stacked)
        if a == 0:
            out = out.transpose(0, 1, 3, 2)
        return out, row_worst, fits

    out = dense_call(packed, stacked)
    # direct channel planes — no XLA-side unshuffle pass exists at all
    # (channels in the walk frame get transposed back for a=0; the stat is
    # a global max, frame-independent)
    if a == 0:
        out = out.transpose(0, 1, 3, 2)
    return out, row_worst


def insweep_channels(settings, a, ppx, ppy, alpha_map, grad_alpha_map,
                     rgb_map=None, grad_rgb_map=None, interpret=False):
    """In-sweep contribution channels for one walk axis.

    a: 0 (column sweeps — handled by transposing in/outputs) or 1 (row
    sweeps).  ppx/ppy: ``[bs, is, is, 3]`` pixel-space vertex coords of
    each pixel's face.  Returns (channels [bs, 6, is, is] — (c0, c1) per
    edge, the _EA axis-major block — and off_worst, the max |d1_out - d1|
    over active pixels: the scene's actual offset requirement.  Exact iff
    off_worst <= grad_offset_radius (the auto fast path conds on it)."""
    is_ = settings.image_size
    bs = alpha_map.shape[0]
    radius = int(settings.grad_offset_radius)
    rows = _rows_per_block(is_)

    # walk frame: X = coord along the walk axis, Y = sweep coord
    if a == 0:
        xs = [ppx[..., k] for k in range(3)]
        ys = [ppy[..., k] for k in range(3)]
        dir_lt = -1.0
    else:
        xs = [ppy[..., k] for k in range(3)]
        ys = [ppx[..., k] for k in range(3)]
        dir_lt = 1.0

    # ONE stacked input (see _kernel docstring for the plane order): the
    # stack build fuses the walk-frame transpose for a=0, and the kernel
    # pays one strided DMA per block instead of nin separate fetches
    planes = xs + ys + [alpha_map]
    values, grads = [], []
    if settings.return_alpha:
        values.append(alpha_map)
        grads.append(grad_alpha_map)
    if settings.return_rgb:
        values += [rgb_map[..., c] for c in range(3)]
        grads += [grad_rgb_map[..., c] for c in range(3)]
    nch = len(values)
    stacked = jnp.stack(planes + values + grads, axis=1)
    if a == 0:
        stacked = stacked.transpose(0, 1, 3, 2)
    nin = stacked.shape[1]

    kernel = functools.partial(_kernel, settings, dir_lt, radius,
                               rows, is_, nch)
    in_spec = pl.BlockSpec((1, nin, rows, is_), lambda b, i: (b, 0, i, 0))
    out_spec = pl.BlockSpec((1, 6, rows, is_), lambda b, i: (b, 0, i, 0))
    stat_spec = pl.BlockSpec((1, rows, _LANE), lambda b, i: (b, i, 0))
    from jax.experimental.pallas import tpu as pltpu
    out, stat = pl.pallas_call(
        kernel,
        grid=(bs, is_ // rows),
        in_specs=[in_spec],
        out_specs=[out_spec, stat_spec],
        out_shape=[
            _out_struct((bs, 6, is_, is_), jnp.float32, alpha_map),
            _out_struct((bs, is_, _LANE), jnp.int32, alpha_map),
        ],
        scratch_shapes=[pltpu.VMEM((rows, is_), jnp.float32)] * 3,
        interpret=interpret,
    )(stacked)
    # (channels in the walk frame get transposed back for a=0; the stat is
    # a global max, frame-independent)
    if a == 0:
        out = out.transpose(0, 1, 3, 2)
    return out, jnp.max(stat)


# ---------------------------------------------------------------------------
# CSR per-patch partial face reduction
# ---------------------------------------------------------------------------
#
# Replaces the global pixel->face segment_sum of the fused backward channels
# (~20ns/index * is^2 * bs indices; 168 ms at 512^2 bs32) with per-patch
# partial sums.  The shaded forward already assigns every covered pixel a
# POSITION in its patch's binned face list; within a patch, summing channels
# by position is a one-hot MXU contraction — exactly the forward's fetch
# trick run in reverse.  The partials land in a CSR layout (one row per
# (patch, list slot), patches packed back-to-back at scalar-prefetched chunk
# bases), and the remaining segment_sum runs over just the face-incidence
# rows (~5k per batch element on the teapot vs 262k pixels).


def _csr_kernel(rows, p, nc, kmax, t, xg, expand, pchk_ref, kofs_ref,
                chan_ref, pos_ref, out_ref):
    from jax.experimental.pallas import tpu as pltpu
    c = pl.program_id(0)
    kofs = kofs_ref[c]
    if expand is None:
        nc_out = nc
    else:
        n01, na2 = expand
        nc_base = nc - n01 - na2 - 3
        nc_out = nc_base + n01 * na2 * 3

    @pl.when(kofs < kmax)
    def _compute():
        pos = pos_ref[0, 0, 0]                           # [rows, 128] int32
        # channels arrive channel-LEADING — the layout the backward's
        # fused pixel-minor channel stack is already stored in, so no
        # host-side channel-minor relayout exists (a channel-minor
        # operand forced an 8.8 ms copy of the whole 1.2 GB stack at
        # 512^2 bs32).  Pallas block minors must be (8, 128)-divisible,
        # so the block spans xg = 128/p patches side by side; a dynamic
        # lane rotation brings this chunk's patch to offset 0.
        if xg > 1:
            pt = pchk_ref[c]
            xq = (pt % t) % xg                   # patch index inside block
            strip = pltpu.roll(chan_ref[0], ((xg - xq) % xg) * p, 2)
        else:
            strip = chan_ref[0]
        # packed pixel order (slot (r, l): y = (l//p)*rows + r, x = l%p —
        # forward_pallas._pixel_coords) splits y into (group, r); each
        # (r, g) pair is one K=p lane-lane contraction against a lane
        # window of the row's slot one-hot (the MXU is idle here anyway —
        # the kernel is DMA-bound).  The group blocks are pre-transposed
        # to [rows, nc, p] once so the inner loop's per-row operand is a
        # free major-dim slice instead of 36 sublane extractions.
        groups = _LANE // p
        chan = strip[:, :, :p].reshape(nc, groups, rows, p)
        cgt = [jnp.transpose(chan[:, g], (1, 0, 2)) for g in range(groups)]
        slot = jax.lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
        acc = jnp.zeros((_LANE, nc_out), jnp.float32)
        for r in range(rows):
            oh = (slot == (pos[r:r + 1, :] - kofs * _LANE)).astype(
                jnp.float32)                             # [slots, 128]
            for g in range(groups):
                cg = cgt[g][r]                           # [nc, p]
                if expand is not None:
                    # K6 cell expansion ON the 32-pixel block: the fused
                    # stack carries the ts^2 + ts + 3 FACTOR channels
                    # (texture.texture_cell_factors) and the ts^3*3
                    # cell-resolved rows are reconstructed here in VMEM —
                    # (p01 * a2) * g, the cells path's exact multiply
                    # order — instead of riding HBM as ts^3*3 full-image
                    # planes.  Output columns are (c2, ch)-major with i01
                    # inner; the caller unpermutes after the segment_sum.
                    base = cg[:nc_base]
                    u = cg[nc_base:nc_base + n01]            # p01 [n01, p]
                    av = cg[nc_base + n01:nc_base + n01 + na2]
                    gm = cg[nc_base + n01 + na2:]
                    pieces = [base]
                    for j in range(na2):
                        tj = u * av[j:j + 1]
                        for ch in range(3):
                            pieces.append(tj * gm[ch:ch + 1])
                    cg = jnp.concatenate(pieces, axis=0)     # [nc_out, p]
                acc = acc + jax.lax.dot_general(
                    oh[:, g * p:(g + 1) * p], cg,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [slots, C]
        out_ref[...] = acc


def csr_partial_channels(settings, channels, pos_packed, counts, base,
                         cap, interpret=False, expand=None):
    """Per-patch partial face sums of fused per-pixel channels.

    channels ``[bs, C, is, is]`` (channel-LEADING — the producers build
    their stacks on axis=1 natively, see ``core._bwd``);
    pos_packed ``[bs, t, t, rows, 128]`` and
    counts/base from the shaded forward (``grad_csr_rows`` set).  Returns
    partials ``[grad_csr_rows, C_out]`` whose row ``128*base[pt] + pos``
    holds the channel sums over patch pt's pixels with winner position
    pos; rows of the unvisited tail are garbage — the caller's
    ``csr_gseg`` routes them to the overflow bucket.

    expand: optional ``(ts^2, ts)`` — the LAST ts^2+ts+3 input channels
    are K6 cell factors (``texture.texture_cell_factors``), expanded to
    ts^3*3 cell-resolved output columns inside the kernel ((c2, ch)-major
    blocks of i01 — permute with ``csr_expand_perm``); the other
    channels pass through, so ``C_out = C - (ts^2+ts+3) + ts^3*3``.

    The grid iterates the CSR chunks themselves (not patches x capacity):
    scalar-prefetched chunk->patch / chunk->k maps mean empty patches cost
    nothing and no grid step is ever skipped, and channel patches are
    sliced straight from the channel-leading image-layout array by the
    BlockSpec ([1, C, p, p] blocks) — no patchify transpose, no relayout.
    """
    bs, nc, is_, _ = channels.shape
    p = 32
    t = is_ // p
    rows = (p * p) // _LANE
    lc = settings.grad_csr_rows // _LANE
    kmax = cap // _LANE

    # chunk -> (patch, k-within-patch); tail chunks get kofs = kmax (the
    # kernel skips them and their rows stay garbage/masked)
    nch = (counts + _LANE - 1) // _LANE
    ends = jnp.cumsum(nch)
    total = ends[-1]
    ci = jnp.arange(lc, dtype=jnp.int32)
    pchk = jnp.searchsorted(ends, ci, side='right').astype(jnp.int32)
    pchk = jnp.minimum(pchk, counts.shape[0] - 1)
    kofs = jnp.where(ci < total, ci - base[pchk], kmax).astype(jnp.int32)

    xg = max(1, min(_LANE, is_) // p)    # patches per lane-aligned block
    kernel = functools.partial(_csr_kernel, rows, p, nc, kmax, t, xg,
                               expand)
    if expand is None:
        nc_out = nc
    else:
        nc_out = nc - expand[0] - expand[1] - 3 + expand[0] * expand[1] * 3
    from jax.experimental.pallas import tpu as pltpu

    def byx(c, pchk_ref, kofs_ref):
        pt = pchk_ref[c]
        return pt // (t * t), (pt // t) % t, pt % t

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(lc,),
        in_specs=[
            pl.BlockSpec((1, nc, p, xg * p),
                         lambda c, *s: ((lambda b, y, x: (b, 0, y, x // xg))
                                        (*byx(c, *s)))),
            pl.BlockSpec((1, 1, 1, rows, _LANE),
                         lambda c, *s: (*byx(c, *s), 0, 0)),
        ],
        out_specs=pl.BlockSpec((_LANE, nc_out), lambda c, *s: (c, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=_out_struct((lc * _LANE, nc_out), jnp.float32, channels),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(pchk, kofs, channels, pos_packed)
    return out


def csr_expand_perm(ts):
    """Column permutation mapping the kernel's (c2, ch)-major expanded K6
    block order back to the cells path's (i01, c2, ch) order: output
    column (i01 * ts + c2) * 3 + ch was produced at kernel column
    (c2 * 3 + ch) * ts^2 + i01."""
    import numpy as np
    perm = np.empty(ts * ts * ts * 3, np.int32)
    for i01 in range(ts * ts):
        for c2 in range(ts):
            for ch in range(3):
                perm[(i01 * ts + c2) * 3 + ch] = \
                    (c2 * 3 + ch) * ts * ts + i01
    return perm
