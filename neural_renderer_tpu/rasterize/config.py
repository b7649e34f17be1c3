"""Rasterizer defaults and static settings.

Defaults mirror the reference (``rasterize.py:7-12``):
IMAGE_SIZE=256, ANTI_ALIASING=True, NEAR=0.1, FAR=100, EPS=1e-4,
BACKGROUND_COLOR=(0,0,0).
"""

import dataclasses
from typing import Optional

DEFAULT_IMAGE_SIZE = 256
DEFAULT_ANTI_ALIASING = True
DEFAULT_NEAR = 0.1
DEFAULT_FAR = 100.0
DEFAULT_EPS = 1e-4
DEFAULT_BACKGROUND_COLOR = (0.0, 0.0, 0.0)


@dataclasses.dataclass(frozen=True)
class RasterizeSettings:
    """Static (hashable) rasterizer configuration.

    The first block mirrors the reference ``Rasterize.__init__`` arguments
    (``rasterize.py:19-37``).  The second block holds TPU performance knobs
    that have no reference counterpart; all default to exact behavior.
    """
    image_size: int = DEFAULT_IMAGE_SIZE
    near: float = DEFAULT_NEAR
    far: float = DEFAULT_FAR
    eps: float = DEFAULT_EPS
    # background colors are a *traced operand* of rasterize_core ([3] or
    # per-batch [bs, 3], reference rasterize.py:462-465), not static config.
    return_rgb: bool = True
    return_alpha: bool = True
    return_depth: bool = True

    # --- TPU performance knobs (exact-by-default) ---
    # 'xla'    : fused pure-XLA argmin-z forward (runs on CPU/GPU/TPU).
    # 'pallas' : tile-binned Pallas TPU kernel.
    # 'auto'   : pallas on TPU when shapes allow, else xla.
    backend: str = 'auto'
    # XLA forward: number of faces per scan chunk (memory/throughput knob).
    face_chunk: int = 512
    # Pallas forward: max faces binned per 32x32 screen patch.  None = auto
    # (scales with faces-per-patch density: min(nf, max(512, 16*nf/patches))).
    # Faces stream through the kernel in 128-face chunks gated by per-patch
    # counts, so a generous cap costs binning memory, not kernel compute.
    faces_per_tile_cap: Optional[int] = None
    # Backward (K5) "out"-sweep: None = dense/exact.  Any int opts into the
    # compacted out-sweep; on TPU (supported shapes) that runs as the fused
    # Pallas kernel whose capacity unit is grad_row_cap below (this value is
    # then unused), elsewhere as the XLA two-level compaction capped at this
    # many crossings per batch element (validate with
    # `backward.count_out_crossings`).
    grad_out_cap: Optional[int] = None
    # Backward: pixel-chunk size for the dense out-sweep scan.
    grad_pixel_chunk: int = 65536
    # Backward (K5) out-sweep Pallas kernel (used when grad_out_cap is set
    # and the kernel supports the shape): max active crossings per image
    # row (column for the vertical axis).  Exact iff every row is under
    # the cap — validate with count_out_crossings(per_row=True).
    grad_row_cap: int = 256
    # Backward (K5): when set, in-sweep out-pixel values are fetched with a
    # fused (2R+1)-way shifted select instead of per-pixel random gathers
    # (~40ns/index on TPU).  Exact iff every active crossing's out-pixel is
    # within R rows/cols of its pixel — i.e. R >= max face pixel span;
    # validate with `backward.max_out_offset`.  None = exact gathers.
    grad_offset_radius: Optional[int] = None
    # Backward: total CSR rows (multiple of 128) for the per-patch partial
    # face reduction.  When set (and the Pallas forward runs), the fused
    # K5/K6/K7 per-pixel channels are reduced per screen patch with one-hot
    # MXU contractions against the forward's binning lists, and the global
    # pixel->face segment_sum (~20ns/index * is^2 pixels) shrinks to a
    # segment_sum over these CSR rows (one row per (patch, binned face)).
    # Exact iff `forward_pallas.csr_rows_needed(settings, faces)` <= this
    # value.  None = global segment reduction (exact, no capacity).
    grad_csr_rows: Optional[int] = None
    # Pallas forward: static size of the compact (patch, chunk) schedule
    # the shaded kernel iterates (one entry per patch plus one per binned
    # 128-face chunk).  None = automatic: provably-sufficient dense size,
    # except under the auto path's structural guard where a lean budget is
    # used (overflow falls back to the exact XLA path).  Setting it opts
    # into a capacity contract like faces_per_tile_cap — exact iff
    # `forward_pallas.chunks_needed(settings, faces)` fits.
    forward_chunk_budget: Optional[int] = None
    # Face-axis model parallelism: the name of a jax.sharding mesh axis the
    # FACE dimension is sharded over (call rasterize inside shard_map with
    # faces/textures split on axis 1).  Each device rasterizes its slice;
    # the z-buffers merge across the axis with a lexicographic
    # (depth, global face id) pmin — exactly the reference's sequential
    # first-wins rule over the concatenated list (rasterize.py:334) — and
    # the backward stays local to each device's slice.  None = no face
    # sharding.  The reference has no multi-device story at all (SURVEY
    # §2.3); this is the TPU-native scaling axis for huge meshes.
    face_axis: Optional[str] = None
    # Emit a host-side warning at runtime whenever a capacity knob above
    # actually drops records on the scene being rendered (binned faces over
    # faces_per_tile_cap, out-sweep crossings over grad_out_cap, out-pixel
    # offsets over grad_offset_radius).  Costs one scalar readback per
    # check; set False for maximum-throughput production loops *after*
    # validating the scene.
    runtime_checks: bool = True
    # Automatic fast-path selection: with backend 'auto' on TPU, capacity
    # knobs left at None get static auto capacities (auto_offset_radius /
    # auto_csr_rows below; grad_row_cap) and the Pallas backward kernels +
    # CSR reduction run under runtime exactness guards — a lax.cond per
    # capacity measures the scene's actual requirement on-device and falls
    # back to the capacity-free exact path whenever the auto capacity would
    # drop work.  Fast by default, never silently wrong (the guard is
    # structural, unlike runtime_checks warnings, which some platforms
    # cannot even deliver).  The reference contract is a plain
    # ``Renderer().render`` with no tuning step (renderer.py:75-107);
    # ``nr.tune`` remains the optimum (exact-fit capacities, no guard
    # arithmetic).  False = knobs left at None mean the dense/exact paths
    # (the pre-round-3 behavior).
    auto_fast: bool = True

    def validate(self):
        if not (self.return_rgb or self.return_alpha or self.return_depth):
            raise ValueError('nothing to draw '
                             '(reference rasterize.py:25-27 raises too)')
        if self.backend not in ('xla', 'pallas', 'auto'):
            raise ValueError(f'unknown backend {self.backend!r}')
        explicit = [name for name in ('faces_per_tile_cap', 'grad_out_cap',
                                      'grad_offset_radius', 'grad_csr_rows',
                                      'forward_chunk_budget')
                    if getattr(self, name) is not None]
        if explicit and self.runtime_checks:
            # runtime_checks is on, but if the platform cannot deliver host
            # callbacks the overflow warnings those knobs rely on can never
            # fire — say so loudly, once, instead of silently dropping work
            from neural_renderer_tpu.rasterize import checks
            if not checks.callbacks_enabled():
                checks.warn_unvalidated_capacity(explicit)
        return self


def auto_offset_radius(image_size):
    """Static in-sweep roll radius for the auto fast path.

    The requirement is the largest covered face's pixel span along an axis
    (``backward.max_out_offset``); kernel cost is linear in the radius
    (2R+1 roll steps).  The teapot needs 33 at 512^2 / 16 at 256^2
    (measured); is/12 covers both with margin while keeping the default
    in-sweep within ~25% of a tuned exact-fit radius.
    """
    return max(16, image_size // 12)


def auto_csr_rows(image_size, batch_size):
    """Static CSR row capacity for the auto fast path.

    The requirement is ``sum_patches ceil(binned_count/128) + 1`` chunks
    (``forward_pallas.csr_rows_needed``); the teapot needs ~73 chunks per
    batch element at 512^2 (nt=256 patches, ~half empty) and ~47 at 256^2
    (nt=64).  nt/4 + 48 chunks per element covers both with >= 1.35x
    margin; over-provision is not free (every extra chunk costs a CSR
    kernel grid step plus 128 segment_sum rows; part of the measured
    ~12 ms auto-vs-tuned residual at 512^2 bs32 with the old nt/2 + 32
    rule), while under-provision just trips the csr_valid guard into the
    exact global reduction — so lean tight.
    """
    nt = max(1, image_size // 32) ** 2
    return 128 * batch_size * (nt // 4 + 48)
