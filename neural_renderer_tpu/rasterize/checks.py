"""Host-side runtime warnings for the capacity knobs — platform-gated.

Some PJRT plugins (e.g. the experimental ``axon`` TPU platform) don't
implement host send/recv callbacks at all; ``jax.debug.callback`` then
fails the whole computation at RUN time.  ``maybe_callback`` probes the
active backend once (tiny jitted program, cached per backend) and silently
skips emission where unsupported — the capacity validators in
``rasterize.backward`` / ``rasterize.forward_pallas`` remain available for
explicit scene validation there.
"""

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _callbacks_supported(backend_name):
    del backend_name  # cache key only

    def probe(x):
        jax.debug.callback(lambda v: None, x)
        return x

    try:
        # ensure_compile_time_eval: actually EXECUTE the probe even when
        # this runs while an outer jit is tracing (nested jit would
        # otherwise be inlined into the trace).  np.asarray readback, not
        # block_until_ready: some plugin backends only surface the
        # send/recv UNIMPLEMENTED error on a host transfer.
        with jax.ensure_compile_time_eval():
            np.asarray(jax.jit(probe)(jnp.zeros(())))
        return True
    except Exception:
        warnings.warn(
            'this JAX backend does not support host callbacks; rasterizer '
            'runtime_checks are disabled — validate capacity knobs '
            'explicitly with backward.count_out_crossings / '
            'backward.max_out_offset / forward_pallas.binning_overflow')
        return False


def callbacks_enabled():
    """True when the active backend can deliver host callbacks.  Callers
    computing nontrivial check VALUES should gate the arithmetic on this
    too — otherwise platforms without callbacks pay for checks that can
    never fire."""
    return _callbacks_supported(jax.default_backend())


def maybe_callback(fn, *args):
    """jax.debug.callback(fn, *args) where the platform supports it."""
    if callbacks_enabled():
        jax.debug.callback(fn, *args)


_warned_knob_sets = set()


def warn_unvalidated_capacity(knob_names):
    """One-time loud warning: explicit capacity knobs on a backend that
    cannot deliver the runtime overflow warnings.

    On such platforms (e.g. the axon TPU plugin) an over-tight
    ``faces_per_tile_cap`` / ``grad_out_cap`` / ``grad_offset_radius`` /
    ``grad_csr_rows`` silently drops gradient work — exactly the failure
    mode ``runtime_checks`` exists to surface.  Emitted once per knob set
    at settings-validation time so the user knows to validate explicitly.
    """
    key = tuple(sorted(knob_names))
    if key in _warned_knob_sets:
        return
    _warned_knob_sets.add(key)
    warnings.warn(
        f'explicit rasterizer capacity knobs {sorted(knob_names)} are set, '
        'but this JAX backend cannot deliver runtime overflow warnings '
        '(host callbacks unsupported) — an over-tight capacity silently '
        'drops gradient work.  Derive knobs with nr.tune (which measures '
        'and validates them) or check the scene explicitly with '
        'forward_pallas.binning_overflow / forward_pallas.csr_rows_needed / '
        'backward.count_out_crossings / backward.max_out_offset.')
