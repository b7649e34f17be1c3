"""Test harness config.

Tests run on the default JAX backend (the real TPU when present, else CPU) —
golden-image exactness and the hard-coded gradient cases hold on both.
Sharding tests always use a virtual 8-device CPU mesh
(--xla_force_host_platform_device_count), available regardless of how many
real chips exist; see ``cpu_mesh_devices`` below.

Note: this environment may pre-import jax with a TPU plugin platform
(JAX_PLATFORMS=axon) before conftest runs, so XLA_FLAGS must be set here
(before first backend use) rather than per-test.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

DATA_DIR = pathlib.Path(__file__).resolve().parent / 'data'

# Persistent compilation cache: on this machine TPU compiles go through a
# remote-compile tunnel at ~tens of seconds per program, which dominated
# the suite (one kernel-comparison test spent 450 s compiling).  Warm
# runs skip all of it.  Harmless on plain CPU hosts.
import jax

# NR_TEST_PLATFORM=cpu forces the whole suite onto the host backend (the
# env var JAX_PLATFORMS is too late here — the axon site hook pre-imports
# jax).  Useful when the TPU tunnel is down: the interpret-mode and
# golden-value tests still validate everything that doesn't need the chip.
if os.environ.get('NR_TEST_PLATFORM'):
    jax.config.update('jax_platforms', os.environ['NR_TEST_PLATFORM'])

jax.config.update(
    'jax_compilation_cache_dir',
    str(pathlib.Path(__file__).resolve().parent.parent / '.jax_cache'))
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)


def cpu_mesh_devices(n=8):
    """n virtual CPU devices for sharding tests (works on any host)."""
    import jax
    devices = jax.devices('cpu')
    assert len(devices) >= n, (
        f'expected >= {n} virtual CPU devices, got {len(devices)} — '
        'XLA_FLAGS must be set before the CPU backend initializes')
    return devices[:n]
