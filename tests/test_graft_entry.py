"""Smoke-test the driver hooks in ``__graft_entry__.py``.

The driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip`` on virtual CPU devices; neither went through the test
suite before, so a stale keyword in the dryrun's perf_overrides could only
fail at driver time (it happened: ``mirror_split`` outlived the
windowed-fetch removal).  Keep both importable and runnable here.
"""

import pathlib
import sys

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def test_entry_traces():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (4, 3, 256, 256)


def test_dryrun_multichip_cpu_mesh():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)   # asserts finite losses internally
