"""Native (C++) OBJ parser parity with the Python parser."""

import numpy as np
import pytest

from neural_renderer_tpu.io import native, obj


def test_teapot_parity():
    if not native.available():
        pytest.skip('native toolchain unavailable')
    v1, f1 = obj.load_obj('tests/data/teapot.obj', use_native=True)
    v2, f2 = obj.load_obj('tests/data/teapot.obj', use_native=False)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(f1, f2)


def test_quads_and_negative_indices(tmp_path):
    if not native.available():
        pytest.skip('native toolchain unavailable')
    p = tmp_path / 'm.obj'
    p.write_text(
        'v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n'
        'f 1 2 3 4\n'            # quad -> fan triangulation
        'f -4//1 -3/2/ -2\n')    # negative + mixed index forms
    v1, f1 = obj.load_obj(str(p), use_native=True, normalization=False)
    v2, f2 = obj.load_obj(str(p), use_native=False, normalization=False)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(f1, [[0, 1, 2], [0, 2, 3], [0, 1, 2]])


def test_negative_indices_interleaved(tmp_path):
    """Relative (negative) indices resolve against the vertices seen SO FAR
    — both parsers must agree on files interleaving v and f lines."""
    p = tmp_path / 'm.obj'
    p.write_text(
        'v 0 0 0\nv 1 0 0\nv 1 1 0\n'
        'f -3 -2 -1\n'            # refers to vertices 0,1,2
        'v 0 1 0\nv 0 0 1\nv 1 0 1\n'
        'f -3 -2 -1\n')           # refers to vertices 3,4,5 (6 seen now)
    v1, f1 = obj.load_obj(str(p), use_native=False, normalization=False)
    np.testing.assert_array_equal(f1, [[0, 1, 2], [3, 4, 5]])
    if native.available():
        v2, f2 = obj.load_obj(str(p), use_native=True, normalization=False)
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(f1, f2)
