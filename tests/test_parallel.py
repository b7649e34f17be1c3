"""Sharding tests on a virtual 8-device CPU mesh: batch-parallel rendering
and the data-parallel train step must match single-device results (the
reference has no distributed path — SURVEY.md section 2.3 — so the contract
here is exact equivalence, not golden data)."""

import numpy as np
import pytest

import conftest


@pytest.fixture(scope='module')
def mesh8():
    import jax  # noqa: F401  (backend init after XLA_FLAGS)
    from neural_renderer_tpu import parallel
    return parallel.default_mesh(conftest.cpu_mesh_devices(8))


def _scene(batch_size):
    import jax.numpy as jnp
    vertices = jnp.asarray(
        [[1., 0., 0.], [0., 1., 0.], [0., 0., 1.], [0., 0., 0.]],
        jnp.float32) * 2 - 1
    faces = jnp.asarray(
        [[1, 3, 2], [3, 1, 0], [2, 0, 1], [0, 2, 3]], jnp.int32)
    v = jnp.broadcast_to(vertices, (batch_size,) + vertices.shape)
    f = jnp.broadcast_to(faces, (batch_size,) + faces.shape)
    return v, f


def test_sharded_silhouette_matches_single_device(mesh8):
    import jax
    import neural_renderer_tpu as nr
    from neural_renderer_tpu import parallel

    renderer = nr.Renderer()
    renderer.image_size = 32
    renderer.anti_aliasing = False
    renderer.perf_overrides = dict(backend='xla')

    v, f = _scene(8)
    # reference render on the SAME (CPU) backend with the SAME per-device
    # batch shape (bs=1): boundary pixels are sensitive to the compiled
    # program (fma contraction differs across platforms and across batch
    # shapes), so the contract is equality against the per-shard program.
    cpu0 = conftest.cpu_mesh_devices(1)[0]
    v_c = jax.device_put(v[:1], cpu0)
    f_c = jax.device_put(f[:1], cpu0)
    single = np.asarray(jax.jit(renderer.render_silhouettes)(v_c, f_c))[0]
    v_s, f_s = parallel.shard_batch(mesh8, v, f)
    sharded = np.asarray(parallel.sharded_render(
        renderer, mesh8, v_s, f_s, mode='silhouettes'))
    assert sharded.shape == (8, 32, 32)
    for b in range(8):
        np.testing.assert_array_equal(single, sharded[b])


def test_pallas_under_shard_map_tpu():
    """The Pallas kernels compose with jax.shard_map (vma-annotated out
    shapes): sharded render must be bit-exact vs the single-device pallas
    render.  TPU only (the CPU tests above pin the XLA backend)."""
    import jax
    import jax.numpy as jnp
    import neural_renderer_tpu as nr
    from neural_renderer_tpu import parallel

    if jax.default_backend() != 'tpu':
        pytest.skip('needs a TPU device')

    import os
    from utils import DATA_DIR
    vertices, faces = nr.load_obj(os.path.join(DATA_DIR, 'teapot.obj'))
    bs = 2
    v = jnp.broadcast_to(jnp.asarray(vertices),
                         (bs,) + vertices.shape)
    f = jnp.broadcast_to(jnp.asarray(faces), (bs,) + faces.shape)

    renderer = nr.Renderer()
    renderer.image_size = 128
    renderer.anti_aliasing = False

    mesh = parallel.default_mesh(jax.devices()[:1])
    single = np.asarray(jax.jit(renderer.render_silhouettes)(v, f))
    sharded = np.asarray(parallel.sharded_render(
        renderer, mesh, v, f, mode='silhouettes'))
    np.testing.assert_array_equal(single, sharded)

    # gradients through the kernels inside shard_map
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def loss(vv):
        renderer.perf_overrides = dict(grad_out_cap=8192,
                                       grad_offset_radius=24,
                                       grad_row_cap=128)
        out = renderer.render_silhouettes(vv, f)
        renderer.perf_overrides = {}
        return jnp.sum(jnp.square(out - 0.5))

    g_single = np.asarray(jax.jit(jax.grad(loss))(v))
    sharded_grad = shard_map(
        jax.grad(loss), mesh=mesh,
        in_specs=(P('batch'),), out_specs=P('batch'))
    g_sharded = np.asarray(jax.jit(sharded_grad)(v))
    np.testing.assert_array_equal(g_single, g_sharded)


def test_pallas_interpret_under_multidevice_shard_map(mesh8):
    """Multi-device Pallas composition, DEMONSTRATED: the full Pallas
    pipeline (shaded forward + CSR reduction + in/out-sweep backward
    kernels) runs in interpret mode under a REAL 2-device CPU shard_map
    mesh, bit-equal vs the same pipeline on one device.  This is the vma
    contract (forward_pallas._out_struct) exercised with >1 device — the
    single real TPU chip can only ever build a 1-device mesh."""
    import functools

    from unittest import mock

    import jax
    import jax.numpy as jnp
    import neural_renderer_tpu as nr
    from neural_renderer_tpu import parallel
    from neural_renderer_tpu.rasterize import backward_pallas, forward_pallas
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    devices = conftest.cpu_mesh_devices(2)
    mesh = parallel.default_mesh(devices)

    v, f = _scene(2)
    # single-device reference: a bs=1 program committed to CPU device 0 —
    # the per-shard batch shape (boundary pixels are sensitive to the
    # compiled program; fma contraction differs across batch shapes, see
    # test_sharded_silhouette_matches_single_device).  Sharded run: the
    # SAME values laid out over the 2-device mesh.
    v0 = jax.device_put(v[:1], devices[0])
    f0 = jax.device_put(f[:1], devices[0])
    v_s, f_s = parallel.shard_batch(mesh, v, f)

    renderer = nr.Renderer()
    renderer.image_size = 128          # %128: the kernel-supported shape
    renderer.anti_aliasing = False
    # explicit covering capacities select the kernel paths statically (no
    # auto guards — those are TPU-gated); values validated by the scene's
    # size (4 faces, spans < 96 px)
    renderer.perf_overrides = dict(
        runtime_checks=False, faces_per_tile_cap=128, grad_csr_rows=256 * 17,
        grad_out_cap=2048, grad_offset_radius=96, grad_row_cap=128)

    def interp(fn):
        return functools.partial(fn, interpret=True)

    patches = [
        mock.patch.object(forward_pallas, 'forward_shaded',
                          interp(forward_pallas.forward_shaded)),
        mock.patch.object(backward_pallas, 'insweep_channels',
                          interp(backward_pallas.insweep_channels)),
        mock.patch.object(backward_pallas, 'outsweep_channels',
                          interp(backward_pallas.outsweep_channels)),
        mock.patch.object(backward_pallas, 'csr_partial_channels',
                          interp(backward_pallas.csr_partial_channels)),
        mock.patch.object(forward_pallas, 'supported', lambda s, fc: True),
        mock.patch.object(backward_pallas, 'supported',
                          lambda s: s.grad_offset_radius is not None),
        mock.patch.object(backward_pallas, 'supported_outsweep',
                          lambda s: True),
    ]

    def loss(vv, ff):
        out = renderer.render_silhouettes(vv, ff)
        return jnp.sum(jnp.square(out - 0.5))

    ctx = [p.__enter__() for p in patches]
    try:
        fwd_single = np.asarray(jax.jit(renderer.render_silhouettes)(v0, f0))
        g_single = np.asarray(jax.jit(jax.grad(loss))(v0, f0))

        # check_vma=False: in INTERPRET mode pallas discharges its index
        # maps to jax ops, and any indexing of a device-varying scalar-
        # prefetch table (even counts_ref[0]) trips the dynamic_slice vma
        # check — JAX's own error prescribes check_vma=False for this.
        # The compiled TPU path is unaffected (index maps lower through
        # Mosaic; output vma is declared by forward_pallas._out_struct),
        # and the equality asserts below still prove the multi-device
        # SPMD execution of the full kernel pipeline is exact.
        fwd_sharded = np.asarray(jax.jit(shard_map(
            renderer.render_silhouettes, mesh=mesh,
            in_specs=(P('batch'), P('batch')),
            out_specs=P('batch'), check_vma=False))(v_s, f_s))
        g_sharded = np.asarray(jax.jit(shard_map(
            jax.grad(loss), mesh=mesh,
            in_specs=(P('batch'), P('batch')),
            out_specs=P('batch'), check_vma=False))(v_s, f_s))
    finally:
        for p in patches:
            p.__exit__(None, None, None)
    del ctx

    assert np.abs(g_single).max() > 0
    # both batch elements are identical, so every shard must reproduce the
    # bs=1 single-device render/grad bit-for-bit
    for b in range(2):
        np.testing.assert_array_equal(fwd_single[0], fwd_sharded[b])
        np.testing.assert_array_equal(g_single[0], g_sharded[b])


def test_data_parallel_train_step(mesh8):
    import jax
    import jax.numpy as jnp
    import neural_renderer_tpu as nr
    from neural_renderer_tpu import parallel

    renderer = nr.Renderer()
    renderer.image_size = 16
    renderer.anti_aliasing = False
    renderer.perf_overrides = dict(backend='xla')

    v, f = _scene(1)
    faces = f[0]
    targets = np.zeros((8, 16, 16), 'float32')
    targets[:, 4:12, 4:12] = 1.0
    eyes = np.stack([
        np.asarray(nr.get_points_from_angles(
            np.float32(2.732), np.float32(15.0), np.float32(a)))
        for a in np.linspace(0, 360, 8, endpoint=False)])

    def loss_fn(params, batch):
        eye, target = batch
        bs = eye.shape[0]
        vv = jnp.broadcast_to(params['vertices'],
                              (bs,) + params['vertices'].shape)
        ff = jnp.broadcast_to(faces, (bs,) + faces.shape)
        renderer.eye = eye
        image = renderer.render_silhouettes(vv, ff)
        return jnp.mean(jnp.square(image - target))

    init_fn, update_fn = nr.adam(alpha=0.05)
    params = dict(vertices=v[0])
    opt_state = init_fn(params)
    step = parallel.make_data_parallel_train_step(loss_fn, update_fn, mesh8)

    batch = (parallel.shard_batch(mesh8, jnp.asarray(eyes)),
             parallel.shard_batch(mesh8, jnp.asarray(targets)))
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # gradient direction is productive
