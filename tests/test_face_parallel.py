"""Face-axis model parallelism (``RasterizeSettings.face_axis`` +
``parallel.make_face_sharded_render``).

The face list shards over a mesh axis; each device rasterizes its slice and
the z-buffers merge with a lexicographic (depth, global id) pmin — the
reference's sequential first-wins rule over the concatenated list
(reference rasterize.py:334).  Rendered images must be BIT-IDENTICAL to a
single-device render of the same (shard-order) face list, and gradients
must match the single-device custom-VJP backward.

Runs on the 8-virtual-device CPU mesh from conftest (backend='xla' pinned:
the merge logic is backend-independent; Pallas-under-shard_map composition
has its own tests).  Single-device comparisons run on the same CPU backend
(boundary pixels are sensitive to the compiled program).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

import conftest
import neural_renderer_tpu as nr
from neural_renderer_tpu import parallel
import utils

XLA = dict(backend='xla', auto_fast=False)


def _cpu(*arrays):
    cpu0 = conftest.cpu_mesh_devices(1)[0]
    out = tuple(jax.device_put(a, cpu0) for a in arrays)
    return out[0] if len(out) == 1 else out


def _mesh(n=8, axes=('faces',)):
    devs = np.asarray(conftest.cpu_mesh_devices(n))
    if len(axes) == 2:
        devs = devs.reshape(2, n // 2)
    return Mesh(devs, axes)


def _put(mesh, spec, *arrays):
    s = NamedSharding(mesh, spec)
    out = tuple(jax.device_put(np.asarray(a), s) for a in arrays)
    return out[0] if len(out) == 1 else out


def _teapot_scene(ts=None):
    vertices, faces, _ = utils.load_teapot_batch()
    vertices, faces = np.asarray(vertices), np.asarray(faces)
    bs, nf = faces.shape[:2]
    textures = None
    if ts:
        rng = np.random.RandomState(0)
        textures = rng.uniform(0, 1, (bs, nf, ts, ts, ts, 3)).astype(
            'float32')
    return vertices, faces, textures


def _face_coords(vertices, faces, pad_to=8):
    eye = jnp.asarray(
        nr.get_points_from_angles(np.float32(2.732), np.float32(30.0),
                                  np.float32(45.0)))
    v = nr.perspective(nr.look_at(_cpu(jnp.asarray(vertices)), eye), 30.0)
    fc = nr.vertices_to_faces(v, _cpu(jnp.asarray(faces)))
    pad = (-fc.shape[1]) % pad_to
    return np.asarray(jnp.pad(fc, ((0, 0), (0, pad), (0, 0), (0, 0))))


def test_face_sharded_silhouette_bit_equal():
    vertices, faces, _ = _teapot_scene()
    fc = _face_coords(vertices, faces)
    mesh = _mesh()

    single = jax.jit(lambda a: nr.rasterize_silhouettes(
        a, 64, False, **XLA))(_cpu(fc))

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, in_specs=(P(None, 'faces'),),
                       out_specs=P())
    def sharded(a):
        return nr.rasterize_silhouettes(a, 64, False, face_axis='faces',
                                        **XLA)

    got = sharded(_put(mesh, P(None, 'faces'), fc))
    np.testing.assert_array_equal(np.asarray(single), np.asarray(got))
    assert float(np.asarray(single).sum()) > 100


def test_face_sharded_rgbad_bit_equal():
    vertices, faces, textures = _teapot_scene(ts=2)
    fc = _face_coords(vertices, faces)
    pad = fc.shape[1] - textures.shape[1]
    tx = np.pad(textures, ((0, 0), (0, pad)) + ((0, 0),) * 4)
    mesh = _mesh()

    kw = dict(image_size=64, anti_aliasing=False,
              background_color=(0.2, 0.1, 0.4), **XLA)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, 'faces'), P(None, 'faces')),
        out_specs={'rgb': P(), 'alpha': P(), 'depth': P()})
    def sharded(a, t):
        return nr.rasterize_rgbad(a, t, face_axis='faces', **kw)

    for tag, f_np, t_np in [
            ('plain', fc, tx),
            # exact z-ties: the first 24 faces duplicated at the END of the
            # list (different shard, brighter texture) — the LOWER global
            # id must keep winning on both paths
            ('dup',
             np.concatenate([fc[:, :-24], fc[:, :24]], axis=1),
             np.concatenate([tx[:, :-24], tx[:, :24] + 0.5], axis=1))]:
        single = jax.jit(lambda a, t: nr.rasterize_rgbad(a, t, **kw))(
            *_cpu(f_np, t_np))
        got = sharded(*_put(mesh, P(None, 'faces'), f_np, t_np))
        for k in ('rgb', 'alpha', 'depth'):
            np.testing.assert_array_equal(
                np.asarray(single[k]), np.asarray(got[k]),
                err_msg=f'{tag}-{k}')


def test_face_sharded_gradients_match_single_device():
    vertices, faces, textures = _teapot_scene(ts=2)
    fc = _face_coords(vertices, faces)
    pad = fc.shape[1] - textures.shape[1]
    tx = np.pad(textures, ((0, 0), (0, pad)) + ((0, 0),) * 4)
    mesh = _mesh()
    is_ = 64
    seed = np.asarray(jax.random.normal(
        jax.random.PRNGKey(3), (fc.shape[0], 3, is_, is_)))
    bg = np.asarray([0.3, 0.2, 0.1], np.float32)

    def loss_single(a, t, b, s):
        img = nr.rasterize(a, t, is_, False, background_color=b, **XLA)
        return jnp.sum(img * s)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, 'faces'), P(None, 'faces'), P()), out_specs=P())
    def render_sharded(a, t, b):
        return nr.rasterize(a, t, is_, False, background_color=b,
                            face_axis='faces', **XLA)

    def loss_sharded(a, t, b, s):
        return jnp.sum(render_sharded(a, t, b) * s)

    gs = jax.jit(jax.grad(loss_single, argnums=(0, 1, 2)))(
        *_cpu(fc, tx, bg, seed))
    gp = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(
        *_put(mesh, P(None, 'faces'), fc, tx), *_put(mesh, P(), bg, seed))

    # texture gradients ride the deterministic segment reduction over the
    # same pixels -> bit-equal.  K5 face gradients are near-bit-equal: the
    # sharded program's shapes compile the in/out-sweep row reductions to
    # a different (still deterministic) reduction tree, so a handful of
    # elements differ at float-reassociation level (~1e-5 relative on the
    # teapot; measured 37/88704 elements).  The reference itself sums
    # these with atomicAdd — nondeterministic ORDER every run
    # (rasterize.py:826,836) — so exact-same-order across programs is not
    # part of the contract; per-program determinism is (covered by
    # test_grad_parity64's fingerprint).
    np.testing.assert_array_equal(np.asarray(gs[1]), np.asarray(gp[1]),
                                  err_msg='grad textures')
    a, b = np.asarray(gs[0]), np.asarray(gp[0])
    assert (a != b).mean() < 0.005, 'face grads diverge structurally'
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4 * np.abs(a).max(),
                               err_msg='grad faces')
    np.testing.assert_allclose(np.asarray(gs[2]), np.asarray(gp[2]),
                               rtol=1e-6, err_msg='grad background')
    assert float(np.abs(a).max()) > 0
    assert float(np.abs(np.asarray(gs[1])).max()) > 0

    # K7 depth backward under face sharding (analytic, per-pixel -> its
    # winner's slice): same near-bit contract
    dseed = seed[:, 0]

    def dloss_single(f_, s):
        d = nr.rasterize_depth(f_, is_, False, **XLA)
        return jnp.sum(d * s)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(None, 'faces'),), out_specs=P())
    def render_depth_sharded(f_):
        return nr.rasterize_depth(f_, is_, False, face_axis='faces', **XLA)

    gd_s = jax.jit(jax.grad(dloss_single))(*_cpu(fc, dseed))
    gd_p = jax.jit(jax.grad(
        lambda f_, s: jnp.sum(render_depth_sharded(f_) * s)))(
            _put(mesh, P(None, 'faces'), fc), _put(mesh, P(), dseed))
    a, b = np.asarray(gd_s), np.asarray(gd_p)
    assert (a != b).mean() < 0.005
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4 * np.abs(a).max(),
                               err_msg='grad faces (depth)')
    assert np.abs(a).max() > 0


def test_make_face_sharded_render_end_to_end():
    """Renderer-level helper: silhouette through the full camera pipeline,
    vertices gradient included, vs a single-device renderer over the SAME
    (per-shard fill_back) face order; textured rgb smoke."""
    vertices, faces, textures = _teapot_scene(ts=2)
    mesh = _mesh()
    n = mesh.shape['faces']

    r = nr.Renderer()
    r.image_size = 64
    r.eye = nr.get_points_from_angles(
        np.float32(2.732), np.float32(30.0), np.float32(45.0))
    r.perf_overrides = dict(XLA)

    sf, st = parallel.shard_faces(mesh, faces, textures)
    f = parallel.make_face_sharded_render(r, mesh, mode='silhouettes')
    vb = _put(mesh, P(), vertices)
    got = f(vb, sf)

    # single-device reference with the identical face order: per-shard
    # fill_back interleaves [slice, mirrored slice] per shard
    nfp = sf.shape[1] // n
    sf_np = np.asarray(sf)
    fb = np.concatenate(
        [np.concatenate([sf_np[:, i * nfp:(i + 1) * nfp],
                         sf_np[:, i * nfp:(i + 1) * nfp, ::-1]],
                        axis=1) for i in range(n)], axis=1)
    r1 = nr.Renderer()
    r1.image_size = 64
    r1.eye = r.eye
    r1.fill_back = False           # already doubled above
    r1.perf_overrides = dict(XLA)
    want = jax.jit(r1.render_silhouettes)(*_cpu(vertices, fb))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    # vertices gradient flows across shards (scatter-add + shard_map
    # transpose psum): nonzero and finite
    g = jax.jit(jax.grad(lambda v: jnp.sum(f(v, sf))))(vb)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0

    # textured rgb end-to-end (lighting + fused ts=2 shading path)
    frgb = parallel.make_face_sharded_render(r, mesh, mode='rgb')
    img = np.asarray(frgb(vb, sf, st))
    assert img.shape == (vertices.shape[0], 3, 64, 64)
    assert np.isfinite(img).all() and img.max() > 0


def test_face_sharded_pallas_csr_interpret():
    """The full Pallas pipeline (shaded forward emitting CSR artifacts +
    in/out-sweep backward + CSR face reduction) under face sharding, in
    interpret mode on a 2-device CPU mesh.  Validates the merge docstring's
    claim that per-device CSR artifacts stay correct: a pixel a device
    covered locally but lost globally contributes all-zero channels, so
    the local CSR reduction still sums exactly its faces' gradients."""
    from unittest import mock

    from neural_renderer_tpu.rasterize import backward_pallas, forward_pallas

    devices = conftest.cpu_mesh_devices(2)
    mesh = Mesh(np.asarray(devices), ('faces',))

    # tetrahedron: 4 faces -> 2 per device; every face covers pixels and
    # the z-merge decides real occlusions between shards
    vertices = np.asarray(
        [[1., 0., 0.], [0., 1., 0.], [0., 0., 1.], [0., 0., 0.]],
        np.float32) * 2 - 1
    faces = np.asarray(
        [[1, 3, 2], [3, 1, 0], [2, 0, 1], [0, 2, 3]], np.int32)
    eye = jnp.asarray(nr.get_points_from_angles(
        np.float32(2.732), np.float32(15.0), np.float32(30.0)))
    fc = np.asarray(nr.vertices_to_faces(
        nr.perspective(nr.look_at(_cpu(jnp.asarray(vertices))[None], eye),
                       30.0), _cpu(jnp.asarray(faces))[None]))

    caps = dict(runtime_checks=False, backend='pallas',
                faces_per_tile_cap=128, grad_csr_rows=256 * 17,
                grad_out_cap=2048, grad_offset_radius=96, grad_row_cap=128)
    is_ = 128
    seed = np.asarray(jax.random.normal(jax.random.PRNGKey(5),
                                        (1, is_, is_)))

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

    def loss_single(a, s):
        sil = nr.rasterize_silhouettes(a, is_, False, **caps)
        return jnp.sum(sil * s), sil

    # check_vma=False: interpret-mode pallas discharges index maps to jax
    # ops that trip the vma check on device-varying scalar-prefetch tables
    # (see test_parallel.py::test_pallas_interpret_under_multidevice_...).
    # With the check off, shard_map cannot prove the P() output replicated
    # and its transpose AVERAGES the cotangent over the axis — so take the
    # gradient INSIDE the body (grad of the local loss w.r.t. the local
    # slice, out_spec P(None, 'faces')), which has no such transpose.  The
    # compiled check_vma=True path differentiates through shard_map
    # directly (test_face_sharded_gradients_match_single_device).
    def local_loss(a, s):
        sil = nr.rasterize_silhouettes(a, is_, False, face_axis='faces',
                                       **caps)
        return jnp.sum(sil * s)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(None, 'faces'), P()),
        out_specs=P(), check_vma=False)
    def render_sharded(a, s):
        sil = nr.rasterize_silhouettes(a, is_, False, face_axis='faces',
                                       **caps)
        return sil

    grad_sharded_fn = shard_map(
        jax.grad(local_loss), mesh=mesh,
        in_specs=(P(None, 'faces'), P()), out_specs=P(None, 'faces'),
        check_vma=False)

    for p in patches:
        p.__enter__()
    try:
        g_single = jax.jit(jax.grad(
            lambda a, s: loss_single(a, s)[0]))(*_cpu(fc, seed))
        single_sil = jax.jit(
            lambda a, s: loss_single(a, s)[1])(*_cpu(fc, seed))
        sharded_sil = jax.jit(render_sharded)(
            _put(mesh, P(None, 'faces'), fc), _put(mesh, P(), seed))
        g_sharded = jax.jit(grad_sharded_fn)(
            _put(mesh, P(None, 'faces'), fc), _put(mesh, P(), seed))
    finally:
        for p in patches:
            p.__exit__(None, None, None)

    np.testing.assert_array_equal(np.asarray(single_sil),
                                  np.asarray(sharded_sil))
    assert float(np.asarray(single_sil).sum()) > 50
    a, b = np.asarray(g_single), np.asarray(g_sharded)
    assert np.abs(a).max() > 0
    np.testing.assert_allclose(b, a, rtol=5e-4, atol=5e-4 * np.abs(a).max(),
                               err_msg='face grads (pallas CSR sharded)')


def test_face_sharded_composes_with_batch_axis():
    """2-D mesh (batch x faces): DP and face-sharding in one program."""
    mesh = _mesh(8, ('batch', 'faces'))
    vertices, faces, _ = _teapot_scene()
    fc = _face_coords(vertices, faces, pad_to=4)

    single = jax.jit(lambda a: nr.rasterize_silhouettes(
        a, 64, False, **XLA))(_cpu(fc))

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P('batch', 'faces'),),
                       out_specs=P('batch'))
    def sharded(a):
        return nr.rasterize_silhouettes(a, 64, False, face_axis='faces',
                                        **XLA)

    got = sharded(_put(mesh, P('batch', 'faces'), fc))
    np.testing.assert_array_equal(np.asarray(single), np.asarray(got))
