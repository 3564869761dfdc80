"""Descriptor serving daemon (pdc_tpu/apps/serve.py): protocol roundtrip,
numerical parity with the in-process forward, best-match queries, error
paths, and cross-request microbatching under concurrent clients."""

import threading

import jax
import numpy as np
import pytest

from pdc_tpu.apps.serve import DescriptorClient, DescriptorServer
from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

W, H, D = 48, 32, 3


@pytest.fixture(scope="module")
def dcn():
    cfg = {"descriptor_dimension": D, "image_width": W, "image_height": H,
           "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"}}
    return DenseCorrespondenceNetwork.from_config(cfg, rng=jax.random.PRNGKey(3))


@pytest.fixture(scope="module")
def server(dcn):
    s = DescriptorServer(dcn, port=0, max_batch=4, max_wait_ms=20.0)
    s.warmup()
    s.start()
    yield s
    s.shutdown()


def _client(server):
    host, port = server.address
    return DescriptorClient(host, port)


def _frame(seed):
    return np.random.RandomState(seed).randint(
        0, 255, size=(H, W, 3), dtype=np.uint8)


def test_ping_and_info(server):
    with _client(server) as c:
        assert c.ping()
        info = c.info()
        assert (info["height"], info["width"]) == (H, W)
        assert info["descriptor_dimension"] == D


def test_descriptors_match_in_process_forward(server, dcn):
    rgb = _frame(0)
    with _client(server) as c:
        served = c.descriptors(rgb)
    direct = np.asarray(dcn.forward_on_img(rgb))
    assert served.shape == (H, W, D)
    np.testing.assert_allclose(served, direct, atol=1e-4, rtol=1e-4)


def test_best_match_matches_library_search(server, dcn):
    rgb = _frame(1)
    res = np.asarray(dcn.forward_on_img(rgb))
    # queries = exact descriptors at known pixels -> best match must land
    # at distance ~0 (ties possible on synthetic textures; check distance)
    pts = [(5, 7), (30, 20), (11, 3)]
    queries = np.stack([res[v, u] for u, v in pts])
    with _client(server) as c:
        uv, dist = c.best_match(rgb, queries)
    assert uv.shape == (3, 2) and dist.shape == (3,)
    assert np.all(dist < 1e-4)
    for (u, v), (bu, bv) in zip(pts, uv):
        np.testing.assert_allclose(res[bv, bu], res[v, u], atol=1e-5)


def test_multiple_requests_one_connection(server):
    with _client(server) as c:
        a = c.descriptors(_frame(2))
        assert c.ping()
        b = c.descriptors(_frame(3))
    assert not np.allclose(a, b)


def test_error_paths(server):
    with _client(server) as c:
        with pytest.raises(RuntimeError, match="shape"):
            c._roundtrip({"op": "descriptors", "shape": [8, 8, 3]},
                         b"\0" * (8 * 8 * 3))
        with pytest.raises(RuntimeError, match="unknown op"):
            c._roundtrip({"op": "frobnicate"})
        with pytest.raises(RuntimeError, match="queries"):
            c._roundtrip({"op": "best_match", "shape": [H, W, 3],
                          "queries": [[1.0]]}, _frame(4).tobytes())
        with pytest.raises(RuntimeError, match="max_queries"):
            c._roundtrip({"op": "best_match", "shape": [H, W, 3],
                          "queries": [[0.0] * D] * 99}, _frame(4).tobytes())
        # connection still serves after errors
        assert c.ping()


def test_overflow_shape_rejected(server):
    """int64-wrapping shape products must not bypass the payload cap."""
    with _client(server) as c:
        with pytest.raises(RuntimeError, match="bad shape"):
            c._roundtrip({"op": "descriptors", "shape": [3, 2 ** 62, 1]})


def test_non_power_of_two_max_batch(dcn):
    """max_batch=12 clamps to the 8-bucket; overload must not wedge the
    batcher (regression: frames array overflow killed the batcher thread)."""
    s = DescriptorServer(dcn, port=0, max_batch=12, max_wait_ms=50.0)
    assert s._max_batch == s._buckets[-1] == 8
    s.start()
    try:
        host, port = s.address
        results, errors = [None] * 16, []

        def worker(i):
            try:
                with DescriptorClient(host, port) as c:
                    results[i] = c.descriptors(_frame(100 + i))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors
        assert all(r is not None for r in results)
    finally:
        s.shutdown()


def test_concurrent_clients_microbatch(server, dcn):
    """8 concurrent clients: all answers correct, and the batcher coalesced
    them into fewer dispatches than requests."""
    frames = [_frame(10 + i) for i in range(8)]
    expected = [np.asarray(dcn.forward_on_img(f)) for f in frames]
    before = dict(server.stats)
    results = [None] * 8
    errors = []

    def worker(i):
        try:
            with _client(server) as c:
                results[i] = c.descriptors(frames[i])
        except Exception as e:  # pragma: no cover - surfaced via errors list
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    for got, want in zip(results, expected):
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    frames_served = server.stats["frames"] - before["frames"]
    dispatches = server.stats["dispatches"] - before["dispatches"]
    assert frames_served == 8
    assert dispatches < 8, "no cross-request batching happened"


def test_model_parallel_server(dcn):
    """A 2-D (data, model) mesh: batches sharded over data, conv channels
    Megatron-column-sharded over model — answers must still match the
    unsharded forward."""
    import jax

    from pdc_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(("data", "model"), shape=(2, 4),
                     devices=jax.devices()[:8])
    s = DescriptorServer(dcn, port=0, max_batch=4, max_wait_ms=30.0,
                         mesh=mesh)
    assert all(b % 2 == 0 for b in s._buckets)
    # the weights are actually stored channel-sharded
    big = max(jax.tree.leaves(s._variables), key=lambda l: l.size)
    assert big.sharding.shard_shape(big.shape) != big.shape
    s.start()
    try:
        frames = [_frame(90 + i) for i in range(3)]
        expected = [np.asarray(dcn.forward_on_img(f)) for f in frames]
        host, port = s.address
        for f, want in zip(frames, expected):
            with DescriptorClient(host, port) as c:
                got = c.descriptors(f)
            np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    finally:
        s.shutdown()


def test_mesh_sharded_server(dcn):
    """mesh= shards each coalesced batch over the 8 virtual devices; answers
    must match the unsharded forward."""
    from pdc_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(("data",))
    n = mesh.shape["data"]
    s = DescriptorServer(dcn, port=0, max_batch=4 * n, max_wait_ms=30.0,
                         mesh=mesh)
    assert all(b % n == 0 for b in s._buckets)
    s.start()
    try:
        frames = [_frame(50 + i) for i in range(n + 3)]  # pad + multi-shard
        expected = [np.asarray(dcn.forward_on_img(f)) for f in frames]
        host, port = s.address
        results = [None] * len(frames)

        def worker(i):
            with DescriptorClient(host, port) as c:
                results[i] = c.descriptors(frames[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(frames))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for got, want in zip(results, expected):
            np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    finally:
        s.shutdown()


def test_quantized_serving_clone(dcn):
    """The int8 serving clone drops into the same server unchanged."""
    s = DescriptorServer(dcn.quantized(), port=0, max_batch=2)
    s.start()
    try:
        rgb = _frame(42)
        with _client(s) as c:
            served = c.descriptors(rgb)
        direct = np.asarray(dcn.forward_on_img(rgb))
        cos = float((served * direct).sum()
                    / (np.linalg.norm(served) * np.linalg.norm(direct) + 1e-12))
        assert cos > 0.99, cos
    finally:
        s.shutdown()


def test_model_parallel_int8_server(dcn):
    """The int8 serving clone composes with --model_parallel: quantized
    convs run with channel-sharded weights (quant scales replicate) and
    still agree with the clone's own unsharded forward. Uses the STATIC
    calibrated clone — dynamic per-tensor scales change under the server's
    bucket padding (pad rows normalize to -mean/std, which can raise the
    batch abs-max), so only calibrated scales make serving
    padding-invariant; that is unrelated to model parallelism."""
    import jax

    from pdc_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    q = dcn.calibrate_quantization([_frame(7), _frame(8)])
    mesh = make_mesh(("data", "model"), shape=(2, 4),
                     devices=jax.devices()[:8])
    s = DescriptorServer(q, port=0, max_batch=2, max_wait_ms=20.0, mesh=mesh)
    s.start()
    try:
        rgb = _frame(123)
        want = np.asarray(q.forward_on_img(rgb))
        host, port = s.address
        with DescriptorClient(host, port) as c:
            got = c.descriptors(rgb)
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    finally:
        s.shutdown()


def test_png_upload_exact_and_f16_response(server, dcn):
    """PNG is lossless -> descriptors identical to the raw-upload path;
    float16 response stays within half-precision rounding of them."""
    rgb = _frame(7)
    with _client(server) as c:
        raw = c.descriptors(rgb)
        png = c.descriptors(rgb, encoding="png")
        f16 = c.descriptors(rgb, encoding="png", response_dtype="float16")
    np.testing.assert_array_equal(raw, png)
    assert f16.dtype == np.float16
    np.testing.assert_allclose(f16.astype(np.float32), raw,
                               atol=2e-3, rtol=2e-3)


def test_jpeg_upload_close_and_small(server):
    """JPEG is lossy -> descriptors close but not exact; the wire payload is
    a fraction of the raw frame."""
    from pdc_tpu.apps.serve import encode_frame

    rgb = _frame(8)
    payload = encode_frame(rgb, "jpeg", quality=90)
    assert len(payload) < rgb.nbytes / 2
    with _client(server) as c:
        raw = c.descriptors(rgb)
        jpg = c.descriptors(rgb, encoding="jpeg")
    assert np.sqrt(np.mean((raw - jpg) ** 2)) < 0.5 * np.std(raw) + 1e-3


def test_best_match_compressed_upload(server):
    rgb = _frame(9)
    queries = np.random.RandomState(9).randn(3, D).astype(np.float32)
    with _client(server) as c:
        uv_raw, dist_raw = c.best_match(rgb, queries)
        uv_png, dist_png = c.best_match(rgb, queries, encoding="png")
    np.testing.assert_array_equal(uv_raw, uv_png)
    np.testing.assert_allclose(dist_raw, dist_png, rtol=1e-6)


def test_bad_encoding_rejected(server):
    import json
    import socket

    host, port = server.address
    with socket.create_connection((host, port), timeout=30) as s:
        rf = s.makefile("rb")
        s.sendall(json.dumps({"op": "descriptors", "shape": [H, W, 3],
                              "encoding": "bmp"}).encode() + b"\n")
        resp = json.loads(rf.readline())
        assert not resp["ok"] and "encoding" in resp["error"]


def test_mixed_descriptor_and_best_match_batch(server, dcn):
    """Concurrent descriptors + best_match requests coalesce into one batch;
    the gathered descriptor fetch must route each slice to its own request."""
    frames = [_frame(20 + i) for i in range(4)]
    queries = np.random.RandomState(1).randn(2, D).astype(np.float32)
    results = {}

    def desc(i):
        with _client(server) as c:
            results[i] = c.descriptors(frames[i])

    def bm(i):
        with _client(server) as c:
            results[i] = c.best_match(frames[i], queries)

    threads = [threading.Thread(target=desc, args=(0,)),
               threading.Thread(target=bm, args=(1,)),
               threading.Thread(target=desc, args=(2,)),
               threading.Thread(target=bm, args=(3,))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in (0, 2):
        direct = np.asarray(dcn.forward_on_img(frames[i]))
        np.testing.assert_allclose(results[i], direct, atol=1e-4, rtol=1e-4)
    for i in (1, 3):
        uv, dist = results[i]
        assert uv.shape == (2, 2) and dist.shape == (2,)


def test_encoded_image_dims_parses_png_and_jpeg():
    from pdc_tpu.apps.serve import encode_frame, encoded_image_dims

    rgb = _frame(11)
    assert encoded_image_dims(encode_frame(rgb, "png")) == (H, W)
    jpg = encode_frame(rgb, "jpeg")
    assert encoded_image_dims(jpg) == (H, W)
    assert encoded_image_dims(b"not an image") is None

    # spec-legal variants some hardware MJPEG encoders emit: 0xFF fill
    # bytes between segments, and standalone TEM/RSTn markers — the header
    # walker must skip them, not read garbage segment lengths
    assert jpg[:2] == b"\xff\xd8"
    padded = jpg[:2] + b"\xff\xff\xff" + jpg[2:]
    assert encoded_image_dims(padded) == (H, W)
    with_tem = jpg[:2] + b"\xff\x01" + b"\xff" + jpg[2:]
    assert encoded_image_dims(with_tem) == (H, W)
    # EOI before any SOF: recognizably a JPEG but no frame header
    assert encoded_image_dims(b"\xff\xd8\xff\xd9" + b"\x00" * 16) is None


def test_decode_bomb_rejected_before_decode(server):
    """A kilobyte-scale crafted PNG declaring gigapixel dims must be
    rejected from its HEADER (ADVICE r4: cv2.imdecode would otherwise
    allocate the decoded size), and the connection stays usable."""
    import json
    import socket

    # valid PNG signature + IHDR declaring 30000x30000
    bomb = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
            + (30000).to_bytes(4, "big") + (30000).to_bytes(4, "big")
            + b"\x08\x02\x00\x00\x00" + b"\x00" * 64)
    host, port = server.address
    with socket.create_connection((host, port), timeout=30) as s:
        rf = s.makefile("rb")
        s.sendall(json.dumps({
            "op": "descriptors", "shape": [H, W, 3], "encoding": "png",
            "payload_len": len(bomb)}).encode() + b"\n")
        s.sendall(bomb)
        resp = json.loads(rf.readline())
        assert not resp["ok"] and "header dims" in resp["error"]
    # a fresh well-formed request still works
    with _client(server) as c:
        out = c.descriptors(_frame(12))
    assert out.shape == (H, W, D)


def test_non_pow2_bucket_gather_clamped(dcn):
    """Mesh-sharded buckets are n*m with n = data-axis size, not
    necessarily a power of two. _run_batch's descriptor-gather pad must
    clamp to the bucket (ADVICE r4: the next power of two above a non-pow2
    bucket is a shape warmup never primed)."""
    if len(jax.devices()) < 6:
        pytest.skip("needs >= 6 devices for a non-pow2 data axis")
    from jax.sharding import Mesh

    from pdc_tpu.apps.serve import _Request

    mesh = Mesh(np.array(jax.devices()[:6]), ("data",))
    s = DescriptorServer(dcn, port=0, max_batch=6, max_wait_ms=20.0,
                         mesh=mesh)
    assert 6 in s._buckets  # the non-pow2 bucket under test
    s.warmup()
    s.start()  # shutdown() joins serve_forever — it must have started
    try:
        # 5 descriptor requests (queries=None): pad would be 8 > bucket 6
        batch = [_Request(_frame(20 + i)) for i in range(5)]
        s._run_batch(batch)
        for i, r in enumerate(batch):
            assert r.error is None, r.error
            got = r.result[0]  # (descriptors, uv, dist)
            want = np.asarray(dcn.forward_on_img(batch[i].rgb))
            np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        s.shutdown()
