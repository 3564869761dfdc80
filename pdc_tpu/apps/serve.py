"""Production descriptor-serving daemon: ``python -m pdc_tpu serve``.

The reference has no serving story — every consumer (live heatmap UI
``live_heatmap_visualization.py:208-231``, grasp demos, descriptor
precompute ``compute_descriptor_images.py:38-96``) re-implements
load-network + forward + host argmin in-process. pdc_tpu adds a
deployment-grade surface: one daemon owns the TPU program and serves
descriptor images / best-match queries to any number of clients over TCP,
with cross-request microbatching so concurrent clients fill the MXU
(one 640x480 forward costs nearly the same as eight — see the B=1 vs B=8
grasp-stream rows in BENCHMARKS.md).

Design (TPU-first):
- ONE fused jitted program per batch bucket: uint8 frames -> mean/std
  normalize -> backbone forward -> float32 descriptors. Buckets are powers
  of two up to ``max_batch`` so shapes stay static (no recompiles after
  warmup); short batches are padded.
- A single batcher thread drains the request queue, coalescing up to
  ``max_batch`` frames or ``max_wait_ms`` of arrivals into one dispatch —
  the standard serving recipe for amortizing dispatch latency.
- Best-match queries ride INSIDE the same batched dispatch (the
  ``find_best_match_for_descriptor`` generalization, reference
  dense_correspondence_network.py:527-550, batched as one einsum-argmin
  over the coalesced frames): a batch of best_match requests costs exactly
  one upload + one bytes-sized fetch, never a per-request device round
  trip. Descriptor images stay on device; the ``descriptors`` op fetches
  only its own frame's slice.
- int8 PTQ serving plugs in unchanged: ``--int8`` (dynamic scales) /
  ``--int8_static`` (calibrated scales, fastest — 1406 vs 829 img/s at
  B=256 on v5e; see BENCHMARKS.md). Prefer ``--int8_static`` for a daemon:
  dynamic per-tensor scales depend on everything co-batched into a bucket
  (including zero-pad rows, which normalize to ``-mean/std``), so a
  frame's dynamic-int8 descriptors vary slightly with batch composition;
  calibrated scales make serving deterministic per frame.

Wire protocol (one TCP connection serves many requests):
  request  = JSON header line ending in ``\\n``, then the payload bytes.
             Header keys: ``op`` ("ping" | "info" | "descriptors" |
             "best_match"), ``shape`` [H, W, 3] (decoded frame dims),
             ``encoding`` ("raw" uint8 RGB, default | "jpeg" | "png" —
             compressed frames carry ``payload_len`` and cut the upload
             ~10-20x; the wire is usually the serving bottleneck through
             thin links), ``response_dtype`` ("float32" default |
             "float16" — halves the descriptor download),
             ``queries`` [[D floats], ...] (best_match only).
  response = JSON header line (``ok``, plus ``shape``/``dtype`` when a
             payload follows), then the payload bytes (little-endian
             descriptors, or int32 uv + float32 distances).

Use :class:`DescriptorClient` from Python, or any language that can write
a JSON line + raw bytes.
"""

from __future__ import annotations

import json
import math
import queue
import socket
import socketserver
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

class _DesyncError(ValueError):
    """Protocol framing is unrecoverable; close the connection."""


def encode_frame(rgb_u8: np.ndarray, encoding: str, quality: int = 90) -> bytes:
    """Compress an RGB uint8 frame for the wire ("jpeg" | "png"). cv2 when
    present (fast), PIL otherwise — host-side only, like every other image
    codec use in pdc_tpu."""
    try:
        import cv2

        ext = ".jpg" if encoding == "jpeg" else ".png"
        params = ([int(cv2.IMWRITE_JPEG_QUALITY), int(quality)]
                  if encoding == "jpeg" else [])
        ok, buf = cv2.imencode(ext, rgb_u8[:, :, ::-1], params)  # RGB->BGR
        if not ok:
            raise ValueError(f"cv2 {encoding} encode failed")
        return buf.tobytes()
    except ImportError:
        import io

        from PIL import Image

        bio = io.BytesIO()
        Image.fromarray(rgb_u8).save(
            bio, format="JPEG" if encoding == "jpeg" else "PNG",
            quality=int(quality))
        return bio.getvalue()


def encoded_image_dims(data: bytes):
    """(height, width) parsed from a PNG/JPEG header, or None if the bytes
    are not a recognizable image. Lets the serving daemon reject a crafted
    small payload that would DECODE to a multi-GB allocation (cv2.imdecode
    permits ~2^30 pixels) before paying for the decode."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        # 8-byte signature, 4-byte IHDR length + type, then W/H big-endian
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return h, w
    if data[:2] == b"\xff\xd8":
        # JPEG: walk marker segments to the first SOFn frame header
        sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
               0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
        i = 2
        while i + 9 < len(data) and data[i] == 0xFF:
            marker = data[i + 1]
            if marker == 0xFF:  # 0xFF fill/padding byte before a marker
                i += 1
                continue
            if marker in sof:
                h = int.from_bytes(data[i + 5:i + 7], "big")
                w = int.from_bytes(data[i + 7:i + 9], "big")
                return h, w
            if marker == 0xD9:  # EOI before any SOF: no frame header
                break
            # standalone (zero-length) markers: SOI, TEM, RSTn
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            i += 2 + int.from_bytes(data[i + 2:i + 4], "big")
    return None


def decode_frame(data: bytes, encoding: str) -> np.ndarray:
    """Inverse of :func:`encode_frame`: compressed bytes -> RGB uint8."""
    try:
        import cv2

        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError(f"cv2 {encoding} decode failed")
        return np.ascontiguousarray(img[:, :, ::-1])  # BGR->RGB
    except ImportError:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class _Request:
    __slots__ = ("rgb", "queries", "event", "result", "error")

    def __init__(self, rgb, queries=None):
        self.rgb = rgb
        self.queries = queries  # [Q, D] float32 or None (descriptors op)
        self.event = threading.Event()
        self.result = None  # (out_device, i, uv [Qmax, 2], dist [Qmax])
        self.error: Optional[str] = None


class DescriptorServer:
    """TCP descriptor server with cross-request microbatching.

    :param dcn: a ``DenseCorrespondenceNetwork`` (float, ``dcn.quantized()``
        or ``dcn.calibrate_quantization(...)`` serving clones all work —
        the server only uses ``module``/``variables``/normalization stats).
    :param max_batch: largest fused batch (power-of-two buckets below it).
    :param max_wait_ms: how long the batcher waits for more requests once
        one arrives. Keep small; it bounds added latency.
    :param mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis — the
        coalesced batch is sharded over it (GSPMD splits the forward across
        chips over ICI), so one daemon saturates a whole slice. Batch
        buckets become multiples of the axis size. A 2-D ``(data, model)``
        mesh additionally shards conv channels over the ``model`` axis
        (``parallel.tensor_parallel.channel_shardings``) for backbones too
        large to replicate per chip.
    :param max_queries: per-request best-match query budget. Queries ride
        the SAME batched dispatch as the forward (one device round trip per
        coalesced batch, not per request), so the whole best_match path
        costs one upload + one tiny fetch per batch.
    """

    def __init__(self, dcn, host: str = "127.0.0.1", port: int = 0,
                 max_batch: int = 8, max_wait_ms: float = 5.0, mesh=None,
                 max_queries: int = 16):
        self._dcn = dcn
        self._H, self._W = dcn.image_shape
        self._D = dcn.descriptor_dimension
        self._Q = max(1, max_queries)
        self._mesh = mesh
        if mesh is not None:
            n = mesh.shape["data"]
            self._buckets = tuple(n * m for m in (1, 2, 4, 8, 16, 32)
                                  if n * m <= max(n, max_batch)) or (n,)
        else:
            self._buckets = tuple(b for b in (1, 2, 4, 8, 16, 32, 64, 128, 256)
                                  if b <= max(1, max_batch)) or (1,)
        # the batcher must never collect more than the largest bucket can
        # hold — a non-power-of-two max_batch would otherwise overflow the
        # padded frame array
        self._max_batch = self._buckets[-1]
        self._max_wait_s = max_wait_ms / 1000.0
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self.stats = {"requests": 0, "dispatches": 0, "frames": 0}
        self._stats_lock = threading.Lock()  # handler threads race on stats

        mean = jnp.asarray(dcn.image_mean, jnp.float32)
        std = jnp.asarray(dcn.image_std_dev, jnp.float32)
        module = dcn.module
        # checkpoint-restored variables are host numpy arrays; put them on
        # device ONCE (replicated across the mesh) so every dispatch doesn't
        # re-upload the full weight set
        var_sh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if "model" in mesh.axis_names:
                # 2-D (data, model) mesh: conv channels Megatron-column-
                # sharded over the model axis — each chip stores and
                # computes 1/n_model of every conv's output channels
                from pdc_tpu.parallel.tensor_parallel import channel_shardings

                var_sh = channel_shardings(dcn.variables, mesh, "model")
            else:
                var_sh = NamedSharding(mesh, PartitionSpec())
            self._variables = jax.device_put(dcn.variables, var_sh)
        else:
            self._variables = jax.device_put(dcn.variables)

        W = self._W

        def _fwd(variables, rgb_u8, queries, q_valid):
            # rgb_u8 [B, H, W, 3]; queries [B, Q, D]; q_valid [B, Q] bool
            x = (rgb_u8.astype(jnp.float32) / 255.0 - mean) / std
            out = module.apply(variables, x, train=False).astype(jnp.float32)
            B = out.shape[0]
            flat = out.reshape(B, -1, out.shape[-1])        # [B, HW, D]
            rnorm = jnp.sum(jnp.square(flat), axis=-1)      # [B, HW]
            cross = jnp.einsum("bnd,bqd->bnq", flat, queries,
                               preferred_element_type=jnp.float32)
            d2 = (rnorm[:, :, None] - 2.0 * cross
                  + jnp.sum(jnp.square(queries), axis=-1)[:, None, :])
            idx = jnp.argmin(d2, axis=1)                    # [B, Q]
            dist = jnp.sqrt(jnp.maximum(
                jnp.take_along_axis(d2, idx[:, None, :], axis=1)[:, 0, :],
                0.0))
            uv = jnp.stack([idx % W, idx // W], axis=-1).astype(jnp.int32)
            return out, uv, jnp.where(q_valid, dist, jnp.inf)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data = NamedSharding(mesh, P("data"))
            forward = jax.jit(_fwd, in_shardings=(var_sh, data, data, data),
                              out_shardings=(data, data, data))
        else:
            forward = jax.jit(_fwd)

        self._forward = forward

        self._stop = threading.Event()
        self._batcher = threading.Thread(target=self._batch_loop,
                                         name="pdc-serve-batcher", daemon=True)

        server_self = self

        class _Handler(socketserver.StreamRequestHandler):
            def handle(self):
                server_self._handle_connection(self.rfile, self.wfile)

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True
            # many clients connect at once (one per camera stream / worker);
            # the default backlog of 5 drops concurrent connects
            request_queue_size = 256

        self._tcp = _Server((host, port), _Handler)
        self.address = self._tcp.server_address  # (host, real_port)

    # -- lifecycle -----------------------------------------------------------

    def warmup(self):
        """Compile the forward for every bucket (first 640x480 compiles are
        minutes through the axon tunnel — do them before accepting load),
        plus every power-of-two descriptor-gather shape each bucket can
        produce (see _run_batch)."""
        for b in self._buckets:
            z = jnp.zeros((b, self._H, self._W, 3), jnp.uint8)
            q = jnp.zeros((b, self._Q, self._D), jnp.float32)
            v = jnp.zeros((b, self._Q), bool)
            out, _, _ = self._forward(self._variables, z, q, v)
            jax.block_until_ready(out)
            m = 1
            while m <= b:
                jax.block_until_ready(out[jnp.zeros((m,), jnp.int32)])
                m <<= 1
            if b & (b - 1):
                # non-power-of-two bucket (mesh-sharded buckets are n*m with
                # n = data-axis size): _run_batch clamps its pad to the full
                # bucket, so prime THAT shape too — otherwise a seconds-long
                # remote compile lands on a live request batch
                jax.block_until_ready(out[jnp.zeros((b,), jnp.int32)])

    def serve_forever(self):
        self._batcher.start()
        try:
            self._tcp.serve_forever(poll_interval=0.1)
        finally:
            self._stop.set()

    def start(self):
        """Non-blocking start (tests / embedding)."""
        self._batcher.start()
        t = threading.Thread(target=self._tcp.serve_forever,
                             kwargs={"poll_interval": 0.05}, daemon=True)
        t.start()

    def shutdown(self):
        self._stop.set()
        self._tcp.shutdown()
        self._tcp.server_close()
        # fail any requests the batcher will never drain so their handler
        # threads (and remote clients) unblock immediately
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            req.error = "server shut down"
            req.event.set()

    # -- batching core -------------------------------------------------------

    def _batch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self._max_wait_s
            while len(batch) < self._max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            self._run_batch(batch)

    def _run_batch(self, batch):
        n = len(batch)
        b = _bucket(n, self._buckets)
        frames = np.zeros((b, self._H, self._W, 3), np.uint8)
        queries = np.zeros((b, self._Q, self._D), np.float32)
        valid = np.zeros((b, self._Q), bool)
        for i, req in enumerate(batch):
            frames[i] = req.rgb
            if req.queries is not None:
                q = req.queries.shape[0]
                queries[i, :q] = req.queries
                valid[i, :q] = True
        try:
            # One dispatch serves the whole batch: forward AND every
            # request's best-match queries. The descriptor images stay ON
            # DEVICE unless a request needs them, and the slices that ARE
            # needed come back as ONE gathered transfer per batch (a
            # per-request fetch costs a full device round trip each through
            # a tunnel/thin link); uv/dist likewise arrive in one small
            # fetch — so best_match traffic costs one upload + bytes back
            # per BATCH, never a per-request device round trip.
            out, uv, dist = self._forward(
                self._variables, jnp.asarray(frames),
                jnp.asarray(queries), jnp.asarray(valid))
            need = [i for i, r in enumerate(batch) if r.queries is None]
            if need:
                # pad the gather to a power-of-two length: every distinct
                # index-vector SHAPE is a separate compiled program, and
                # compiles through a remote runtime cost seconds — pow2
                # padding caps the shape set at log2(bucket) per bucket
                # (primed in warmup), at <=2x fetched rows
                m = 1
                while m < len(need):
                    m <<= 1
                # clamp to the bucket: for non-pow2 buckets the next power
                # of two can exceed b, which is a shape warmup never primed;
                # the full-bucket gather is always valid and always primed
                m = min(m, b)
                idx = (need + [need[0]] * (m - len(need)))[:m]
                desc_h = np.asarray(out[jnp.asarray(idx, jnp.int32)])
            else:
                desc_h = None
            desc_pos = {i: k for k, i in enumerate(need)}
            uv_h = np.asarray(uv) if valid.any() else None
            dist_h = np.asarray(dist) if valid.any() else None
            with self._stats_lock:
                self.stats["dispatches"] += 1
                self.stats["frames"] += n
            for i, req in enumerate(batch):
                req.result = (
                    desc_h[desc_pos[i]] if i in desc_pos else None,
                    None if uv_h is None else uv_h[i],
                    None if dist_h is None else dist_h[i])
                req.event.set()
        except Exception as e:  # surface device errors to every waiter
            for req in batch:
                req.error = f"{type(e).__name__}: {e}"
                req.event.set()

    def _submit(self, rgb: np.ndarray, queries=None):
        """:return: (descriptors [H, W, D] np or None, uv [Qmax, 2],
        dist [Qmax])"""
        req = _Request(rgb, queries)
        self._queue.put(req)
        req.event.wait()
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.result

    # -- protocol ------------------------------------------------------------

    def _handle_connection(self, rfile, wfile):
        while not self._stop.is_set():
            line = rfile.readline()
            if not line:
                return
            try:
                header = json.loads(line)
            except ValueError:
                self._send(wfile, {"ok": False, "error": "bad JSON header"})
                return
            try:
                self._handle_request(header, rfile, wfile)
            except (BrokenPipeError, ConnectionResetError):
                return
            except _DesyncError as e:
                self._send(wfile, {"ok": False, "error": str(e)})
                return
            except Exception as e:
                self._send(wfile, {"ok": False,
                                   "error": f"{type(e).__name__}: {e}"})

    _MAX_PAYLOAD = 64 << 20

    def _read_frame(self, header, rfile) -> np.ndarray:
        shape = header.get("shape")
        encoding = header.get("encoding", "raw")
        # exact-width Python-int product — np.prod would wrap at int64 and a
        # huge declared shape could slip a negative length past the cap
        if (not isinstance(shape, list) or len(shape) != 3
                or not all(isinstance(x, int) and 0 < x <= self._MAX_PAYLOAD
                           for x in shape)
                or math.prod(shape) > self._MAX_PAYLOAD):
            # can't trust the declared length -> the stream is desynced;
            # _DesyncError closes the connection after the error response
            raise _DesyncError(f"bad shape: {shape!r}")
        if encoding not in ("raw", "jpeg", "png"):
            raise _DesyncError(f"bad encoding: {encoding!r}")
        if encoding == "raw":
            nbytes = math.prod(shape)
        else:
            nbytes = header.get("payload_len")
            if (not isinstance(nbytes, int)
                    or not 0 < nbytes <= self._MAX_PAYLOAD):
                raise _DesyncError(f"bad payload_len: {nbytes!r}")
        # drain the declared payload FIRST so the connection stays usable
        # even when validation below rejects the request
        payload = rfile.read(nbytes)
        if len(payload) != nbytes:
            raise _DesyncError("truncated payload")
        expect = [self._H, self._W, 3]
        if shape != expect:
            raise ValueError(f"shape {shape} != served {expect}")
        if encoding == "raw":
            return np.frombuffer(payload, np.uint8).reshape(shape)
        # bound the DECODED size before decoding: a kilobyte-scale crafted
        # PNG can declare gigapixel dims and cv2.imdecode would allocate
        # them — parse the header dims and require the served H x W
        dims = encoded_image_dims(payload)
        if dims != (self._H, self._W):
            raise ValueError(
                f"{encoding} header dims {dims} != served "
                f"({self._H}, {self._W})")
        rgb = decode_frame(payload, encoding)
        if list(rgb.shape) != expect:
            raise ValueError(
                f"decoded {encoding} shape {list(rgb.shape)} != {expect}")
        return rgb

    def _handle_request(self, header, rfile, wfile):
        op = header.get("op")
        with self._stats_lock:
            self.stats["requests"] += 1
        if op == "ping":
            self._send(wfile, {"ok": True})
        elif op == "info":
            self._send(wfile, {
                "ok": True, "height": self._H, "width": self._W,
                "descriptor_dimension": self._D,
                "max_batch": self._max_batch, "max_queries": self._Q,
                "stats": dict(self.stats),
            })
        elif op == "descriptors":
            rgb = self._read_frame(header, rfile)
            rdtype = header.get("response_dtype", "float32")
            if rdtype not in ("float32", "float16"):
                raise ValueError(f"bad response_dtype: {rdtype!r}")
            res, _, _ = self._submit(rgb)
            wire = res.astype("<f2" if rdtype == "float16" else "<f4")
            self._send(wfile, {"ok": True, "shape": list(res.shape),
                               "dtype": rdtype}, wire.tobytes())
        elif op == "best_match":
            rgb = self._read_frame(header, rfile)  # drains payload first
            queries = np.asarray(header.get("queries", []), np.float32)
            if queries.ndim != 2 or queries.shape[1] != self._D:
                raise ValueError(f"queries must be [Q, {self._D}]")
            q = queries.shape[0]
            if q > self._Q:
                raise ValueError(
                    f"too many queries: {q} > max_queries {self._Q}")
            _, uv, dist = self._submit(rgb, queries)
            uv, dist = uv[:q], dist[:q]
            self._send(wfile, {"ok": True, "num_queries": q,
                               "dtype": "int32+float32"},
                       uv.astype("<i4").tobytes() + dist.astype("<f4").tobytes())
        else:
            raise ValueError(f"unknown op: {op!r}")

    @staticmethod
    def _send(wfile, header: dict, payload: bytes = b""):
        wfile.write(json.dumps(header).encode() + b"\n" + payload)
        wfile.flush()


class DescriptorClient:
    """Blocking client for :class:`DescriptorServer` (one socket, reusable
    across requests; thread-safe per-instance via an internal lock)."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._rfile = self._sock.makefile("rb")
        self._lock = threading.Lock()

    def close(self):
        self._rfile.close()
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _roundtrip(self, header: dict, payload: bytes = b"") -> dict:
        with self._lock:
            self._sock.sendall(json.dumps(header).encode() + b"\n" + payload)
            line = self._rfile.readline()
            if not line:
                raise ConnectionError("server closed connection")
            resp = json.loads(line)
            if not resp.get("ok"):
                raise RuntimeError(resp.get("error", "server error"))
            resp["_payload"] = b""
            nbytes = self._payload_len(resp)
            if nbytes:
                data = self._rfile.read(nbytes)
                if len(data) != nbytes:
                    raise ConnectionError("truncated response")
                resp["_payload"] = data
            return resp

    @staticmethod
    def _payload_len(resp: dict) -> int:
        if "shape" in resp:
            itemsize = 2 if resp.get("dtype") == "float16" else 4
            return int(np.prod(resp["shape"])) * itemsize
        if "num_queries" in resp:
            return int(resp["num_queries"]) * (2 * 4 + 4)
        return 0

    @staticmethod
    def _frame_payload(rgb_u8, encoding, quality):
        header = {"shape": list(rgb_u8.shape)}
        if encoding in (None, "raw"):
            return header, rgb_u8.tobytes()
        payload = encode_frame(rgb_u8, encoding, quality)
        header["encoding"] = encoding
        header["payload_len"] = len(payload)
        return header, payload

    def ping(self) -> bool:
        return bool(self._roundtrip({"op": "ping"}).get("ok"))

    def info(self) -> dict:
        r = self._roundtrip({"op": "info"})
        r.pop("_payload", None)
        return r

    def descriptors(self, rgb_u8: np.ndarray, encoding: str = None,
                    quality: int = 90,
                    response_dtype: str = "float32") -> np.ndarray:
        """uint8 RGB [H, W, 3] -> descriptor image [H, W, D].

        :param encoding: None/"raw" (uint8 upload) | "jpeg" | "png" —
            compressed upload, ~10-20x less uplink traffic (jpeg is lossy;
            descriptors shift accordingly)
        :param response_dtype: "float32" | "float16" (halves the downlink;
            ~3 decimal digits, plenty for descriptor-space distances)
        """
        rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
        header, payload = self._frame_payload(rgb_u8, encoding, quality)
        header["op"] = "descriptors"
        if response_dtype != "float32":
            header["response_dtype"] = response_dtype
        r = self._roundtrip(header, payload)
        wire = "<f2" if r.get("dtype") == "float16" else "<f4"
        return np.frombuffer(r["_payload"], wire).reshape(r["shape"])

    def best_match(self, rgb_u8: np.ndarray, queries: np.ndarray,
                   encoding: str = None, quality: int = 90):
        """:return: (uv [Q, 2] int32, dist [Q] float32) best matches of each
        query descriptor in the frame's descriptor image. ``encoding`` as
        in :meth:`descriptors` — with compressed upload the whole op is a
        few-dozen-KB round trip."""
        rgb_u8 = np.ascontiguousarray(rgb_u8, np.uint8)
        queries = np.asarray(queries, np.float32)
        header, payload = self._frame_payload(rgb_u8, encoding, quality)
        header["op"] = "best_match"
        header["queries"] = queries.tolist()
        r = self._roundtrip(header, payload)
        q = r["num_queries"]
        raw = r["_payload"]
        uv = np.frombuffer(raw[:q * 8], "<i4").reshape(q, 2)
        dist = np.frombuffer(raw[q * 8:], "<f4")
        return uv, dist


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m pdc_tpu serve",
        description="descriptor serving daemon (microbatched TCP server)")
    p.add_argument("--model_folder", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7863)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--max_queries", type=int, default=16,
                   help="per-request best-match query budget")
    p.add_argument("--int8", action="store_true",
                   help="int8 PTQ serving forward (dynamic scales)")
    p.add_argument("--int8_static", action="store_true",
                   help="int8 with static calibrated scales (fastest; "
                        "calibrates on the training dataset's first frames)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each coalesced batch over ALL local chips "
                        "(jax.sharding data-axis mesh); one daemon "
                        "saturates the slice")
    p.add_argument("--model_parallel", type=int, default=0, metavar="N",
                   help="also shard conv channels over an N-way model axis "
                        "(2-D data x model mesh; N must divide the chip "
                        "count) — for backbones too large per chip")
    p.add_argument("--iteration", type=int, default=None)
    args = p.parse_args(argv)

    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork
    from pdc_tpu.utils.compilation_cache import enable

    enable()
    dcn = DenseCorrespondenceNetwork.from_model_folder(
        args.model_folder, iteration=args.iteration)
    if args.int8_static:
        dataset = dcn.load_training_dataset()
        first = next(iter(dataset.scenes.values()))
        dcn = dcn.calibrate_quantization(list(first.rgb[:16]))
    elif args.int8:
        dcn = dcn.quantized()

    mesh = None
    if args.model_parallel:
        import jax

        from pdc_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        m = args.model_parallel
        if n_dev % m:
            raise SystemExit(
                f"--model_parallel {m} does not divide {n_dev} devices")
        mesh = make_mesh(("data", "model"), shape=(n_dev // m, m))
    elif args.data_parallel:
        from pdc_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(("data",))
    server = DescriptorServer(dcn, host=args.host, port=args.port,
                              max_batch=args.max_batch,
                              max_wait_ms=args.max_wait_ms, mesh=mesh,
                              max_queries=args.max_queries)
    print(f"compiling {len(server._buckets)} batch buckets...", flush=True)
    server.warmup()
    host, port = server.address
    print(f"serving {args.model_folder} on {host}:{port} "
          f"(max_batch={args.max_batch})", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
