"""ctypes binding for the native (C++/libpng) host data loader.

The pool decodes a whole scene/batch of PNGs in parallel directly into numpy
buffers — the C++ replacement for the reference's PIL-in-DataLoader-worker
decode path, sized for TPU feed rates (see ``native/pdc_loader.cpp``).

Falls back to PIL transparently when the shared library hasn't been built
(``make -C native``); :func:`ensure_built` attempts the build once.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Sequence, Tuple

import numpy as np

KIND_RGB8 = 0
KIND_GRAY16 = 1
KIND_MASK8 = 2
# encoder counterparts (write instead of read)
KIND_ENC_RGB8 = 3
KIND_ENC_GRAY16 = 4
KIND_ENC_GRAY8 = 5

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libpdc_loader.so")

_lib = None
_lib_lock = threading.Lock()


def ensure_built(quiet: bool = True) -> bool:
    """Build the shared library if missing. Returns availability."""
    if os.path.exists(_SO_PATH):
        return True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
    except Exception:
        return False
    return os.path.exists(_SO_PATH)


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not ensure_built():
            return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.loader_init.argtypes = [ctypes.c_int]
        lib.decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.decode_batch.restype = ctypes.c_int
        if hasattr(lib, "encode_batch"):  # older .so builds lack encoders
            lib.encode_batch.argtypes = lib.decode_batch.argtypes
            lib.encode_batch.restype = ctypes.c_int
        lib.loader_init(max(os.cpu_count() or 4, 4))
        _lib = lib
        return _lib


def available() -> bool:
    return _load_lib() is not None


def decode_batch(items: Sequence[Tuple[str, int, np.ndarray]],
                 height: int, width: int) -> None:
    """Decode ``(path, kind, out_array)`` triples in parallel, in place.

    out arrays must be C-contiguous with the matching dtype:
    rgb8 -> uint8 [H, W, 3]; gray16 -> uint16 [H, W]; mask8 -> uint8 [H, W].
    Raises on any decode failure.
    """
    lib = _load_lib()
    if lib is None:
        _decode_batch_pil(items)
        return

    n = len(items)
    paths = (ctypes.c_char_p * n)(*[p.encode() for p, _, _ in items])
    kinds = (ctypes.c_int * n)(*[k for _, k, _ in items])
    outs = (ctypes.c_void_p * n)()
    for i, (_, kind, arr) in enumerate(items):
        assert arr.flags["C_CONTIGUOUS"]
        if kind == KIND_RGB8:
            assert arr.dtype == np.uint8 and arr.shape == (height, width, 3)
        elif kind == KIND_GRAY16:
            assert arr.dtype == np.uint16 and arr.shape == (height, width)
        else:
            assert arr.dtype == np.uint8 and arr.shape == (height, width)
        outs[i] = arr.ctypes.data_as(ctypes.c_void_p).value
    rc = lib.decode_batch(paths, kinds, outs, n, height, width)
    if rc != 0:
        raise RuntimeError(f"native decode_batch failed with code {rc}")


def _decode_batch_pil(items):
    from PIL import Image

    for path, kind, arr in items:
        img = Image.open(path)
        if kind == KIND_RGB8:
            arr[...] = np.asarray(img.convert("RGB"))
        elif kind == KIND_GRAY16:
            arr[...] = np.asarray(img).astype(np.uint16)
        else:
            arr[...] = (np.asarray(img) > 0).astype(np.uint8)


def encode_batch(items: Sequence[Tuple[str, int, np.ndarray]],
                 height: int, width: int) -> None:
    """Write ``(path, kind, array)`` triples in parallel (the encoder
    counterpart of :func:`decode_batch` — the preprocessing pipeline writes
    hundreds of mask/depth PNGs per log). Kinds: ``KIND_ENC_RGB8`` (uint8
    [H,W,3]), ``KIND_ENC_GRAY16`` (uint16 [H,W]), ``KIND_ENC_GRAY8`` (uint8
    [H,W]). PIL fallback when the library is unavailable."""
    lib = _load_lib()
    if lib is None or not hasattr(lib, "encode_batch"):
        _encode_batch_pil(items)
        return

    n = len(items)
    arrs = [np.ascontiguousarray(a) for _, _, a in items]
    paths = (ctypes.c_char_p * n)(*[p.encode() for p, _, _ in items])
    kinds = (ctypes.c_int * n)(*[k for _, k, _ in items])
    ins = (ctypes.c_void_p * n)()
    for i, ((_, kind, _), arr) in enumerate(zip(items, arrs)):
        if kind == KIND_ENC_RGB8:
            assert arr.dtype == np.uint8 and arr.shape == (height, width, 3)
        elif kind == KIND_ENC_GRAY16:
            assert arr.dtype == np.uint16 and arr.shape == (height, width)
        else:
            assert arr.dtype == np.uint8 and arr.shape == (height, width)
        ins[i] = arr.ctypes.data_as(ctypes.c_void_p).value
    rc = lib.encode_batch(paths, kinds, ins, n, height, width)
    if rc != 0:
        raise RuntimeError(f"native encode_batch failed with code {rc}")


def _encode_batch_pil(items):
    from PIL import Image

    for path, kind, arr in items:
        if kind == KIND_ENC_GRAY16:
            # uint16 arrays map to mode I;16 without the deprecated
            # ``mode=`` override (Pillow infers it from the dtype)
            Image.fromarray(np.asarray(arr, np.uint16)).save(path)
        else:
            Image.fromarray(np.asarray(arr)).save(path)


def load_scene_frames(structure, indices: List[int], height: int, width: int):
    """Decode all frames of a scene with the native pool.

    :param structure: :class:`pdc_tpu.data.scene.SceneStructure`
    :return: (rgb [N,H,W,3] u8, depth [N,H,W] u16, mask [N,H,W] u8)
    """
    n = len(indices)
    rgb = np.empty((n, height, width, 3), np.uint8)
    depth = np.empty((n, height, width), np.uint16)
    mask = np.empty((n, height, width), np.uint8)
    items = []
    for j, i in enumerate(indices):
        items.append((structure.rgb_image_filename(i), KIND_RGB8, rgb[j]))
        items.append((structure.depth_image_filename(i), KIND_GRAY16, depth[j]))
        mf = structure.mask_image_filename(i)
        if os.path.exists(mf):
            items.append((mf, KIND_MASK8, mask[j]))
        else:
            mask[j] = 1
    decode_batch(items, height, width)
    return rgb, depth, mask


class _ProducerError:
    """Sentinel carrying a producer-thread exception through the queue."""

    def __init__(self, exc):
        self.exc = exc


class PrefetchLoader:
    """Double-buffered background batch producer.

    Wraps any zero-arg ``make_batch`` callable (e.g.
    ``lambda: dataset.make_host_batch(B)``) with a worker thread so the host
    assembles batch k+1 while the device runs step k — the TPU-side
    replacement for the reference's DataLoader worker pool
    (training.py:96-97).
    """

    def __init__(self, make_batch, depth: int = 2, to_device: bool = True):
        """:param to_device: start the host->device transfer inside the worker
        thread (``jax.device_put``), so the copy overlaps the device's
        current step instead of serializing in front of the next one."""
        import queue

        self._make_batch = make_batch
        self._to_device = to_device
        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import queue

        while not self._stop.is_set():
            try:
                batch = self._make_batch()
                if self._to_device:
                    import jax

                    batch = {k: jax.device_put(v) for k, v in batch.items()}
            except BaseException as exc:  # propagate to the consumer
                # A producer failure must surface in next(), never hang the
                # training loop: enqueue the exception itself and stop.
                item = _ProducerError(exc)
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                return
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def next(self):
        item = self._q.get()
        if isinstance(item, _ProducerError):
            self.stop()
            raise RuntimeError(
                "PrefetchLoader producer thread failed"
            ) from item.exc
        return item

    def stop(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=2)
