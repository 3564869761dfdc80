"""TPU probe: serving-daemon throughput (pdc_tpu/apps/serve.py).

End-to-end over the REAL wire path — many concurrent clients hitting the
TCP server over localhost, server coalescing requests into batched device
dispatches — for both ops:

- ``descriptors``: full [480, 640, D] float32 descriptor image returned
  per frame (3.7 MB/response at D=3 — response serialization is part of
  the cost; this is the compute_descriptor_images serving shape).
- ``best_match``: Q=16 grasp-point queries per frame, 192-byte responses
  (the robot-controller shape).

The axon tunnel charges ~0.3 s per dispatch round trip, so daemon
throughput here is a LOWER bound — a real TPU host pays microseconds per
dispatch. bf16 vs int8-static compared on the committed trained model.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python tools/tpu_probe_serve.py
"""

import json
import sys
import threading
import time

import numpy as np


def blast(server, frames, op, queries, num_clients, per_client,
          encoding=None, response_dtype="float32"):
    from pdc_tpu.apps.serve import DescriptorClient

    host, port = server.address
    errs = []
    done = [0] * num_clients

    def worker(ci):
        try:
            with DescriptorClient(host, port) as c:
                for j in range(per_client):
                    f = frames[(ci * per_client + j) % len(frames)]
                    if op == "descriptors":
                        c.descriptors(f, encoding=encoding,
                                      response_dtype=response_dtype)
                    else:
                        c.best_match(f, queries, encoding=encoding)
                    done[ci] += 1
        except Exception as e:  # pragma: no cover
            errs.append(f"client {ci}: {e}")

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(num_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    if errs:
        raise RuntimeError(errs[:3])
    total = sum(done)
    return total / dt, dt, total


def main():
    import jax

    from pdc_tpu.apps.serve import DescriptorServer
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork
    from pdc_tpu.utils.compilation_cache import enable

    enable()
    assert jax.devices()[0].platform == "tpu"
    folder = "trained_models/tpu_journey"
    dcn_f = DenseCorrespondenceNetwork.from_model_folder(folder)
    H, W = dcn_f.image_shape
    D = dcn_f.descriptor_dimension
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, size=(H, W, 3), dtype=np.uint8)
              for _ in range(8)]
    queries = rng.rand(16, D).astype(np.float32)

    results = {}
    for mode in ("bf16", "int8_static"):
        dcn = dcn_f if mode == "bf16" else dcn_f.calibrate_quantization(
            frames[:4], batch_size=4)
        server = DescriptorServer(dcn, port=0, max_batch=64, max_wait_ms=25.0)
        print(f"[{mode}] warming up (compiling buckets)...", flush=True)
        t0 = time.perf_counter()
        server.warmup()
        print(f"[{mode}] warmup {time.perf_counter()-t0:.1f}s", flush=True)
        server.start()
        try:
            # small priming pass so steady-state timing excludes first-touch
            blast(server, frames, "best_match", queries, 8, 2)
            # wire variants (round 4): jpeg upload shrinks the 0.92 MB
            # frame to tens of KB (best_match becomes RTT-bound, not
            # upload-bound); f16 response halves the descriptors downlink
            for op, clients, per, enc, rdt in (
                    ("best_match", 64, 8, None, "float32"),
                    ("best_match", 64, 8, "jpeg", "float32"),
                    ("descriptors", 32, 4, None, "float32"),
                    ("descriptors", 32, 4, "jpeg", "float16")):
                rate, dt, total = blast(server, frames, op, queries,
                                        clients, per, encoding=enc,
                                        response_dtype=rdt)
                d = server.stats["dispatches"]
                tag = f"{mode}_{op}" + (f"_{enc}" if enc else "")
                if rdt != "float32":
                    tag += f"_{rdt}"
                results[tag] = {
                    "frames_per_sec": round(rate, 1),
                    "total_frames": total, "wall_s": round(dt, 2),
                    "clients": clients,
                }
                print(f"[{mode}] {op} enc={enc} rdt={rdt}: {rate:.1f} "
                      f"frames/s ({total} frames, {clients} clients, "
                      f"{dt:.2f}s, {d} cumulative dispatches)", flush=True)
        finally:
            server.shutdown()

    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
