"""Minimal online scoring service.

The reference's serving side consumes named output tensors from the exported
dense graph (SURVEY §1 L6).  This module closes the loop as a runnable
service: load a ModelBundle + checkpoint, accept JSON rows of RAW feasigns
(the wire format the reference's samples carry), hash/pad on host, run the
jitted predict step, return the named scores.

    python -m recommendsystem_tpu.serving.server \
        --model finish --checkpoint /ckpt/ckpt --port 8000

    POST /score  {"rows": [{"3000": [123456789], ...}, ...]}
    ->           {"scores": {"<task>": [..]}, "batch": N}

Requests are padded to the compiled batch size (fixed shapes on TPU); the
stdlib HTTP server keeps the dependency surface zero — swap in any ASGI
front at deployment, the ``ScoringService`` API is the contract.
"""

from __future__ import annotations

import argparse
import json
import logging
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import jax
import numpy as np

from ..embedding.engine import IdBatch
from ..models import create_model
from ..models.base import ModelBundle
from ..train.checkpoint import restore_checkpoint
from ..train.state import TrainState, create_train_state
from ..train.step import make_predict_step

log = logging.getLogger("recommendsystem_tpu.serving")


class ScoringService:
    """Requests pad to the smallest compiled batch bucket (powers of two up
    to ``max_batch``) — small requests don't pay full-batch latency, and the
    jit cache holds one executable per bucket."""

    def __init__(self, bundle: ModelBundle, state: TrainState,
                 max_batch: int = 256, ids_per_feature: int = 5,
                 min_bucket: int = 8):
        self.bundle = bundle
        self.state = state
        self.max_batch = max_batch
        self.ids_per_feature = ids_per_feature
        self.buckets = []
        b = min_bucket
        while b < max_batch:
            self.buckets.append(b)
            b *= 2
        self.buckets.append(max_batch)
        self._predict = make_predict_step(bundle)

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"batch {n} exceeds max_batch {self.max_batch}")

    def _make_batch(self, rows: List[Dict[str, List[int]]],
                    bucket: int) -> Dict[str, IdBatch]:
        from ..data.parse import pad_ids
        batch = {}
        for key, col in self.bundle.embedding.columns.items():
            fkey = col.categorical_column.key
            values = [r.get(fkey, []) for r in rows]
            values += [[]] * (bucket - len(values))
            max_len = col.seq_max_len if col.is_sequence else self.ids_per_feature
            # never silently truncate a request: an over-wide row would lose
            # ids and return a plausible-but-wrong score
            for i, v in enumerate(values):
                if len(v) > max_len:
                    raise ValueError(
                        f"row {i}: feature {fkey!r} has {len(v)} ids, compiled "
                        f"width is {max_len} (split the request or raise "
                        f"ids_per_feature/seq_max_len)")
            batch[key] = pad_ids(values, max_len, col.categorical_column.hash_ids)
        # defends the promise_in_bounds gather contract against a
        # hash_ids/bucket mismatch: corrupt ids fail loudly here instead of
        # reading undefined table rows (host numpy max — negligible per req)
        from ..embedding.engine import validate_batch
        validate_batch(self.bundle.embedding, batch)
        return batch

    def warmup(self) -> None:
        """Pre-compile every batch-bucket executable so the first real
        request never pays an XLA compile (fresh-server P99)."""
        import time
        for b in self.buckets:
            t0 = time.perf_counter()
            self.score([{} for _ in range(b)])
            log.info("warmed bucket %d in %.1fs", b, time.perf_counter() - t0)

    def score(self, rows: List[Dict[str, List[int]]],
              dense: Optional[Dict[str, List[float]]] = None
              ) -> Dict[str, List[float]]:
        if not rows:
            return {}
        bucket = self._bucket_for(len(rows))
        batch = self._make_batch(rows, bucket)
        dense_inputs = None
        if self.bundle.dense_input_keys:
            dense_inputs = {}
            for k in self.bundle.dense_input_keys:
                col = [(d or {}).get(k, 0.0) for d in (dense or [{}] * len(rows))]
                col += [0.0] * (bucket - len(col))
                dense_inputs[k] = np.asarray(col, np.float32).reshape(-1, 1)
        out = jax.device_get(self._predict(self.state, batch, dense_inputs))
        n = len(rows)
        return {task: np.asarray(v)[:n].reshape(n, -1)[:, 0].tolist()
                for task, v in out.items()}


def _make_handler(service: ScoringService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            log.debug(fmt, *args)

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "model": service.bundle.name,
                                  "step": int(service.state.step)})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/score":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                rows = req.get("rows", [])
                scores = service.score(rows, req.get("dense"))
                self._reply(200, {"scores": scores, "batch": len(rows)})
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:   # malformed payloads must not kill serving
                log.exception("score failed")
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(service: ScoringService, port: int = 8000, host: str = "127.0.0.1"):
    httpd = ThreadingHTTPServer((host, port), _make_handler(service))
    log.info("scoring %s on %s:%d", service.bundle.name, host, port)
    return httpd


def main(argv=None):
    ap = argparse.ArgumentParser(description="online scoring service")
    ap.add_argument("--model", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--bucket-size", type=int, default=None)
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-batch", type=int, default=256)
    ap.add_argument("--table-dtype", choices=["fp32", "bf16", "auto"],
                    default="fp32")
    ap.add_argument("--compute-dtype", choices=["fp32", "bf16"],
                    default="fp32")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, force=True)
    import jax.numpy as jnp
    kwargs = {}
    if args.bucket_size:
        kwargs["bucket_size"] = args.bucket_size
    if args.table_dtype != "fp32":
        kwargs["table_dtype"] = ("auto" if args.table_dtype == "auto"
                                 else jnp.bfloat16)
    if args.compute_dtype == "bf16":
        kwargs["compute_dtype"] = jnp.bfloat16
    bundle = create_model(args.model, **kwargs)

    from ..data import synthetic_batch
    batch, dense, _, _ = synthetic_batch(bundle, args.max_batch, seed=0)
    state = create_train_state(bundle, jax.random.PRNGKey(0), batch, dense)
    if args.checkpoint:
        state = restore_checkpoint(args.checkpoint, state)
        log.info("restored checkpoint at step %d", int(state.step))

    service = ScoringService(bundle, state, max_batch=args.max_batch)
    service.warmup()
    serve(service, port=args.port).serve_forever()


if __name__ == "__main__":
    main()
