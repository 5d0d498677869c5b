"""Structured JSONL metrics (SURVEY.md §5 observability).

The reference contains zero logging statements; this module emits the
per-step metrics a production sweep needs — rays/s, per-bounce live-lane
occupancy (the lockstep-waste metric), histogram energy totals, gradient
norms — as JSON lines so any downstream tooling can consume them.
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional

import numpy as np
import jax

__all__ = ["MetricsLogger", "trace_metrics"]


def trace_metrics(result) -> dict:
    """Summarize a :class:`~hare_tpu.trace.TraceResult`.

    Returns bounce occupancy (fraction of lanes still alive per bounce —
    fixed-K scan with live masks trades wasted lanes for uniformity, so this
    is THE utilization number to watch), per-bounce energy, and totals.
    """
    hit = np.asarray(result.hit)
    energy = np.asarray(result.energy)
    return {
        "bounce_occupancy": hit.mean(axis=1).round(4).tolist(),
        "bounce_energy": energy.sum(axis=1).round(4).tolist(),
        "total_energy": float(energy.sum()),
        "n_rays": int(hit.shape[1]),
        "n_bounces": int(hit.shape[0]),
    }


class MetricsLogger:
    """Append-only JSONL metrics sink.

    >>> log = MetricsLogger("metrics.jsonl")
    >>> log.write(step=0, rays_per_s=1.2e6, loss=0.5)
    """

    def __init__(self, path: Optional[str] = None, stream: Optional[IO] = None):
        if path is not None:
            self._fh = open(path, "a", buffering=1)
            self._own = True
        else:
            self._fh = stream or sys.stderr
            self._own = False
        self._t0 = time.time()

    def write(self, **fields) -> dict:
        rec = {"t": round(time.time() - self._t0, 3)}
        for k, v in fields.items():
            if hasattr(v, "tolist"):
                v = np.asarray(v)
                v = v.tolist() if v.size <= 64 else {
                    "mean": float(v.mean()),
                    "min": float(v.min()),
                    "max": float(v.max()),
                }
            rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")
        return rec

    def grad_norms(self, grads, step: int) -> dict:
        def name(p):
            return str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", p))))

        flat = {
            "/".join(name(p) for p in path): float(jax.numpy.linalg.norm(leaf))
            for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]
        }
        return self.write(step=step, grad_norms=flat)

    def close(self):
        if self._own:
            self._fh.close()
