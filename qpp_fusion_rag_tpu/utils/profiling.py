"""Profiling + structured stage timing (aux subsystem).

The reference has no tracer — only `[component]`-prefixed prints and
per-query latency fields (SURVEY §5). Here both conventions are kept and
upgraded: `StageTimer` collects structured per-stage records (optionally
appended to a JSONL file), and `device_trace` wraps `jax.profiler.trace`
for real TPU traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, List, Optional


@dataclass
class StageRecord:
    stage: str
    seconds: float
    items: Optional[int] = None
    meta: Dict = field(default_factory=dict)

    @property
    def per_second(self) -> Optional[float]:
        return self.items / self.seconds if self.items and self.seconds > 0 else None


class StageTimer:
    """Collects named stage timings; prints `[stage] ...` lines like the
    reference pipeline and can persist JSONL records."""

    def __init__(self, jsonl_path: Optional[Path] = None, verbose: bool = True):
        self.records: List[StageRecord] = []
        self.jsonl_path = Path(jsonl_path) if jsonl_path else None
        self.verbose = verbose

    @contextlib.contextmanager
    def stage(self, name: str, items: Optional[int] = None, **meta) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            rec = StageRecord(name, dt, items=items, meta=meta)
            self.records.append(rec)
            if self.verbose:
                rate = f" ({rec.per_second:.1f}/s)" if rec.per_second else ""
                print(f"[{name}] {dt:.3f}s{rate}")
            if self.jsonl_path:
                self.jsonl_path.parent.mkdir(parents=True, exist_ok=True)
                with open(self.jsonl_path, "a") as f:
                    f.write(json.dumps({
                        "stage": name, "seconds": dt, "items": items,
                        "ts": time.time(), **meta,
                    }) + "\n")

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for r in self.records:
            out[r.stage] = out.get(r.stage, 0.0) + r.seconds
        return out


@contextlib.contextmanager
def device_trace(log_dir, enabled: bool = True) -> Iterator[None]:
    """Capture a JAX/XLA device trace (TensorBoard 'profile' plugin format).

    Usage:
        with device_trace("cache/trace"):
            run_pipeline_step()
    """
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, sync_result: bool = True, **kw):
    """Time one call with a device sync (for async dispatch backends the
    host must observe completion). Syncs EVERY device leaf in the result —
    a non-array first leaf or a second independent dispatch must not make
    the measurement exclude in-flight device work — without copying any
    array to the host."""
    import jax

    import numpy as np

    t0 = time.perf_counter()
    out = fn(*args, **kw)
    if sync_result:
        jax.block_until_ready(out)  # no-op for non-array leaves
        # Tunnel backends (axon) may return from block_until_ready before
        # remote execution finishes; a 1-element host readback is the only
        # reliable barrier there (and costs one RTT, not an array copy).
        # EVERY array leaf: independent dispatches each need their own
        # barrier (breaking after the first leaf would let a second
        # in-flight program escape the measurement)
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "block_until_ready") and getattr(leaf, "size", 0):
                np.asarray(leaf.ravel()[:1])
    return out, time.perf_counter() - t0
