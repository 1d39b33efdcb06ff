"""Training observability: per-iteration EM metrics and profiler hooks.

The reference's only progress visibility is ``verbose`` prints of the
rounded objective (marginalizable_mixture_model.py:1334-1359) and an
optional objectives array from the multi-start sweep (:1444-1470).  Here
tracing is a first-class subsystem:

- :class:`EMTrace` — per-iteration records (objective Q, switch count,
  wall time) collected by the host-stepped training loop, exportable as a
  DataFrame;
- :func:`profile` — context manager around ``jax.profiler.trace`` for
  XProf/TensorBoard captures of the device EM kernels.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import pandas as pd

__all__ = ["EMTrace", "profile"]


@dataclass
class EMTrace:
    """Per-iteration EM training metrics."""

    iterations: list = field(default_factory=list)

    def record(self, i: int, objective: float, n_switches: int, dt: float):
        self.iterations.append(
            {
                "iteration": i,
                "objective": objective,
                "n_switches": n_switches,
                "seconds": dt,
            }
        )

    def to_dataframe(self) -> pd.DataFrame:
        return pd.DataFrame(self.iterations)

    def __len__(self):
        return len(self.iterations)


@contextlib.contextmanager
def profile(logdir: str):
    """Capture a device profile of the enclosed block (XProf format).

    Usage::

        with trace.profile("/tmp/em-profile"):
            mdl.train(n_steps=10)
    """
    import jax

    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"profile captured to {logdir} ({time.perf_counter()-t0:.1f}s)")
