"""Checkpoint / resume.

Two layers, mirroring and extending the reference's persistence story:

1. The content-addressed whole-model gzip-pickle cache lives on the model
   classes themselves (``to_pickle``/``from_pickle``,
   reference marginalizable_mixture_model.py:227-319) — post-training only.
2. :class:`EMCheckpointer` adds *mid-training* step checkpoints (orbax) for
   long-running large-batch EM, which the reference has no equivalent of:
   parameters + assignments are saved every ``every`` EM iterations and a
   killed run resumes from the latest step.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from multimodal_trajectory_modeling_tpu.models import em

__all__ = ["EMCheckpointer", "train_em_checkpointed"]


class EMCheckpointer:
    """Orbax-backed step checkpoints of ``(MixtureParams, assignments)``."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, params: em.MixtureParams, assign) -> None:
        payload = {
            "params": {k: np.asarray(v) for k, v in params._asdict().items()},
            "assign": np.asarray(assign),
        }
        self.manager.save(
            step, args=self._ocp.args.StandardSave(payload)
        )
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, step: int = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        payload = self.manager.restore(step)
        params = em.MixtureParams(**payload["params"])
        return step, params, payload["assign"]


def train_em_checkpointed(
    params0,
    assign0,
    z,
    x,
    v,
    patterns,
    pattern_id,
    *,
    checkpointer: EMCheckpointer,
    n_steps: int = 1000,
    every: int = 10,
    resume: bool = True,
    **train_kwargs,
):
    """Run the jitted EM loop in ``every``-iteration chunks, checkpointing
    after each chunk; resumes from the latest checkpoint when present.

    Chunking is exact: the M step is a deterministic function of the
    assignment, so restarting a chunk from ``(params, assign)`` reproduces
    the uninterrupted trajectory.
    """
    start_iter = 0
    params, assign = params0, assign0
    if resume and (state := checkpointer.restore()) is not None:
        start_iter, params, assign = state
        import jax.numpy as jnp

        params = jax.tree.map(jnp.asarray, params)
        assign = jnp.asarray(assign)

    done = start_iter
    status = em.STATUS_RUNNING
    while done < n_steps:
        chunk = min(every, n_steps - done)
        params, assign, iters, status = em.train_em(
            params,
            assign,
            z,
            x,
            v,
            patterns,
            pattern_id,
            n_steps=chunk,
            **train_kwargs,
        )
        done += int(iters)
        checkpointer.save(done, params, assign)
        if int(status) != em.STATUS_RUNNING:
            break
    return params, assign, done, int(status)
