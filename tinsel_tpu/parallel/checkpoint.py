"""Checkpoint / resume for progressive renders.

The reference has no render-state checkpointing (SURVEY §5); progressive
accumulation makes it natural: render state is exactly (accumulation RGBA
buffer, spp count, RNG seed). Saving that tuple lets a batch render resume
after preemption — the fault-tolerance story for long multi-host renders.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_checkpoint(path: str, accum, spp_done: int, seed: int, meta: dict | None = None):
    tmp = path + ".tmp"
    np.savez_compressed(
        tmp if tmp.endswith(".npz") else tmp,
        accum=np.asarray(accum, np.float32),
        spp_done=np.int64(spp_done),
        seed=np.int64(seed),
        meta=json.dumps(meta or {}),
    )
    # np.savez appends .npz if missing
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


def load_checkpoint(path: str):
    """Returns (accum ndarray, spp_done, seed, meta dict)."""
    z = np.load(path, allow_pickle=False)
    return (
        z["accum"],
        int(z["spp_done"]),
        int(z["seed"]),
        json.loads(str(z["meta"])),
    )
