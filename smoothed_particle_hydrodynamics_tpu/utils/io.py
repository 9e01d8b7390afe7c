"""Checkpoint / resume.

The reference has no state snapshots at all — a crash loses the run and every
run restarts from the seeded ICs (/root/reference/src/sph.cpp:117,365).  Here
the ``ParticleState`` pytree plus config and step counter snapshot to a single
``.npz`` every K steps, with atomic rename so a crash mid-write never corrupts
the latest checkpoint.  ``--resume`` picks up the newest snapshot.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

from ..config import SphConfig
from ..state import ParticleState

_CKPT_RE = re.compile(r"ckpt_(\d+)\.npz$")


def save_checkpoint(ckpt_dir: str, step: int, cfg: SphConfig, state: ParticleState) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.npz")
    tmp = path + ".tmp"
    arrays = state.to_numpy()
    with open(tmp, "wb") as f:
        np.savez(f, step=np.int64(step), config=np.frombuffer(
            cfg.to_json().encode(), dtype=np.uint8), **arrays)
    os.replace(tmp, path)
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def load_checkpoint(path: str) -> tuple[int, SphConfig, ParticleState]:
    with np.load(path) as d:
        step = int(d["step"])
        cfg = SphConfig.from_json(bytes(d["config"].tobytes()).decode())
        state = ParticleState.from_numpy({k: d[k] for k in d.files
                                          if k not in ("step", "config")})
    return step, cfg, state


def save_state(path: str, state: ParticleState) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **state.to_numpy())
    os.replace(tmp, path)


def config_fingerprint(cfg: SphConfig) -> str:
    import hashlib

    return hashlib.sha256(cfg.to_json().encode()).hexdigest()[:16]


def write_run_metadata(out_dir: str, cfg: SphConfig, extra: dict | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    meta = {"config": json.loads(cfg.to_json()),
            "fingerprint": config_fingerprint(cfg)}
    if extra:
        meta.update(extra)
    with open(os.path.join(out_dir, "run.json"), "w") as f:
        json.dump(meta, f, indent=2)
