"""Structured per-step solver metrics / observability.

The reference logs free-form strings (`load factor = ...`, `stopping
criterion: ...`, plastic point counts — SURVEY.md §5).  Here the solver
returns dense history arrays (`LoadSteppingResult`), and this module turns
them into structured records (list of dicts / JSON lines) for logging,
dashboards or regression tracking — off the critical path, since the jitted
solver never syncs to the host mid-run.
"""
from __future__ import annotations

import json
import logging
from typing import Dict, Iterable, List

import numpy as np

log = logging.getLogger("fem_elastoplasticity_tpu")


def step_records(result, monitor_name: str = "monitor") -> List[Dict]:
    """LoadSteppingResult-like object -> one dict per accepted load step."""
    n = int(result.n_steps)
    zh = np.asarray(result.zeta_hist)
    mh = np.asarray(result.monitor_hist)
    recs = []
    for i in range(min(n, len(zh))):
        if zh[i] == 0.0 and i > 0:
            continue  # unused slot (step0 offset)
        recs.append(
            {
                "step": i,
                "zeta": float(zh[i]),
                monitor_name: float(mh[i]),
            }
        )
    return recs


def summarize(result, monitor_name: str = "monitor") -> Dict:
    """Run-level summary (counts, final state) as one dict."""
    return {
        "n_steps": int(result.n_steps),
        "n_newton_total": int(result.n_newton_total),
        "n_plastic": int(result.n_plastic),
        "zeta_final": float(np.asarray(result.zeta_hist).max()),
        f"{monitor_name}_final": float(
            np.asarray(result.monitor_hist)[int(result.n_steps) - 1]
            if int(result.n_steps) > 0
            else 0.0
        ),
    }


def log_run(result, monitor_name: str = "monitor", level=logging.INFO) -> None:
    """Emit summary + per-step records through the stdlib logger."""
    log.log(level, "run summary: %s", json.dumps(summarize(result, monitor_name)))
    for rec in step_records(result, monitor_name):
        log.log(level, "step: %s", json.dumps(rec))


def write_jsonl(path: str, records: Iterable[Dict]) -> None:
    with open(path, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
