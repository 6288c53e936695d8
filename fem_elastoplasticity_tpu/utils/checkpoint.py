"""Checkpoint / resume of load-stepping solver state.

The reference keeps all state in memory and cannot resume an interrupted
load schedule (SURVEY.md §5: "Checkpoint / resume: None").  Here the
solver state (displacements, plastic strain, load-factor bookkeeping,
histories) round-trips through a host-side `.npz` file, so long
excavation schedules / refinement sweeps can resume after preemption.

Orbax is available in the environment for large multi-host state; for the
(MB-scale) FEM state a flat npz keeps zero dependencies on checkpoint
server processes.
"""
from __future__ import annotations

import pathlib
from typing import NamedTuple

import numpy as np


class SolverCheckpoint(NamedTuple):
    """Resumable snapshot of `solve.newton` carry state."""

    u: np.ndarray  # (2*n_n,)
    u_old: np.ndarray
    u_it: np.ndarray
    ep: np.ndarray  # (4, n_int)
    zeta_old: float
    d_zeta: float
    d_zeta_old: float
    step: int
    aux: float
    zeta_hist: np.ndarray
    monitor_hist: np.ndarray
    nits_total: int
    ncg_total: int = 0  # cumulative CG iterations (0 for dense solvers)


def save(path: str, ckpt: SolverCheckpoint) -> None:
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(p, **ckpt._asdict())


def load(path: str) -> SolverCheckpoint:
    raw = np.load(path)
    return SolverCheckpoint(
        u=raw["u"],
        u_old=raw["u_old"],
        u_it=raw["u_it"],
        ep=raw["ep"],
        zeta_old=float(raw["zeta_old"]),
        d_zeta=float(raw["d_zeta"]),
        d_zeta_old=float(raw["d_zeta_old"]),
        step=int(raw["step"]),
        aux=float(raw["aux"]),
        zeta_hist=raw["zeta_hist"],
        monitor_hist=raw["monitor_hist"],
        nits_total=int(raw["nits_total"]),
        ncg_total=int(raw["ncg_total"]) if "ncg_total" in raw else 0,
    )
