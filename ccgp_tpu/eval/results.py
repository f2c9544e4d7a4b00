"""Result-table persistence in the reference's format.

The ground-vibrations study writes one R `write.table` file per
training-set sample with the per-test-point predictions of all three
models (`Ground Vibrations Emulator/Combined GP Ground Vibrations.R:
759-761`; archived example `Results/Size 50 Results 1.txt`). This module
writes and reads byte-compatible-in-structure tables so downstream
summaries (and the golden test) can consume either source.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

from ccgp_tpu.eval.compare import ModelPrediction, comparison_summary


GV_COLUMNS = [
    "y.hat.Combined", "Quant.Combined", "LL.Combined", "UL.Combined",
    "y.hat.single", "LL.single", "UL.single",
    "y.hat.CGP", "LL.CGP", "UL.CGP", "y.true",
]


def write_comparison_table(path: str | Path, x_test: np.ndarray,
                           x_names: list[str],
                           predictions: Dict[str, ModelPrediction],
                           y_true: np.ndarray) -> None:
    """R write.table format: quoted header, quoted 1-based row names."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    cols = {}
    for i, nm in enumerate(x_names):
        cols[nm] = np.asarray(x_test)[:, i]
    name_map = {"combined": "Combined", "single": "single", "cgp": "CGP"}
    for key, pred in predictions.items():
        suffix = name_map.get(key, key)
        cols[f"y.hat.{suffix}"] = np.asarray(pred.mean)
        if key == "combined" and pred.quant is not None:
            cols["Quant.Combined"] = np.asarray(pred.quant)
        if pred.lower is not None:
            cols[f"LL.{suffix}"] = np.asarray(pred.lower)
            cols[f"UL.{suffix}"] = np.asarray(pred.upper)
    cols["y.true"] = np.asarray(y_true)

    names = list(cols)
    with open(path, "w") as fh:
        fh.write(" ".join(f'"{n}"' for n in names) + "\n")
        n_rows = len(cols["y.true"])
        for r in range(n_rows):
            vals = " ".join(repr(float(cols[n][r])) for n in names)
            fh.write(f'"{r + 1}" {vals}\n')


def read_comparison_table(path: str | Path):
    """Read a table written by write_comparison_table (or by R) back into
    (column_names, array)."""
    with open(path) as fh:
        header = [c.strip('"') for c in fh.readline().split()]
        rows = []
        for ln in fh:
            parts = ln.split()
            rows.append([float(v) for v in parts[1:]])
    return header, np.asarray(rows)


def summary_from_table(path: str | Path):
    """Recompute the RMSPE/coverage summary from a persisted table."""
    cols, tab = read_comparison_table(path)

    def get(name):
        return tab[:, cols.index(name)]

    y = get("y.true")
    preds = {}
    if "y.hat.Combined" in cols:
        preds["combined"] = ModelPrediction(
            get("y.hat.Combined"), get("LL.Combined"), get("UL.Combined"),
            get("Quant.Combined") if "Quant.Combined" in cols else None)
    if "y.hat.single" in cols:
        preds["single"] = ModelPrediction(
            get("y.hat.single"), get("LL.single"), get("UL.single"))
    if "y.hat.CGP" in cols:
        preds["cgp"] = ModelPrediction(
            get("y.hat.CGP"), get("LL.CGP"), get("UL.CGP"))
    return comparison_summary(y, preds)
