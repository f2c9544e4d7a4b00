"""Adjudicate the n>512 multi-tile on-chip parity gap against a CPU f64
oracle.

verify_multitile_tpu.py measured kernel-vs-XLA (both f32) qoy rel errs of
2.1e-2 (n=600) / 1.8e-1 (n=768) while logdet agreed at ~1e-5.  Neither
f32 path is truth: this script recomputes the SAME Grams' quadratics in
f64 on CPU (scipy Cholesky) and reports each f32 path's error from f64,
plus the Gram condition number.  If kernel-vs-f64 ~= XLA-vs-f64, the gap
is conditioning (both f32 paths equally far from truth, in different
directions); if the kernel is an order worse, the blocked reduction is
losing accuracy and the dispatch cap must stay at 512.

Writes one line per (n, quantity). Run AFTER verify_multitile_tpu.py
(reuses its RNG construction: default_rng(0), same draw order).

Reads /tmp/multitile_qs.npz (written by dump_multitile_outputs.py on the
TPU) for the on-chip kernel/XLA values.
"""
import sys
sys.path.insert(0, "/root/repo")
import json
import os

import numpy as np
import scipy.linalg as sla

rng = np.random.default_rng(0)
SIZES = (600, 768, 1024)
JITTER = 1e-4


def make_problem(n):
    # identical construction to verify_multitile_tpu.py (same rng stream)
    x = rng.uniform(size=(n, 3)).astype(np.float32)
    grams = []
    for t in np.linspace(1.0, 12.0, 4):
        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1) * t
        grams.append(np.exp(-d2))
    grams = np.stack(grams).astype(np.float32)
    y = rng.normal(size=(n,)).astype(np.float32)
    return grams, y


def f64_quadratics(grams, y):
    """scipy f64 oracle of the same f32 inputs (jittered like the paths)."""
    out = {"logdet": [], "qyy": [], "qoy": [], "qoo": []}
    conds = []
    one = np.ones_like(y, np.float64)
    for g in grams.astype(np.float64):
        gj = g + JITTER * np.eye(g.shape[0])
        conds.append(float(np.linalg.cond(gj)))
        L = sla.cholesky(gj, lower=True)
        a = sla.solve_triangular(L, y.astype(np.float64), lower=True)
        b = sla.solve_triangular(L, one, lower=True)
        out["logdet"].append(2 * np.log(np.diag(L)).sum())
        out["qyy"].append(a @ a)
        out["qoy"].append(a @ b)
        out["qoo"].append(b @ b)
    return {k: np.asarray(v) for k, v in out.items()}, conds


PATH = "/tmp/multitile_qs.npz"
if not os.path.exists(PATH):
    sys.exit(f"{PATH} missing — run scripts/dump_multitile_outputs.py "
             "on the TPU first")
qs = np.load(PATH)

for n in SIZES:
    grams_h, y_h = make_problem(n)
    oracle, conds = f64_quadratics(grams_h, y_h)
    row = {"n": n, "cond_max": max(conds)}
    for k in oracle:
        ref = oracle[k]
        for path in ("kernel", "xla"):
            key = f"n{n}_{path}_{k}"
            if key not in qs:
                continue
            val = np.asarray(qs[key], np.float64)
            row[f"{k}_{path}_vs_f64"] = float(
                np.max(np.abs((val - ref) / np.abs(ref))))
        row[f"{k}_f64_min_abs"] = float(np.min(np.abs(ref)))
    print(json.dumps(row), flush=True)
print("DONE verify_multitile_oracle")
