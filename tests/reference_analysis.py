"""Harness for executing the reference's offline analysis scripts
VERBATIM (no source edits) on artifacts this framework produced.

The scripts at /root/reference/reduction_methods_analysis/ are
pandas-1.x era; the driver below provides exactly five pieces of
runtime scaffolding, none of which changes their computation:

- defaults for ``--iou`` / ``--use_distill`` flags that
  compare_merging_capacity.py reads (lines 37-38) but never registers
  on its parser — an AttributeError on every invocation. False is the
  only coherent default for both: use_distill=True selects only
  Distill-tagged runs, and iou=True emits extra columns no downstream
  consumer (collate_capacity_data.py:38) ever reads;

- a ``DataFrame.append`` shim (removed in pandas 2.0) implemented with
  pd.concat, the documented migration;
- a ``pyemd`` module shim (the wheel is absent in this environment):
  ``emd_with_flow`` solved as the exact transportation LP with scipy's
  HiGHS — the same formulation analysis/heatmap_metrics.py falls back
  to, and exact like pyemd itself (only the optimum is consumed; the
  flow matrix is returned as None, which heatmap_metrics.EMD ignores);
- ``tags_dict`` injected into collate_models_data's module globals: the
  reference references it without ever defining it
  (collate_models_data.py:63, a genuine NameError bug) — the injected
  value is the empty column-list dict its own tag lists (lines 34-39)
  imply;
- an explicit single call to ``correlate_capacity_data()`` for
  calculate_correlation_models.py, executed under a NON-main run name:
  its ``if __name__ == '__main__'`` guard is indented inside the
  function body (line 118), so under ``__main__`` every call re-invokes
  itself until RecursionError, and under any other name the script is a
  no-op.
"""

from __future__ import annotations

import os
import subprocess
import sys

REFERENCE_DIR = "/root/reference"
ANALYSIS_DIR = os.path.join(REFERENCE_DIR, "reduction_methods_analysis")

_DRIVER = r'''
import sys, runpy
import pandas as pd

if not hasattr(pd.DataFrame, "append"):
    def _append(self, other, ignore_index=False):
        if isinstance(other, dict):
            other = pd.DataFrame([other])
        return pd.concat([self, other], ignore_index=ignore_index)
    pd.DataFrame.append = _append

try:
    import pyemd  # noqa: F401
except ImportError:
    import types
    import numpy as _np

    def _emd_with_flow(p, q, dist, extra_mass_penalty=0.0):
        from scipy.optimize import linprog
        from scipy.sparse import lil_matrix
        p = _np.asarray(p, float)
        q = _np.asarray(q, float)
        n = len(p)
        A = lil_matrix((2 * n, n * n))
        for i in range(n):
            A[i, i * n:(i + 1) * n] = 1.0
        for j in range(n):
            A[n + j, j::n] = 1.0
        res = linprog(_np.asarray(dist, float).reshape(-1),
                      A_eq=A.tocsr(), b_eq=_np.concatenate([p, q]),
                      bounds=(0, None), method="highs")
        if not res.success:
            raise RuntimeError(f"EMD LP failed: {res.message}")
        return float(res.fun), None

    _pyemd = types.ModuleType("pyemd")
    _pyemd.emd_with_flow = _emd_with_flow
    sys.modules["pyemd"] = _pyemd

import argparse
_orig_parse_args = argparse.ArgumentParser.parse_args


def _parse_args_with_missing_flags(self, *a, **k):
    ns = _orig_parse_args(self, *a, **k)
    # compare_merging_capacity.py reads these without registering them
    for flag in ("iou", "use_distill"):
        if not hasattr(ns, flag):
            setattr(ns, flag, False)
    return ns


argparse.ArgumentParser.parse_args = _parse_args_with_missing_flags

refdir, script = sys.argv[1], sys.argv[2]
sys.path.insert(0, refdir)
# what `python script.py` does and runpy.run_path does not: the
# script's own directory on sys.path, for sibling imports
# (compare_heatmaps.py:7 `import heatmap_metrics`)
import os
sys.path.insert(0, os.path.dirname(script))
sys.argv = [script] + sys.argv[3:]

init = {}
if script.endswith("collate_models_data.py"):
    corr = ["CKA", "PWCCA", "Procrustes", "mean_cca_corr",
            "mean_sq_cca_corr"]
    clus = ["Completeness", "Homogeneity", "NMI"]
    init["tags_dict"] = {
        **{f"Stage-{s}-Mean-IoU": [] for s in (3, 6, 9)},
        **{f"{t}-Stage-{s}-Mean": [] for s in (3, 6, 9) for t in clus},
        **{f"{s}-{t}": [] for s in (3, 6, 9, 11) for t in corr},
    }

if script.endswith("calculate_correlation_models.py"):
    # its __main__ guard is indented INSIDE the function body
    # (calculate_correlation_models.py:118), so executing it with
    # run_name="__main__" makes every call re-invoke itself until
    # RecursionError. Run under a non-main name (guard stays False) and
    # call the function exactly once.
    g = runpy.run_path(script, init_globals=init, run_name="__golden__")
    g["correlate_capacity_data"]()
else:
    g = runpy.run_path(script, init_globals=init, run_name="__main__")
'''


def run_reference_script(script_name: str, args: list[str],
                         timeout: int = 600) -> str:
    """Run one reference analysis script in a subprocess; returns its
    stdout. Raises on nonzero exit with full output attached."""
    script = os.path.join(ANALYSIS_DIR, script_name)
    env = dict(os.environ)
    # keep jax/TPU plugins out of the numpy-only subprocess
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, REFERENCE_DIR, script, *args],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{script_name} failed (rc={proc.returncode})\n"
            f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}")
    return proc.stdout
