"""Per-shape conv3x3 implementation autotuning.

The TPU-native analog of cuDNN's algorithm picker (the reference leans on
torch/cuDNN heuristics implicitly; here the choice XLA-conv vs Pallas
implicit-GEMM — and the Pallas (band, bco) tiling — is measured per shape).

Three layers:
  1. a trace-time shape registry: every Conv3x3 dispatch records its
     (N, H, W, Cin) -> Co request, so `recorded_shapes()` after tracing a
     pipeline yields exactly the model's conv working set;
  2. an on-disk winner table (JSON, keyed "n,h,w,ci,co,dtype") consulted by
     the dispatch before the measured heuristic (conv3x3_pallas_wins);
  3. an offline tuner (scripts/autotune_conv3x3.py) that benchmarks each
     recorded shape on the attached TPU with relay-robust in-graph-loop
     timing and writes the table.

The shipped default table (conv3x3_table.json next to this file) was
measured on the tunneled v5 chip at the SVD operating points; set
SVDX_AUTOTUNE_TABLE to point elsewhere, or SVDX_AUTOTUNE_TABLE=0 to ignore
tables entirely (heuristic only).
"""

from __future__ import annotations

import json
import os
import threading
from typing import Dict, Optional, Tuple

_DEFAULT_TABLE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "conv3x3_table.json")
_DEFAULT_FUSED_TABLE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "conv3x3_fused_table.json")

_lock = threading.Lock()
_recorded: set = set()
_table: Optional[Dict[str, dict]] = None
_table_path_loaded: Optional[str] = None
_fused_table: Optional[Dict[str, dict]] = None
_fused_path_loaded: Optional[str] = None


def _key(x_shape, co: int, dtype_str: str) -> str:
    n, h, w, ci = x_shape
    return f"{n},{h},{w},{ci},{co},{dtype_str}"


def _fused_key(x_shape, co: int, dtype_str: str, epi: str) -> str:
    return f"{_key(x_shape, co, dtype_str)},{epi}"


def record_shape(x_shape, co: int, dtype_str: str, epi: str = "") -> None:
    """Called by the Conv3x3 dispatch at trace time. `epi` tags the fused
    epilogue combination requested at this site ("" plain; "preS" folded
    GN+SiLU input affine; "+post" t-emb shift; "+res" residual add) so the
    fused-chain tuner (scripts/tune_conv_fused.py) measures exactly the
    subgraphs the model runs."""
    with _lock:
        _recorded.add((tuple(int(d) for d in x_shape), int(co), dtype_str,
                       epi))


def recorded_shapes():
    """All (x_shape, co, dtype_str, epi) requests seen since process start
    (or the last reset) — trace a model, then read this."""
    with _lock:
        return sorted(_recorded)


def reset_recorded() -> None:
    with _lock:
        _recorded.clear()


def table_path() -> Optional[str]:
    p = os.environ.get("SVDX_AUTOTUNE_TABLE", _DEFAULT_TABLE)
    return None if p == "0" else p


def _load_table() -> Dict[str, dict]:
    global _table, _table_path_loaded
    path = table_path()
    if path is None:
        return {}
    with _lock:
        if _table is not None and _table_path_loaded == path:
            return _table
        try:
            with open(path) as f:
                _table = json.load(f).get("entries", {})
        except (OSError, ValueError):
            _table = {}
        _table_path_loaded = path
        return _table


def lookup(x_shape, co: int, dtype_str: str) -> Optional[dict]:
    """Measured winner for this exact shape, or None (fall to heuristic).
    Entry: {"impl": "pallas"|"xla", "band": int, "bco": int,
            "speedup": float}."""
    return _load_table().get(_key(x_shape, co, dtype_str))


def fused_table_path() -> Optional[str]:
    p = os.environ.get("SVDX_FUSED_TABLE", _DEFAULT_FUSED_TABLE)
    return None if p == "0" else p


def _load_fused_table() -> Dict[str, dict]:
    global _fused_table, _fused_path_loaded
    path = fused_table_path()
    if path is None:
        return {}
    with _lock:
        if _fused_table is not None and _fused_path_loaded == path:
            return _fused_table
        try:
            with open(path) as f:
                _fused_table = json.load(f).get("entries", {})
        except (OSError, ValueError):
            _fused_table = {}
        _fused_path_loaded = path
        return _fused_table


def lookup_fused(x_shape, co: int, dtype_str: str,
                 epi: str) -> Optional[dict]:
    """Measured winner for the FUSED SUBGRAPH (conv + the `epi` epilogue
    chain, timed end-to-end by scripts/tune_conv_fused.py — unlike `lookup`,
    whose entries time the bare conv and therefore miss the pallas_call
    fusion-boundary cost that sank the plain table end-to-end, PERF.md
    session-4). None -> no measurement; fall to the plain-table logic."""
    return _load_fused_table().get(_fused_key(x_shape, co, dtype_str, epi))


def save_fused_table(entries: Dict[str, dict], path: Optional[str] = None,
                     device_kind: str = "") -> str:
    global _fused_table, _fused_path_loaded
    path = path or fused_table_path() or _DEFAULT_FUSED_TABLE
    merged: Dict[str, dict] = {}
    try:
        with open(path) as f:
            merged = json.load(f).get("entries", {})
    except (OSError, ValueError):
        pass
    merged.update(entries)
    with open(path, "w") as f:
        json.dump({"device_kind": device_kind, "entries": merged}, f,
                  indent=1, sort_keys=True)
    with _lock:
        _fused_table = None
        _fused_path_loaded = None
    return path


def save_table(entries: Dict[str, dict], path: Optional[str] = None,
               device_kind: str = "") -> str:
    """Write (merging over an existing table at `path`)."""
    global _table, _table_path_loaded
    path = path or table_path() or _DEFAULT_TABLE
    merged: Dict[str, dict] = {}
    try:
        with open(path) as f:
            merged = json.load(f).get("entries", {})
    except (OSError, ValueError):
        pass
    merged.update(entries)
    with open(path, "w") as f:
        json.dump({"device_kind": device_kind, "entries": merged}, f,
                  indent=1, sort_keys=True)
    with _lock:
        _table = None
        _table_path_loaded = None
    return path


def make_entry(impl: str, band: int = 0, bco: int = 0,
               speedup: float = 0.0) -> dict:
    return {"impl": impl, "band": int(band), "bco": int(bco),
            "speedup": round(float(speedup), 3)}
