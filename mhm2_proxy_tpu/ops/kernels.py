"""Central Pallas-kernel enable registry.

Every production auto-select site ("use the Pallas kernel on TPU, the XLA
formulation elsewhere") consults `enabled(name)` here instead of testing
`jax.default_backend()` directly. That gives the framework ONE switchboard:

- a Mosaic regression in one kernel (the round-3 `arith.maxui` failure in
  pallas_join) can be turned off individually — the stage falls back to its
  XLA twin instead of killing the whole run;
- `scripts/verify_kernels_tpu.py` compiles + bit-checks each kernel on the
  real chip and bench.py disables exactly the failed ones before timing;
- a deleted/unimportable kernel module degrades to the XLA path (the import
  is probed once, its failure recorded) rather than raising ImportError
  mid-pipeline.

Mirrors the cross-check discipline of the reference's dual CPU/GPU backends
(/root/reference/src/kcount/kcount_gpu.cpp:358-364): the accelerated path is
never trusted without its host twin standing by.

Env override: MHM2_TPU_DISABLE_KERNELS="join,sort" disables kernels at
import time (how subprocess-driven verification propagates failures).
"""

from __future__ import annotations

import importlib
import os

import jax

# kernel name -> module implementing it (under mhm2_proxy_tpu.ops)
_MODULES = {
    "extract": "pallas_extract",
    "minimizer": "pallas_minimizer",
    "sort": "pallas_sort",
    "compact": "pallas_compact",
    "scan": "pallas_scan",
    "finalize": "pallas_finalize",
    "join": "pallas_join",
    "ssw": "pallas_ssw",
}

_forced: dict[str, bool] = {}
_reasons: dict[str, str] = {}
_import_ok: dict[str, bool] = {}


def _env_init() -> None:
    for name in os.environ.get("MHM2_TPU_DISABLE_KERNELS", "").split(","):
        name = name.strip()
        if name:
            _forced[name] = False
            _reasons[name] = "MHM2_TPU_DISABLE_KERNELS"


_env_init()


def _importable(name: str) -> bool:
    ok = _import_ok.get(name)
    if ok is None:
        try:
            importlib.import_module(f".{_MODULES[name]}", __package__)
            ok = True
        except Exception as e:  # ImportError, SyntaxError, ...
            ok = False
            _reasons.setdefault(name, f"import failed: {type(e).__name__}: {e}")
        _import_ok[name] = ok
    return ok


def enabled(name: str, *more: str) -> bool:
    """True iff kernel `name` (and every kernel in `more`) should be used.

    Auto policy: TPU backend + module importable, unless forced either way
    via force()/disable() or MHM2_TPU_DISABLE_KERNELS.
    """
    for n in (name,) + more:
        if n not in _MODULES:
            raise KeyError(f"unknown kernel {n!r}; known: {sorted(_MODULES)}")
        v = _forced.get(n)
        if v is False:
            return False
        if v is None:
            if jax.default_backend() != "tpu" or not _importable(n):
                return False
    return True


def disable(name: str, reason: str = "") -> None:
    """Force kernel off (XLA fallback); reason lands in disabled()."""
    _forced[name] = False
    if reason:
        _reasons[name] = reason


def force(name: str, value: bool | None) -> None:
    """Force on/off, or None to restore auto policy (tests)."""
    if value is None:
        _forced.pop(name, None)
        _reasons.pop(name, None)
    else:
        _forced[name] = value


def disabled() -> dict[str, str]:
    """Map of every kernel currently off (forced or unimportable) -> reason."""
    out = {}
    for n in _MODULES:
        if _forced.get(n) is False:
            out[n] = _reasons.get(n, "forced off")
        elif _forced.get(n) is None and jax.default_backend() == "tpu" and not _importable(n):
            out[n] = _reasons.get(n, "import failed")
    return out


def reset() -> None:
    """Restore auto policy for every kernel (tests)."""
    _forced.clear()
    _reasons.clear()
    _import_ok.clear()
    _env_init()
