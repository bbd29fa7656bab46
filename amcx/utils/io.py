"""Result serialization + deterministic re-run (SURVEY §5 checkpoint/
recovery).

The reference holds everything in memory and prints two numbers; here a
pricing run can be dumped to a single ``.npz`` (price, stderr, exercise
times, per-step regression coefficients, exposures, config metadata) and
reloaded. Combined with counter-based RNG, ``(key_seed, config)`` fully
determines every array — `replay` re-executes a saved run and checks the
price matches, which *is* the failure-recovery story for a seconds-long
pricing job (SURVEY §5: "deterministic re-run from (key, config)").
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

__all__ = ["save_result", "load_result", "replay"]


def save_result(path, result, config: Optional[dict] = None) -> None:
    """Dump an `LSMCResult` (+ JSON-serializable config) to ``.npz``."""
    arrays = {}
    for name in ("price", "stderr", "cashflows", "exercise_times", "continuation", "coeffs"):
        v = getattr(result, name, None)
        if v is not None:
            arrays[name] = np.asarray(v)
    if getattr(result, "exposures", None) is not None:
        arrays["epe"] = np.asarray(result.exposures.epe)
        arrays["pfe5"] = np.asarray(result.exposures.pfe5)
        arrays["pfe95"] = np.asarray(result.exposures.pfe95)
    arrays["config_json"] = np.asarray(json.dumps(config or {}))
    np.savez_compressed(path, **arrays)


def load_result(path) -> dict:
    """Load a saved run; returns a dict of arrays plus the parsed config."""
    with np.load(path, allow_pickle=False) as z:
        out = {k: z[k] for k in z.files}
    out["config"] = json.loads(str(out.pop("config_json")))
    return out


def replay(path, price_fn, atol: float = 1e-6) -> bool:
    """Re-run ``price_fn(config) -> price`` for a saved result and verify the
    deterministic reproduction (counter-based RNG makes this exact on the
    same hardware/backend)."""
    saved = load_result(path)
    price = float(price_fn(saved["config"]))
    return abs(price - float(saved["price"])) <= atol
