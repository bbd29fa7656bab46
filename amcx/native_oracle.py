"""ctypes loader for the native (C++) oracle library.

Mirrors the reference's relationship with QuantLib (C++ engines behind a
Python wrapper, `american_monte_carlo.py:10-68`), except the library is our
own (`native/oracle.cpp`) and builds from source with ``make`` on first use.
It provides float64 versions of every `amcx.oracle` engine — the
independent cross-check for the on-device float32 oracle (tests in
``tests/test_native_oracle.py``).

All functions raise ``RuntimeError`` if the library is unavailable; call
:func:`available` to gate.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional

import numpy as np

__all__ = [
    "available",
    "bs_price",
    "down_in_price",
    "crr_price",
    "crr_down_in_price",
    "bs_price_batch",
    "crr_price_batch",
    "swing_price",
]

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libamcx_oracle.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    # run make unconditionally: it is incremental, and a PREBUILT .so from
    # an older checkout would otherwise be loaded stale (missing newer
    # symbols -> AttributeError below instead of a graceful degrade)
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (subprocess.SubprocessError, FileNotFoundError):
        if not _LIB_PATH.exists():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None

    try:
        return _register(lib)
    except AttributeError:
        # stale prebuilt library missing newer symbols
        _build_failed = True
        return None


def _register(lib: ctypes.CDLL) -> ctypes.CDLL:
    D, I, I64 = ctypes.c_double, ctypes.c_int, ctypes.c_int64
    PD = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.amcx_bs_price.restype = D
    lib.amcx_bs_price.argtypes = [D, D, D, D, D, D, I]
    lib.amcx_down_in_price.restype = D
    lib.amcx_down_in_price.argtypes = [D, D, D, D, D, D, D, I]
    lib.amcx_crr_price.restype = D
    lib.amcx_crr_price.argtypes = [D, D, D, D, D, D, I, I, I]
    lib.amcx_crr_down_in_price.restype = D
    lib.amcx_crr_down_in_price.argtypes = [D, D, D, D, D, D, D, I, I, I]
    lib.amcx_swing_price.restype = D
    lib.amcx_swing_price.argtypes = [D, D, D, D, D, D, I, I, I, I, I, I]
    lib.amcx_bs_price_batch.restype = None
    lib.amcx_bs_price_batch.argtypes = [PD, PD, I64, D, D, D, D, I, PD]
    lib.amcx_crr_price_batch.restype = None
    lib.amcx_crr_price_batch.argtypes = [PD, PD, I64, D, D, D, D, I, I, I, PD]
    global _lib
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _req() -> ctypes.CDLL:
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native oracle unavailable (build failed or no toolchain); "
            "use the JAX oracle in amcx.oracle"
        )
    return lib


def _is_put(option_type: str) -> int:
    return 1 if option_type.strip().lower() == "put" else 0


def bs_price(S0, K, T, r, sigma, q=0.0, option_type="call") -> float:
    return _req().amcx_bs_price(S0, K, T, r, sigma, q, _is_put(option_type))


def down_in_price(S0, K, T, r, sigma, barrier, q=0.0, option_type="call") -> float:
    return _req().amcx_down_in_price(S0, K, T, r, sigma, barrier, q, _is_put(option_type))


def crr_price(S0, K, T, r, sigma, n_steps=1000, q=0.0, option_type="call",
              american=False) -> float:
    return _req().amcx_crr_price(
        S0, K, T, r, sigma, q, int(n_steps), _is_put(option_type), int(american)
    )


def crr_down_in_price(S0, K, T, r, sigma, barrier, n_steps=1000, q=0.0,
                      option_type="call", american=False) -> float:
    return _req().amcx_crr_down_in_price(
        S0, K, T, r, sigma, barrier, q, int(n_steps), _is_put(option_type), int(american)
    )


def bs_price_batch(S, tau, K, r, sigma, q=0.0, option_type="call") -> np.ndarray:
    lib = _req()
    S = np.ascontiguousarray(S, np.float64)
    tau = np.ascontiguousarray(np.broadcast_to(tau, S.shape), np.float64)
    out = np.empty_like(S)
    lib.amcx_bs_price_batch(
        S.ravel(), tau.ravel(), S.size, K, r, sigma, q, _is_put(option_type),
        out.ravel(),
    )
    return out


def crr_price_batch(S, tau, K, r, sigma, n_steps=100, q=0.0, option_type="call",
                    american=True) -> np.ndarray:
    lib = _req()
    S = np.ascontiguousarray(S, np.float64)
    tau = np.ascontiguousarray(np.broadcast_to(tau, S.shape), np.float64)
    out = np.empty_like(S)
    lib.amcx_crr_price_batch(
        S.ravel(), tau.ravel(), S.size, K, r, sigma, q, int(n_steps),
        _is_put(option_type), int(american), out.ravel(),
    )
    return out


def swing_price(S0, K, T, r, sigma, n_rights, q=0.0, n_steps=100, n_sub=20,
                option_type="put", payoff_kind="option", n_min=0) -> float:
    """float64 C++ swing rights-lattice — the independent twin of
    `amcx.swing.crr_swing_price` (same date-grid exercise semantics,
    forward takes and take-or-pay obligations included)."""
    lib = _req()
    return float(lib.amcx_swing_price(
        S0, K, T, r, sigma, q, int(n_rights), int(n_steps), int(n_sub),
        int(option_type.strip().lower() == "put"),
        int(payoff_kind.strip().lower() == "forward"), int(n_min)))
