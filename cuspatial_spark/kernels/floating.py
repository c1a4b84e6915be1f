"""ULP-based float equality, vectorized.

Reproduces the semantics of the reference's ULP comparator
(/root/reference/cpp/include/cuspatial/detail/utility/floating_point.cuh:27,118-129):
two floats are "equal" iff their biased integer representations differ by
<= 4 ULP.  NaN never compares equal.

Implemented from scratch with NumPy integer views (the standard
sign-magnitude -> biased transform described in Bruce Dawson's public
"Comparing Floating Point Numbers" article).
"""

from __future__ import annotations

import numpy as np

DEFAULT_MAX_ULP = 4


def _biased(f: np.ndarray) -> np.ndarray:
    """Map IEEE sign-magnitude bit patterns to a monotone unsigned scale."""
    if f.dtype == np.float64:
        bits = f.view(np.int64)
        sign_mask = np.int64(np.uint64(0x8000000000000000).view(np.int64))
        u = bits.view(np.uint64)
        out = np.where(
            bits & sign_mask != 0,
            (~u + np.uint64(1)),
            u | np.uint64(0x8000000000000000),
        )
        return out
    elif f.dtype == np.float32:
        bits = f.view(np.int32)
        sign_mask = np.int32(np.uint32(0x80000000).view(np.int32))
        u = bits.view(np.uint32)
        out = np.where(
            bits & sign_mask != 0,
            (~u + np.uint32(1)),
            u | np.uint32(0x80000000),
        )
        return out
    raise TypeError(f"unsupported dtype {f.dtype}")


def float_equal(a, b, max_ulp: int = DEFAULT_MAX_ULP) -> np.ndarray:
    """Vectorized ULP equality; returns bool ndarray broadcast over a, b."""
    a = np.asarray(a)
    b = np.asarray(b)
    dt = np.result_type(a.dtype, b.dtype)
    a, b = np.broadcast_arrays(a.astype(dt, copy=False), b.astype(dt, copy=False))
    a = np.ascontiguousarray(a)
    b = np.ascontiguousarray(b)
    ba = _biased(a)
    bb = _biased(b)
    diff = np.where(ba >= bb, ba - bb, bb - ba)
    ok = diff <= np.uint64(max_ulp) if dt == np.float64 else diff <= np.uint32(max_ulp)
    return ok & ~np.isnan(a) & ~np.isnan(b)
