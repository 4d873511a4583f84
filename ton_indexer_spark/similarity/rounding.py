"""Engine-portable similarity rounding.

The similarity operators round cosine values to 6 dp before ranking /
thresholding so the induced order is identical across engines.  Spark's
``F.round`` and DuckDB's ``ROUND`` both round half AWAY FROM ZERO, but
``np.round`` rounds half TO EVEN (banker's rounding) — a cosine landing
exactly on a 5e-7 midpoint would diverge between the numpy BLAS paths
and the SQL oracles.  ``round_half_away`` reproduces the SQL semantics
in numpy, keeping the cross-engine contract bit-identical.
"""

from __future__ import annotations

import numpy as np


def round_half_away(x: "np.ndarray", digits: int = 6) -> "np.ndarray":
    """Round half away from zero (SQL ROUND semantics), vectorized."""
    scale = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def unit_rows(mat: "np.ndarray") -> "np.ndarray":
    """Row-normalize a (n, d) float64 matrix; zero rows pass through
    (norm treated as 1) — the shared pre-step of every cosine kernel."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms
