"""Robust-kernel weights shared by all optimizers.

Counterpart of g2o's RobustKernelHuber / the reference's
WeightedHubberRobustKernel (typesg2o.h:82) with the chi-square deltas of
pnpsolver.cpp:179-186 and globaloptimizer_g2o.cpp:230-272.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel given squared error chi2.

    rho(s) = s                    for s <= delta^2
             2 delta sqrt(s) - delta^2 otherwise
    weight = rho'(s) = min(1, delta / sqrt(s)).
    """
    s = jnp.maximum(chi2, 1e-12)
    return jnp.minimum(1.0, jnp.sqrt(delta2 / s))
