"""Normalized hinge loss and its tie-exact subgradient.

Parity targets in the reference (/root/reference):
  - loss      ``0.5*|q - y|``          : fast_algorithms.py:19-24
  - subgrad   ``0.5*sign(q - y)`` with an *exact* zero at ``q == y``
                                        : fast_algorithms.py:27-34

The tie case matters for trajectory parity: a subgradient of 0 at ``q == y``
leaves the leader accumulator untouched, and ``jnp.sign`` returns exactly 0
at 0, reproducing the reference's three-way branch without control flow.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalized_hinge(q: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """``0.5 * |q - y|`` for labels ``y in {-1, +1}`` (elementwise)."""
    return 0.5 * jnp.abs(q - y)


def hinge_subgradient(q: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Subgradient of the normalized hinge w.r.t. the prediction ``q``.

    Exactly ``+0.5`` when ``q > y``, ``-0.5`` when ``q < y`` and ``0.0`` at
    the tie ``q == y`` (``jnp.sign(0) == 0``).
    """
    return 0.5 * jnp.sign(q - y)
