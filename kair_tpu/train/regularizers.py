"""Weight regularizers applied every N steps (reference
utils/utils_regularizers.py:16-96, invoked from model_plain.py:303-310).

Pure pytree→pytree functions; jit-compatible (SVD lowers to XLA). Applied to
conv kernels (HWIO) / their biases by leaf-name pattern, the analog of the
reference's `net.apply(...)` module walk.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _orth_kernel(w):
    """SVD orthogonalisation: push singular values toward [0.5, 1.5]
    (reference regularizer_orth, utils_regularizers.py:16-41). w is HWIO."""
    if w.ndim != 4:
        return w
    f1, f2, ci, co = w.shape
    mat = w.reshape(f1 * f2 * ci, co)
    u, s, vt = jnp.linalg.svd(mat, full_matrices=False)
    s = jnp.where(s > 1.5, s - 1e-4, s)
    s = jnp.where(s < 0.5, s + 1e-4, s)
    return (u @ jnp.diag(s) @ vt).reshape(f1, f2, ci, co)


def regularizer_orth(params: Any) -> Any:
    return jax.tree_util.tree_map(_orth_kernel, params)


def _clip_leaf(w):
    """Nudge weights outside [-1.5, 1.5] back by eps (reference
    regularizer_clip, utils_regularizers.py:74-96). Applies to kernels
    and biases alike (conv/linear leaves)."""
    eps, c_min, c_max = 1e-4, -1.5, 1.5
    w = jnp.where(w > c_max, w - eps, w)
    w = jnp.where(w < c_min, w + eps, w)
    return w


def regularizer_clip(params: Any) -> Any:
    return jax.tree_util.tree_map(_clip_leaf, params)
