"""FactoredMatrix — lazy low-rank product A·B for circuit analysis, in JAX.

Behavioral counterpart of
``/root/reference/src/vit_prisma/prisma_tools/factored_matrix.py:22`` (itself
from TransformerLens): efficient SVD via factor SVDs + small middle SVD
(:127-147), eigenvalues of the square product (:162), Frobenius norm (:199),
``make_even`` (:208), ``collapse_l/r`` (:224-234), leading-dim indexing
(:178) and ``@``/``*`` operator overloads (:48-108).

All linear algebra is ``jax.numpy.linalg`` — jit-friendly and batched over
arbitrary leading dims (e.g. ``[n_layers, n_heads, ...]`` head circuits in
one call).
"""

from __future__ import annotations

from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def _T(x):
    return jnp.swapaxes(x, -2, -1)


class FactoredMatrix:
    def __init__(self, A, B):
        A = jnp.asarray(A)
        B = jnp.asarray(B)
        assert A.shape[-1] == B.shape[-2], (
            f"Factored matrix must match on inner dimension, shapes were "
            f"a: {A.shape}, b: {B.shape}")
        self.ldim = A.shape[-2]
        self.rdim = B.shape[-1]
        self.mdim = B.shape[-2]
        self.has_leading_dims = (A.ndim > 2) or (B.ndim > 2)
        lead = np.broadcast_shapes(A.shape[:-2], B.shape[:-2])
        self.shape = tuple(lead) + (self.ldim, self.rdim)
        self.A = jnp.broadcast_to(A, tuple(lead) + (self.ldim, self.mdim))
        self.B = jnp.broadcast_to(B, tuple(lead) + (self.mdim, self.rdim))
        self._svd_cache = None

    # -- products --------------------------------------------------------
    def __matmul__(self, other):
        if isinstance(other, FactoredMatrix):
            return (self @ other.A) @ other.B
        other = jnp.asarray(other)
        if other.ndim < 2:
            return (self.A @ (self.B @ other[..., None]))[..., 0]
        assert other.shape[-2] == self.rdim
        if self.rdim > self.mdim:
            return FactoredMatrix(self.A, self.B @ other)
        return FactoredMatrix(self.AB, other)

    def __rmatmul__(self, other):
        if isinstance(other, FactoredMatrix):
            return other.A @ (other.B @ self)
        other = jnp.asarray(other)
        assert other.shape[-1] == self.ldim
        if other.ndim < 2:
            return ((other[..., None, :] @ self.A) @ self.B)[..., 0, :]
        if self.ldim > self.mdim:
            return FactoredMatrix(other @ self.A, self.B)
        return FactoredMatrix(other, self.AB)

    def __mul__(self, scalar):
        if hasattr(scalar, "size"):
            assert np.size(scalar) == 1, (
                f"Tensor must be a scalar for use with * but was of shape "
                f"{np.shape(scalar)}")
        return FactoredMatrix(self.A * scalar, self.B)

    def __rmul__(self, scalar):
        return self * scalar

    # -- materialization -------------------------------------------------
    @property
    def AB(self):
        return self.A @ self.B

    @property
    def BA(self):
        assert self.rdim == self.ldim, "Can only take BA if ldim==rdim"
        return self.B @ self.A

    @property
    def T(self) -> "FactoredMatrix":
        return FactoredMatrix(_T(self.B), _T(self.A))

    # -- SVD (factored_matrix.py:127-147) --------------------------------
    def svd(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(U, S, Vh) with U [... ldim mdim], S [... mdim], Vh [... rdim mdim]
        such that U @ diag(S) @ Vh^T == AB.  Note Vh follows the torch.svd
        convention (V, not its transpose), matching the reference."""
        if self._svd_cache is not None:
            return self._svd_cache
        Ua, Sa, Vha = jnp.linalg.svd(self.A, full_matrices=False)
        Ub, Sb, Vhb = jnp.linalg.svd(self.B, full_matrices=False)
        # torch.svd returns V; jnp returns Vh = V^T.  Convert as we go.
        middle = (Sa[..., :, None] * Vha) @ (Ub * Sb[..., None, :])
        Um, Sm, Vhm = jnp.linalg.svd(middle, full_matrices=False)
        U = Ua @ Um
        Vh = _T(Vhb) @ _T(Vhm)
        self._svd_cache = (U, Sm, Vh)
        return self._svd_cache

    @property
    def U(self):
        return self.svd()[0]

    @property
    def S(self):
        return self.svd()[1]

    @property
    def Vh(self):
        return self.svd()[2]

    @property
    def eigenvalues(self):
        """Eigenvalues of AB == eigenvalues of BA (up to trailing zeros)."""
        return jnp.linalg.eigvals(self.BA)

    # -- norms / reshaping ----------------------------------------------
    def norm(self):
        """Frobenius norm via singular values (factored_matrix.py:199)."""
        return jnp.sqrt(jnp.sum(jnp.square(self.S), axis=-1))

    def make_even(self) -> "FactoredMatrix":
        s_sqrt = jnp.sqrt(self.S)
        return FactoredMatrix(self.U * s_sqrt[..., None, :],
                              s_sqrt[..., :, None] * _T(self.Vh))

    def collapse_l(self):
        return self.S[..., :, None] * _T(self.Vh)

    def collapse_r(self):
        return self.U * self.S[..., None, :]

    def unsqueeze(self, k: int) -> "FactoredMatrix":
        return FactoredMatrix(jnp.expand_dims(self.A, k), jnp.expand_dims(self.B, k))

    def get_corner(self, k: int = 3):
        return self.A[..., :k, :] @ self.B[..., :, :k]

    # -- indexing (leading dims only, factored_matrix.py:171-196) --------
    def _convert_to_slice(self, sequence: Union[Tuple, List], idx: int) -> Tuple:
        if isinstance(idx, int):
            sequence = list(sequence)
            if isinstance(sequence[idx], int):
                sequence[idx] = slice(sequence[idx], sequence[idx] + 1)
            sequence = tuple(sequence)
        return sequence

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        length = len([i for i in idx if i is not None])
        if length <= len(self.shape) - 2:
            return FactoredMatrix(self.A[idx], self.B[idx])
        elif length == len(self.shape) - 1:
            idx = self._convert_to_slice(idx, -1)
            return FactoredMatrix(self.A[idx], self.B[idx[:-1]])
        elif length == len(self.shape):
            idx = self._convert_to_slice(idx, -1)
            idx = self._convert_to_slice(idx, -2)
            return FactoredMatrix(self.A[idx[:-1]],
                                  self.B[idx[:-2] + (slice(None), idx[-1])])
        raise ValueError(
            f"{idx} is too long an index for a FactoredMatrix with shape {self.shape}")

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def pair(self):
        return (self.A, self.B)

    def __repr__(self):
        return f"FactoredMatrix: Shape({self.shape}), Hidden Dim({self.mdim})"
