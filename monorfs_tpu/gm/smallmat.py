"""Unrolled small-matrix algebra over structure-of-arrays operands.

TPU layout note: a tensor shaped [..., D, D] with D in {1, 2, 3} is padded by
XLA to (8, 128) tiles on its two trailing dims -- a ~100x HBM blowup that
dominates the PHD hot loop (see BENCH.md). Here a small matrix is instead a
Python list-of-lists of scalar arrays (each entry an arbitrary-shape jnp
array, e.g. [P, K]); every operation unrolls at trace time into elementwise
VPU work on cleanly tiled arrays. This is the compute layer under the SoA
Gaussian-mixture state (mixture.SGM).

Symmetric 3x3 covariances are carried as 6-tuples (xx, xy, xz, yy, yz, zz);
`sym_to_mat` aliases them into the list-of-lists form without copying.

Reference counterpart: the jagged-matrix helpers of
mono-rfs-lib/Util/MatrixExtensions.cs:41-577 (Multiply, PseudoInverse,
determinants) -- re-shaped for XLA rather than ported.
"""

import math

import jax.numpy as jnp

LOG2PI = math.log(2.0 * math.pi)


def from_tensor(t):
    """[..., R, C] tensor -> R x C list-of-lists of [...] arrays."""
    r, c = t.shape[-2], t.shape[-1]
    return [[t[..., i, j] for j in range(c)] for i in range(r)]


def to_tensor(a):
    return jnp.stack([jnp.stack(row, axis=-1) for row in a], axis=-2)


def vec_from_tensor(t):
    return [t[..., i] for i in range(t.shape[-1])]


def vec_to_tensor(v):
    return jnp.stack(v, axis=-1)


def shape_of(a):
    return len(a), len(a[0])


def matmul(a, b):
    """(R x K) @ (K x C) -> R x C."""
    ra, ka = shape_of(a)
    kb, cb = shape_of(b)
    assert ka == kb, (ka, kb)
    return [
        [sum(a[i][k] * b[k][j] for k in range(ka)) for j in range(cb)]
        for i in range(ra)
    ]


def matvec(a, x):
    r, c = shape_of(a)
    assert c == len(x)
    return [sum(a[i][k] * x[k] for k in range(c)) for i in range(r)]


def transpose(a):
    r, c = shape_of(a)
    return [[a[i][j] for i in range(r)] for j in range(c)]


def add(a, b):
    return [[x + y for x, y in zip(ra, rb)] for ra, rb in zip(a, b)]


def sub(a, b):
    return [[x - y for x, y in zip(ra, rb)] for ra, rb in zip(a, b)]


def scale(a, s):
    return [[x * s for x in row] for row in a]


def identity_like(n, ref):
    one = jnp.ones_like(ref)
    zero = jnp.zeros_like(ref)
    return [[one if i == j else zero for j in range(n)] for i in range(n)]


def det(a):
    n, _ = shape_of(a)
    if n == 1:
        return a[0][0]
    if n == 2:
        return a[0][0] * a[1][1] - a[0][1] * a[1][0]
    if n == 3:
        return (
            a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
            - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
            + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0])
        )
    raise NotImplementedError(n)


def inv(a, dt=None):
    """Adjugate inverse for n in {1, 2, 3} (Gaussian.cs cached-inverse
    counterpart). Pass a precomputed determinant to share it."""
    n, _ = shape_of(a)
    if dt is None:
        dt = det(a)
    r = 1.0 / dt
    if n == 1:
        return [[r]]
    if n == 2:
        return [[a[1][1] * r, -a[0][1] * r], [-a[1][0] * r, a[0][0] * r]]
    if n == 3:
        return [
            [
                (a[1][1] * a[2][2] - a[1][2] * a[2][1]) * r,
                (a[0][2] * a[2][1] - a[0][1] * a[2][2]) * r,
                (a[0][1] * a[1][2] - a[0][2] * a[1][1]) * r,
            ],
            [
                (a[1][2] * a[2][0] - a[1][0] * a[2][2]) * r,
                (a[0][0] * a[2][2] - a[0][2] * a[2][0]) * r,
                (a[0][2] * a[1][0] - a[0][0] * a[1][2]) * r,
            ],
            [
                (a[1][0] * a[2][1] - a[1][1] * a[2][0]) * r,
                (a[0][1] * a[2][0] - a[0][0] * a[2][1]) * r,
                (a[0][0] * a[1][1] - a[0][1] * a[1][0]) * r,
            ],
        ]
    raise NotImplementedError(n)


def quadform(x, a, y=None):
    """x^T A y (y defaults to x)."""
    if y is None:
        y = x
    n, c = shape_of(a)
    return sum(x[i] * a[i][j] * y[j] for i in range(n) for j in range(c))


def sandwich(j, p):
    """J P J^T."""
    return matmul(matmul(j, p), transpose(j))


def log_multiplier(a, dt=None):
    """log[(2 pi)^(-D/2) det^(-1/2)] (Gaussian.cs:155)."""
    n, _ = shape_of(a)
    if dt is None:
        dt = det(a)
    return -0.5 * (n * LOG2PI + jnp.log(dt))


# -- symmetric 3x3 as 6-tuple (xx, xy, xz, yy, yz, zz) ------------------------

def sym_to_mat(c6):
    xx, xy, xz, yy, yz, zz = c6
    return [[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]]


def mat_to_sym(a):
    return (a[0][0], a[0][1], a[0][2], a[1][1], a[1][2], a[2][2])


def symmetrize(a):
    """Average A with its transpose (numerical hygiene before mat_to_sym)."""
    n, _ = shape_of(a)
    return [
        [0.5 * (a[i][j] + a[j][i]) for j in range(n)] for i in range(n)
    ]
