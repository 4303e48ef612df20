"""Finite-difference derivative checker.

Test-utility analog of `altro/utils/derivative_checker.hpp:10-138` and the
`FunctionBase::CheckJacobian/CheckHessian` helpers
(`common/functionbase.cpp:35-126`): in the reference these validate
hand-written analytic derivatives; here they validate AD (and any analytic
overrides a user supplies).
"""
from __future__ import annotations

from typing import Callable

import numpy as np


def finite_diff(f: Callable, x: np.ndarray, eps: float = 1e-6, central: bool = True):
    """Finite-difference Jacobian of f: R^n -> R^p at x."""
    x = np.asarray(x, dtype=np.float64)
    f0 = np.asarray(f(x), dtype=np.float64)
    jac = np.zeros(f0.shape + x.shape)
    for i in range(x.size):
        dx = np.zeros_like(x)
        dx.flat[i] = eps
        if central:
            fp = np.asarray(f(x + dx), np.float64)
            fm = np.asarray(f(x - dx), np.float64)
            col = (fp - fm) / (2 * eps)
        else:
            col = (np.asarray(f(x + dx), np.float64) - f0) / eps
        jac[..., i] = col
    return jac


def finite_diff_jacobian(f: Callable, x, u, eps: float = 1e-6):
    """Jacobians (df/dx, df/du) of f(x, u) by central differences."""
    x = np.asarray(x, np.float64)
    u = np.asarray(u, np.float64)
    A = finite_diff(lambda x_: f(x_, u), x, eps)
    B = finite_diff(lambda u_: f(x, u_), u, eps)
    return A, B


def finite_diff_gradient(f: Callable, x, eps: float = 1e-6):
    """Gradient of scalar f (`derivative_checker.hpp:94-101`)."""
    return finite_diff(lambda x_: np.asarray(f(x_)).reshape(()), x, eps)


def finite_diff_hessian(f: Callable, x, eps: float = 1e-4):
    """Hessian of scalar f via nested differences
    (`derivative_checker.hpp:131-138`)."""
    return finite_diff(lambda x_: finite_diff_gradient(f, x_, eps), x, eps)
