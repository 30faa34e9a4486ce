"""Quadrature convergence sweep (scaling/Integration.cpp:20-66 analog).

Prints CSV `rule,n,abs_error,rel_error` for Gauss-Legendre and the
midpoint/trapezoid/Simpson composite rules on a known integral.
"""

from __future__ import annotations

import sys

import numpy as np

import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from fluidsolver_tpu.utils import quadrature as q

    f = lambda x: np.exp(x) * np.sin(3.0 * x)  # noqa: E731
    a, b = 0.0, 2.0
    exact = (np.exp(b) * (np.sin(3 * b) - 3 * np.cos(3 * b)) -
             (np.sin(0) - 3 * np.cos(0))) / 10.0

    print("rule,n,abs_error,rel_error")
    for n in [1, 2, 4, 8, 16, 32, 64]:
        got = q.gauss_legendre(f, a, b, n)
        err = abs(got - exact)
        print(f"gauss,{n},{err:.6e},{err / abs(exact):.6e}")
    for n in [5, 9, 17, 33, 65, 129]:
        xs = np.linspace(a, b, n)
        got = q.simpsons_rule(f(xs), a, b)
        err = abs(got - exact)
        print(f"simpson,{n},{err:.6e},{err / abs(exact):.6e}")
        got = q.trapezoidal_rule(f(xs), xs)
        err = abs(got - exact)
        print(f"trapezoid,{n},{err:.6e},{err / abs(exact):.6e}")
        xm = 0.5 * (xs[:-1] + xs[1:])
        got = q.midpoint_rule(f(xm), (b - a) / (n - 1))
        err = abs(got - exact)
        print(f"midpoint,{n},{err:.6e},{err / abs(exact):.6e}")


if __name__ == "__main__":
    main()
