import numpy as np
import pytest

from tps_tpu.time.integrators import get_integrator


@pytest.mark.parametrize(
    "kind,expected_order",
    [(1, 1), (2, 2), (3, 3), (4, 4), (6, 6)],
)
def test_integrator_order(kind, expected_order):
    step = get_integrator(kind)

    def rhs(y, t):
        return np.cos(t) * y, None

    exact = np.exp(np.sin(2.0))
    errs = []
    dts = [0.2, 0.1, 0.05]
    for dt in dts:
        y, t = np.array(1.0), 0.0
        for _ in range(int(round(2.0 / dt))):
            y, _ = step(rhs, y, t, dt)
            t += dt
        errs.append(abs(float(y) - exact))
    order = np.log2(errs[0] / errs[1])
    assert order > expected_order - 0.5, (errs, order)
