"""Explicit Runge-Kutta time integrators.

Tableaux mirror the MFEM ODE solvers used by the reference
(reference: src/M2ulPhyS.cpp:721-739): ForwardEuler, RK2(alpha),
RK3 SSP, classical RK4, and a 6th-order method.  Each integrator is a pure
function `step(rhs_fn, U, t, dt) -> (U_next, aux)` suitable for jit; `rhs_fn`
returns (dU/dt, aux) and the aux of the FIRST stage is propagated (it carries
the max characteristic speed used for CFL control, evaluated at U_n like the
reference does).
"""

from __future__ import annotations


def forward_euler(rhs_fn, U, t, dt):
    k1, aux = rhs_fn(U, t)
    return U + dt * k1, aux


def rk2(rhs_fn, U, t, dt, alpha=1.0):
    """MFEM RK2Solver(alpha); alpha=1 is Heun's method."""
    k1, aux = rhs_fn(U, t)
    k2, _ = rhs_fn(U + alpha * dt * k1, t + alpha * dt)
    b2 = 1.0 / (2.0 * alpha)
    b1 = 1.0 - b2
    return U + dt * (b1 * k1 + b2 * k2), aux


def rk3_ssp(rhs_fn, U, t, dt):
    """Strong-stability-preserving RK3 (Shu-Osher)."""
    k1, aux = rhs_fn(U, t)
    u1 = U + dt * k1
    k2, _ = rhs_fn(u1, t + dt)
    u2 = 0.75 * U + 0.25 * (u1 + dt * k2)
    k3, _ = rhs_fn(u2, t + 0.5 * dt)
    return (U + 2.0 * (u2 + dt * k3)) / 3.0, aux


def rk4(rhs_fn, U, t, dt):
    """Classical RK4."""
    k1, aux = rhs_fn(U, t)
    k2, _ = rhs_fn(U + 0.5 * dt * k1, t + 0.5 * dt)
    k3, _ = rhs_fn(U + 0.5 * dt * k2, t + 0.5 * dt)
    k4, _ = rhs_fn(U + dt * k3, t + dt)
    return U + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4), aux


# Verner's efficient 6(5) pair, 9 stages (RK6 role of MFEM's RK6Solver).
_V6_C = (
    0.0, 0.06, 0.09593333333333333, 0.1439, 0.4973, 0.9725, 0.9995, 1.0, 1.0,
)
_V6_A = (
    (),
    (0.06,),
    (0.01923996296296296, 0.07669337037037037),
    (0.035975, 0.0, 0.107925),
    (1.318683415233148, 0.0, -5.042058063628562, 4.220674648395414),
    (-41.87259166432751, 0.0, 159.4325621631375, -122.1192135650100, 5.531743066200054),
    (-54.43015693531650, 0.0, 207.0672513650184, -158.6108137845899, 6.991816585950242,
     -0.01859723106220323),
    (-54.66374178728198, 0.0, 207.9528062553893, -159.2889574744995, 7.018743740796944,
     -0.01833878590504572, -0.0005119484997882099),
    (0.03438957868357036, 0.0, 0.0, 0.2582624555633503, 0.4209371189673537,
     4.405396469669310, -176.4831190242986, 172.3641334014150),
)
_V6_B = (
    0.03438957868357036, 0.0, 0.0, 0.2582624555633503, 0.4209371189673537,
    4.405396469669310, -176.4831190242986, 172.3641334014150, 0.0,
)


def rk6(rhs_fn, U, t, dt):
    """6th-order explicit RK (Verner 6(5) pair, 9 stages)."""
    ks = []
    aux0 = None
    for i, c in enumerate(_V6_C):
        acc = U
        for j, a in enumerate(_V6_A[i]):
            if a != 0.0:
                acc = acc + dt * a * ks[j]
        k, aux = rhs_fn(acc, t + c * dt)
        if i == 0:
            aux0 = aux
        ks.append(k)
    out = U
    for j, b in enumerate(_V6_B):
        if b != 0.0:
            out = out + dt * b * ks[j]
    return out, aux0


INTEGRATORS = {
    1: forward_euler,
    2: rk2,
    3: rk3_ssp,
    4: rk4,
    6: rk6,
}


def get_integrator(kind):
    """kind: int code (reference numbering) or name."""
    names = {
        "forward-euler": 1,
        "rk2": 2,
        "rk3-ssp": 3,
        "rk3": 3,
        "rk4": 4,
        "rk6": 6,
    }
    if isinstance(kind, str):
        kind = names[kind.lower()]
    return INTEGRATORS[kind]
