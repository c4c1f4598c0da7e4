"""LTE (local thermodynamic equilibrium) table-based mixture + transport.

Mirrors the reference LteMixture / LteTransport behavior (reference:
src/lte_mixture.cpp:119-225, src/lte_transport_properties.cpp): a single
equilibrium fluid whose thermodynamics come from user tables
e(T, rho), R(T, rho), c(T, rho) and T(e, rho), with a Newton refinement of
the T(e) inversion; transport properties mu/kappa/sigma are table lookups.

Tables are Table2D objects over (T, rho) [or (e, rho) for T_table]; 1-D
tables broadcast over rho.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _eval2(table, a, b):
    """Evaluate a Table2D(a, b) or a 1-D LinearTable(a)."""
    try:
        return table(a, b)
    except TypeError:
        return table(a)


@dataclass(frozen=True, eq=False)
class LteMixture:
    dim: int
    nvel: int
    energy_table: object  # e(T, rho) [J/kg]
    R_table: object  # R(T, rho) [J/kg/K]
    c_table: object  # speed of sound c(T, rho) [m/s]
    T_table: object  # T(e, rho) initial guess for the inversion
    newton_iters: int = 20

    @property
    def num_equations(self):
        return self.nvel + 2

    @property
    def num_species(self):
        return 1

    @property
    def num_active_species(self):
        return 0

    @property
    def two_temperature(self):
        return False

    @property
    def i_th(self):
        return self.nvel + 1

    # the sponge/BC helpers use these background properties
    @property
    def gas_constant(self):
        return float(_eval2(self.R_table, 300.0, 1.0))

    @property
    def specific_heat_ratio(self):
        c = float(_eval2(self.c_table, 300.0, 1.0))
        return c * c / (self.gas_constant * 300.0)

    # ------------------------------------------------------------------
    def temperature(self, U):
        """T from conserved state: table guess + Newton on e(T) = e
        (reference ComputeTemperatureInternal :161-220)."""
        rho = U[..., 0]
        ke = 0.5 * jnp.sum(U[..., 1 : 1 + self.nvel] ** 2, axis=-1) / rho
        e = (U[..., self.i_th] - ke) / rho
        T = _eval2(self.T_table, e, rho)

        def body(_, T):
            res = e - _eval2(self.energy_table, T, rho)
            # cv = de/dT via table derivative (finite difference)
            dT = 1e-3 * jnp.maximum(T, 1.0)
            cv = (_eval2(self.energy_table, T + dT, rho)
                  - _eval2(self.energy_table, T - dT, rho)) / (2 * dT)
            return T + res / jnp.maximum(cv, 1e-30)

        return jax.lax.fori_loop(0, self.newton_iters, body, T)

    def pressure(self, U):
        rho = U[..., 0]
        T = self.temperature(U)
        return rho * _eval2(self.R_table, T, rho) * T

    def electron_pressure(self, U):
        return jnp.zeros_like(U[..., 0])

    def pressure_from_primitives(self, Up):
        rho = Up[..., 0]
        T = Up[..., self.i_th]
        return rho * _eval2(self.R_table, T, rho) * T

    def primitives(self, U):
        rho = U[..., 0:1]
        vel = U[..., 1 : 1 + self.nvel] / rho
        T = self.temperature(U)[..., None]
        return jnp.concatenate([rho, vel, T], axis=-1)

    def conservatives(self, Up):
        rho = Up[..., 0:1]
        mom = rho * Up[..., 1 : 1 + self.nvel]
        T = Up[..., self.i_th]
        e = _eval2(self.energy_table, T, rho[..., 0])
        ke = 0.5 * jnp.sum(Up[..., 1 : 1 + self.nvel] ** 2, axis=-1)
        rhoE = rho[..., 0] * (e + ke)
        return jnp.concatenate([rho, mom, rhoE[..., None]], axis=-1)

    def max_char_speed(self, U):
        rho = U[..., 0]
        v2 = jnp.sum(U[..., 1 : 1 + self.nvel] ** 2, axis=-1) / (rho * rho)
        T = self.temperature(U)
        c = _eval2(self.c_table, T, rho)
        return jnp.sqrt(v2) + c

    def sound_speed_from_T(self, T):
        return _eval2(self.c_table, T, jnp.ones_like(T))

    def species_enthalpies(self, U):
        return jnp.zeros(U.shape[:-1] + (1,), dtype=U.dtype)

    # BC helpers mirror the DryAir behavior with table energy
    def stagnant_state_with_temp(self, U, T_wall):
        rho = U[..., 0]
        e = _eval2(self.energy_table, jnp.full_like(rho, T_wall), rho)
        out = U.at[..., 1 : 1 + self.nvel].set(0.0)
        return out.at[..., self.i_th].set(rho * e)

    def modify_energy_for_pressure(self, U, p, modify_electron_energy=False):
        rho = U[..., 0]
        # T from target pressure: p = rho R(T) T, fixed-point in T
        T = p / (rho * self.gas_constant)
        for _ in range(8):
            T = p / (rho * _eval2(self.R_table, T, rho))
        e = _eval2(self.energy_table, T, rho)
        ke = 0.5 * jnp.sum(U[..., 1 : 1 + self.nvel] ** 2, axis=-1) / rho
        return U.at[..., self.i_th].set(rho * e + ke)


def load_lte_setup(inp, dim, nvel, prefix="flow/lte"):
    """Build (LteMixture, LteTransport) from the [flow]/lte input keys
    (reference: src/M2ulPhyS.cpp:164-260 + parseFluidPreset :2398-2403).

    table_dim = 1: HDF5 files with 4-column datasets "T_energy_R_c"
    (thermo) and "T_mu_kappa_sigma" (transport); the T(e) inversion table
    is the thermo e(T) column pair swapped (reference :193-201).
    table_dim = 2: whitespace tables over a structured (T, rho) grid —
    thermo columns (T, rho, .., e[3], .., R[6], .., c[8]), transport
    columns (T, rho, mu, kappa, sigma), e_rev columns (e, rho, T)
    (reference: src/lte_mixture.cpp:49-64,
    src/lte_transport_properties.cpp:38-51)."""
    import numpy as np

    from .tables import LinearTable, Table2D

    table_dim = int(inp.get(f"{prefix}/table_dim", 2))
    thermo_file = inp.get_required(f"{prefix}/thermo_table")
    trans_file = inp.get_required(f"{prefix}/transport_table")

    if table_dim == 1:
        import h5py

        with h5py.File(thermo_file, "r") as f:
            td = np.asarray(f["T_energy_R_c"])
        T, e, R, c = td[:, 0], td[:, 1], td[:, 2], td[:, 3]
        mixture = LteMixture(
            dim=dim, nvel=nvel,
            energy_table=LinearTable(x=T, f=e),
            R_table=LinearTable(x=T, f=R),
            c_table=LinearTable(x=T, f=c),
            T_table=LinearTable(x=e, f=T),
        )
        with h5py.File(trans_file, "r") as f:
            tr = np.asarray(f["T_mu_kappa_sigma"])
        Tt = tr[:, 0]
        transport = LteTransport(
            mu_table=LinearTable(x=Tt, f=tr[:, 1]),
            kappa_table=LinearTable(x=Tt, f=tr[:, 2]),
            sigma_table=LinearTable(x=Tt, f=tr[:, 3]),
        )
        return mixture, transport

    if table_dim != 2:
        raise ValueError("flow/lte/table_dim must be 1 or 2")

    e_rev_file = inp.get_required(f"{prefix}/e_rev_table")

    def grid2d(path, xcol, ycol, fcol):
        data = np.loadtxt(path)
        xs = np.unique(data[:, xcol])
        ys = np.unique(data[:, ycol])
        if len(xs) * len(ys) != data.shape[0]:
            raise ValueError(f"{path}: not a structured (x, y) grid")
        F = np.full((len(xs), len(ys)), np.nan)
        ix = np.searchsorted(xs, data[:, xcol])
        iy = np.searchsorted(ys, data[:, ycol])
        F[ix, iy] = data[:, fcol]
        return Table2D(x=xs, y=ys, f=F)

    mixture = LteMixture(
        dim=dim, nvel=nvel,
        energy_table=grid2d(thermo_file, 0, 1, 3),
        R_table=grid2d(thermo_file, 0, 1, 6),
        c_table=grid2d(thermo_file, 0, 1, 8),
        T_table=grid2d(e_rev_file, 0, 1, 2),
    )
    transport = LteTransport(
        mu_table=grid2d(trans_file, 0, 1, 2),
        kappa_table=grid2d(trans_file, 0, 1, 3),
        sigma_table=grid2d(trans_file, 0, 1, 4),
    )
    return mixture, transport


@dataclass(frozen=True, eq=False)
class LteTransport:
    """Table transport mu(T,rho), kappa(T,rho), sigma(T,rho)
    (reference: src/lte_transport_properties.cpp)."""

    mu_table: object
    kappa_table: object
    sigma_table: object | None = None

    def flux_properties(self, mixture, U, Up, grad_up, **kw):
        rho = U[..., 0]
        T = Up[..., mixture.i_th]
        mu = _eval2(self.mu_table, T, rho)
        kappa = _eval2(self.kappa_table, T, rho)
        return {
            "visc": mu,
            "bulk_visc": jnp.zeros_like(mu),
            "kappa": kappa,
            "kappa_e": jnp.zeros_like(mu),
            "diff_vel": None,
        }

    def source_properties(self, U, Up, grad_up, efield=None):
        rho = U[..., 0]
        T = Up[..., -1]  # temperature is the last primitive for LTE
        sigma = (
            _eval2(self.sigma_table, T, rho)
            if self.sigma_table is not None
            else jnp.zeros_like(rho)
        )
        return {"sigma": sigma, "mf_freq": None, "diff_vel": None, "n_sp": None}
