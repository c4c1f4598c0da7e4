"""Two-term 0D3V electron Boltzmann solver (reference: src/tps-bte_0d3v.py
role; physics per Hagelaar & Pitchford 2005)."""

import numpy as np

from tps_tpu.interop.bte_0d3v import KB_EV, BoltzmannSolver0D3V


def test_zero_field_relaxes_to_gas_maxwellian():
    """With E/N -> 0 the EEDF relaxes toward a Maxwellian at T_gas: the mean
    energy approaches (3/2) kT_g."""
    bte = BoltzmannSolver0D3V(n_energy=96, eps_max=8.0, n_steps=3000,
                              dtau=50.0)
    Tg = 11604.5  # 1 eV gas temperature (exaggerated, for resolution)
    f0 = bte.solve_eedf(np.array([0.01]), np.array([Tg]))
    c = bte.coefficients(f0)
    mean_e = float(c["mean_energy"][0])
    assert abs(mean_e - 1.5 * KB_EV * Tg) / (1.5 * KB_EV * Tg) < 0.15, mean_e


def test_field_heating_monotone():
    """Mean electron energy and ionization rate increase with E/N; all
    outputs finite and positive; batched over points."""
    bte = BoltzmannSolver0D3V()
    EoN = np.array([1.0, 10.0, 50.0, 200.0])  # Td
    Tg = np.full(4, 300.0)
    f0 = bte.solve_eedf(EoN, Tg)
    assert np.isfinite(np.asarray(f0)).all()
    c = bte.coefficients(f0)
    me = np.asarray(c["mean_energy"])
    assert (np.diff(me) > 0).all(), me
    ki = np.asarray(c["k_ionization"])
    assert (np.diff(ki) >= 0).all()
    assert ki[0] < 1e-20  # negligible ionization at 1 Td
    assert ki[-1] > 1e-17  # strong ionization at 200 Td
    assert (np.asarray(c["mobilityN"]) > 0).all()


def test_mobility_magnitude():
    """Ar reduced mobility at moderate fields is O(1e24-1e25) 1/(m V s)
    (BOLSIG+ with standard cross sections gives ~(2-8)e24)."""
    bte = BoltzmannSolver0D3V()
    f0 = bte.solve_eedf(np.array([30.0]), np.array([300.0]))
    muN = float(bte.coefficients(f0)["mobilityN"][0])
    assert 1e23 < muN < 1e26, muN


def test_interface_roundtrip():
    """fetch -> solve -> push through the Tps2Boltzmann bus."""
    import jax.numpy as jnp

    from tps_tpu.interop.boltzmann import Tps2Boltzmann

    iface = Tps2Boltzmann()
    npts = 6
    iface.setup(nspecies=3, nreactions=2, n_efield_comps=2, shape=(npts,))
    iface.setField(iface.ElectricField,
                   jnp.full((npts, 2), 3.0e4))  # V/m
    iface.setField(iface.SpeciesDensities,
                   jnp.full((npts, 3), 1.0e24))  # 1/m^3
    iface.setField(iface.HeavyTemperature, jnp.full((npts, 1), 500.0))

    bte = BoltzmannSolver0D3V(n_steps=200)
    bte.fetch(iface)
    bte.solve()
    bte.push(iface)
    Te = np.asarray(iface.host(iface.ElectronTemperature))
    assert Te.shape == (npts, 1)
    assert (Te > 500.0).all()  # field-heated above the gas
    rates = np.asarray(iface.host(iface.ReactionRates))
    assert rates.shape == (npts, 2)
    assert np.isfinite(rates).all() and (rates >= 0).all()


def test_lxcat_cross_section_input(tmp_path):
    """Tabulated cross-section input path (LXCat text format — the
    community-standard data the reference's Boltzmann stack consumes):
    parse, drive the two-term solver, and check the physics trends."""
    import numpy as np

    from tps_tpu.interop.bte_0d3v import (
        BoltzmannSolver0D3V,
        read_lxcat,
    )

    lx = tmp_path / "ar.txt"
    lx.write_text("""\
Some free-text header describing the database.

ELASTIC
Ar
 1.360e-5
SPECIES: e / Ar
COMMENT: momentum transfer
-----------------------------
 0.000  7.0e-20
 0.100  4.0e-21
 0.230  1.2e-21
 0.500  2.5e-21
 1.000  1.4e-20
 3.000  4.0e-20
 10.00  1.5e-19
 15.00  1.4e-19
 30.00  8.0e-20
 60.00  4.0e-20
-----------------------------

EXCITATION
Ar -> Ar*(4s)
 1.155e+1
-----------------------------
 11.55  0.0
 13.00  2.0e-22
 16.00  8.0e-22
 20.00  1.4e-21
 30.00  1.6e-21
 60.00  1.0e-21
-----------------------------

IONIZATION
Ar -> Ar^+
 1.576e+1
-----------------------------
 15.76  0.0
 18.00  3.0e-21
 25.00  1.2e-20
 40.00  2.3e-20
 60.00  2.7e-20
-----------------------------
""")
    cs = read_lxcat(str(lx))
    assert cs.momentum.kind == "ELASTIC"
    assert abs(cs.mass_ratio - 1.36e-5) < 1e-9
    assert len(cs.processes) == 2
    assert cs.processes[1].threshold == 15.76

    solver = BoltzmannSolver0D3V(n_energy=96, eps_max=60.0,
                                 cross_sections=cs)
    EoN = np.array([1.0, 10.0, 100.0])  # Td
    Tg = np.array([300.0, 300.0, 300.0])
    f0 = solver.solve_eedf(EoN, Tg)
    c = solver.coefficients(f0)
    me = np.asarray(c["mean_energy"])
    assert np.all(np.isfinite(me)) and np.all(me > 0)
    assert me[2] > me[1] > me[0]  # heating with E/N
    k_ion = np.asarray(c["k_ionization"])
    assert k_ion[2] > 1e3 * max(k_ion[0], 1e-40)  # ionization switches on
    # rates are per-process too
    assert "k_excitation" in c
    assert np.all(np.asarray(c["mobilityN"]) > 0)
