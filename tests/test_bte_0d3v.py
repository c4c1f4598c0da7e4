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


def test_shipped_argon_lxcat_swarm_parameters():
    """The shipped LXCat argon set (tps_tpu/data/argon_lxcat.txt:
    momentum transfer + 4s/4p excitations + ionization) reproduces
    published argon swarm benchmarks (Phelps/BOLSIG+-class values;
    the data is an approximation of the Phelps set, so the bands are
    deliberately generous but order-of-magnitude tight):

      - drift velocity w(1 Td) ~ 2.3e3 m/s
      - mean energy at 1 Td is eV-scale (Ramsauer: argon runs hot)
      - Townsend alpha/N rises steeply and reaches ~1e-19 m^2 by 500 Td
      - thermal limit: EEDF relaxes to the gas Maxwellian at E/N -> 0
    """
    import jax.numpy as jnp

    from tps_tpu.interop.bte_0d3v import (
        KB_EV,
        BoltzmannSolver0D3V,
        argon_cross_sections,
    )

    cs = argon_cross_sections()
    assert cs.momentum.table.shape[0] > 20
    kinds = [p.kind for p in cs.processes]
    assert kinds.count("EXCITATION") == 2 and kinds.count("IONIZATION") == 1
    assert abs(cs.mass_ratio - 1.373e-5) < 1e-7

    # thermal limit on a grid resolving kT (de << kT_gas; a 1-eV gas
    # keeps the elastic relaxation pseudo-time reachable — the cooling
    # rate scales with m/M ~ 1.4e-5)
    Tg = 11604.5  # 1 eV
    bte_th = BoltzmannSolver0D3V(n_energy=96, eps_max=8.0, n_steps=3000,
                                 dtau=50.0, cross_sections=cs)
    f0 = bte_th.solve_eedf(jnp.asarray([0.01]), jnp.asarray([Tg]))
    me = float(bte_th.coefficients(f0)["mean_energy"][0])
    assert abs(me - 1.5 * KB_EV * Tg) / (1.5 * KB_EV * Tg) < 0.2, me

    # swarm sweep
    bte = BoltzmannSolver0D3V(n_energy=192, eps_max=80.0, n_steps=1200,
                              dtau=1.0, cross_sections=cs)
    EoN = np.array([1.0, 10.0, 100.0, 300.0, 500.0])
    f0 = bte.solve_eedf(jnp.asarray(EoN), jnp.full(len(EoN), 300.0))
    c = bte.coefficients(f0)
    muN = np.asarray(c["mobilityN"])
    kion = np.asarray(c["k_ionization"])
    meane = np.asarray(c["mean_energy"])
    w = muN * EoN * 1e-21  # drift velocity [m/s]
    alphaN = kion / w

    # published w(Ar, 1 Td) ~ 2.3e3 m/s
    assert 1.2e3 < w[0] < 4.5e3, w[0]
    # argon mean energy at 1 Td is eV-scale (2-4 eV)
    assert 1.5 < meane[0] < 4.5, meane[0]
    # mean energy and ionization rate increase monotonically with E/N
    assert (np.diff(meane) > 0).all()
    assert (np.diff(kion) > 0).all()
    # no ionization at 1 Td; strong by 300 Td
    assert kion[0] < 1e-30 and kion[3] > 1e-16
    # Townsend alpha/N order of magnitude (Kruithof-class: ~1e-20 at
    # 100 Td rising toward ~1e-19 by 500 Td)
    assert 1e-21 < alphaN[2] < 1e-19, alphaN[2]
    assert 2e-20 < alphaN[4] < 1e-18, alphaN[4]


def test_bte_rates_from_coupled_em_field():
    """End-to-end: the axisymmetric EM solve fills the Tps2Boltzmann bus
    E-field, the 0D3V solver consumes it and pushes electron temperature,
    mobility and per-reaction rates back (reference flow:
    cycle_avg_joule_coupling push -> tps-bte_0d3v.py -> fetch)."""
    import jax.numpy as jnp

    from tps_tpu.interop.bte_0d3v import BoltzmannSolver0D3V, argon_cross_sections
    from tps_tpu.interop.boltzmann import Tps2Boltzmann
    from tps_tpu.mesh.generators import box_2d
    from tps_tpu.solvers.em.qms import QuasiMagnetostaticSolverAxiSym

    # EM mesh with a coil ring and a conducting column near the axis
    em_mesh = box_2d(10, 10, x0=0.0, x1=0.03, y0=-0.01, y1=0.02)
    cent = em_mesh.vertices[em_mesh.elements].mean(axis=1)
    attrs = np.ones(em_mesh.num_elements, dtype=np.int64)
    ring = (np.abs(cent[:, 0] - 0.018) < 0.004) & (np.abs(cent[:, 1] - 0.005) < 0.004)
    attrs[ring] = 2
    em_mesh.elem_attrs = attrs

    class _Cfg:
        raw = None

        def __init__(self):
            self.raw = self

        def get(self, k, d=None):
            return {"em/current_amplitude": 2e4,
                    "em/current_frequency": 1e5}.get(k, d)

        def get_required(self, k, typ=str):
            raise KeyError(k)

    em = QuasiMagnetostaticSolverAxiSym(_Cfg(), mesh=em_mesh)
    em.initialize()
    sig = np.where(np.asarray(em.tab.xyz)[:, 0] < 0.008, 200.0, 0.0)
    em.set_plasma_conductivity(jnp.asarray(sig))
    em.solve_step()
    E_re, E_im = em.electric_field()
    Eamp = np.asarray(jnp.sqrt(E_re**2 + E_im**2))
    assert Eamp.max() > 0

    # bus: one point per EM node, argon at 1 torr-ish density
    npts = len(Eamp)
    bus = Tps2Boltzmann()
    bus.setup(nspecies=2, nreactions=2, n_efield_comps=2, shape=(npts,))
    # low-pressure argon so the coil's E-field spans an O(10 Td) E/N range
    N = 1.0e18  # m^-3
    bus.setField(bus.ElectricField,
                 np.stack([Eamp, np.zeros(npts)], axis=-1))
    bus.setField(bus.SpeciesDensities,
                 np.stack([np.full(npts, N), np.full(npts, 1e16)], axis=-1))
    bus.setField(bus.HeavyTemperature, np.full((npts, 1), 400.0))

    bte = BoltzmannSolver0D3V(n_energy=96, eps_max=60.0, n_steps=500,
                              dtau=1.5, cross_sections=argon_cross_sections())
    bte.fetch(bus)
    bte.solve()
    bte.push(bus)

    Te = np.asarray(bus.host(bus.ElectronTemperature))[..., 0]
    rates = np.asarray(bus.host(bus.ReactionRates))
    assert np.isfinite(Te).all() and Te.min() > 0
    # electrons are hottest where E/N is largest
    assert Te.max() > Te.min()
    iE = Eamp.argmax()
    assert Te[iE] > np.median(Te)
    assert np.isfinite(rates).all() and rates.max() >= 0


def test_transient_converges_and_conserves():
    """The transient march conserves the EEDF normalization, converges
    cycle-to-cycle, and lands in the same energy range as the steady
    solve (reference transient mode, src/tps-bte_0d3v.py:1622).  The
    quantitative limit check is the high-frequency RMS test below."""
    bte = BoltzmannSolver0D3V(n_energy=96, n_steps=2000, dtau=5.0)
    EoN = np.array([20.0, 80.0])
    Tg = np.array([300.0, 300.0])
    N = np.array([2.5e25, 2.5e25])
    f_dc = bte.solve_eedf(EoN, Tg)
    f_tr, rel = bte.solve_eedf_transient(
        EoN, np.zeros_like(EoN), Tg, 13.56e6, N,
        n_cycles=6, steps_per_cycle=48)
    f_tr = np.asarray(f_tr)
    sqe_w = np.sqrt(bte.eps_c) * bte.de
    z = np.sum(f_tr * sqe_w[None, :], axis=1)
    np.testing.assert_allclose(z, 1.0, rtol=1e-6)
    assert np.all(np.asarray(rel) < 1e-3), np.asarray(rel)
    assert np.all(np.isfinite(f_tr)) and np.all(f_tr >= 0)
    # mean energies of transient (RMS-field-averaged) and DC solves are
    # the same order: within a factor 2
    c_dc = bte.coefficients(np.asarray(f_dc))
    c_tr = bte.coefficients(f_tr)
    r = np.asarray(c_tr["mean_energy"]) / np.asarray(c_dc["mean_energy"])
    assert np.all(r > 0.3) and np.all(r < 1.5), r


def test_transient_high_freq_matches_steady_at_rms():
    """When the RF period is short against the energy-relaxation time the
    cycle-averaged EEDF equals the DC EEDF at the RMS field E0/sqrt(2)
    (heating goes as <E^2>): the classical effective-field limit."""
    bte = BoltzmannSolver0D3V(n_energy=96, n_steps=3000, dtau=5.0)
    E0 = np.array([60.0])
    Tg = np.array([300.0])
    N = np.array([2.5e25])
    # energy relaxation rate ~ 2 (m/M) nu_m ~ 1e7/s at 1 atm; run at
    # 1 GHz >> that
    f_tr, rel = bte.solve_eedf_transient(
        E0, np.zeros(1), Tg, 1.0e9, N, n_cycles=16, steps_per_cycle=32)
    f_rms = bte.solve_eedf(E0 / np.sqrt(2.0), Tg)
    c_tr = bte.coefficients(np.asarray(f_tr))
    c_rms = bte.coefficients(np.asarray(f_rms))
    e_tr = float(c_tr["mean_energy"][0])
    e_rms = float(c_rms["mean_energy"][0])
    assert abs(e_tr - e_rms) / e_rms < 0.08, (e_tr, e_rms)


def test_transient_driver_protocol():
    """solver_type='transient' flows through the fetch/solve/push bus
    protocol and produces finite coefficients."""
    class FakeBus:
        ElectricField = 0
        SpeciesDensities = 1
        HeavyTemperature = 2
        ElectronTemperature = 3
        ElectronMobility = 4
        ReactionRates = 5

        def __init__(self, n):
            rng = np.random.default_rng(0)
            self.data = {
                self.ElectricField: 2000.0 + 500 * rng.random((n, 2)),
                self.SpeciesDensities: np.full((n, 2), 1.2e25),
                self.HeavyTemperature: np.full((n, 1), 300.0),
            }
            self.out = {}

        def host(self, idx):
            return self.data[idx]

        def nComponents(self, idx):
            return 2

        def setField(self, idx, arr):
            self.out[idx] = np.asarray(arr)

    bus = FakeBus(5)
    bte = BoltzmannSolver0D3V(n_energy=64, solver_type="transient",
                              e_freq=6.0e6, bte_cycles=4,
                              bte_steps_per_cycle=24)
    bte.fetch(bus)
    bte.solve()
    bte.push(bus)
    assert np.all(np.isfinite(bus.out[bus.ElectronTemperature]))
    assert np.all(bus.out[bus.ElectronMobility] > 0)
    assert np.all(np.isfinite(bus.out[bus.ReactionRates]))
    assert np.all(np.isfinite(np.asarray(bte._rel_cycle_change)))


def test_per_reaction_rate_mapping():
    """Every bus ReactionRates component whose equation is an
    electron-impact process gets its own BTE rate, derived from the
    reaction equation strings (role of the reference's bus write-back
    index map TPSINDEX.RR_IDX, src/tps-bte_0d3v.py:147): ionization and
    each excitation channel carry distinct rates; recombination (not an
    e-impact process the 0d3v solver rates) stays zero."""
    import jax.numpy as jnp

    from tps_tpu.interop.boltzmann import Tps2Boltzmann
    from tps_tpu.interop.bte_0d3v import (
        BoltzmannSolver0D3V,
        argon_cross_sections,
    )

    eqs = ["Ar + E => Ar.+1 + 2 E",      # ionization
           "Ar + E => Ar_m + E",         # excitation channel 1
           "Ar + E => Ar_p + E",         # excitation channel 2
           "Ar.+1 + 2 E => Ar + E"]      # 3-body recombination: no rate

    class Bus(Tps2Boltzmann):
        def getReactionEquation(self, r):
            return eqs[r]

    npts = 4
    bus = Bus()
    bus.setup(nspecies=3, nreactions=4, n_efield_comps=2, shape=(npts,))
    bus.setField(bus.ElectricField, jnp.full((npts, 2), 4.0e4))
    bus.setField(bus.SpeciesDensities, jnp.full((npts, 3), 1.0e24))
    bus.setField(bus.HeavyTemperature, jnp.full((npts, 1), 500.0))

    bte = BoltzmannSolver0D3V(n_steps=300,
                              cross_sections=argon_cross_sections())
    bte.fetch(bus)
    bte.solve()
    bte.push(bus)
    rates = np.asarray(bus.host(bus.ReactionRates))
    assert rates.shape == (npts, 4)
    assert np.isfinite(rates).all() and (rates >= 0).all()
    assert rates[:, 0].max() > 0          # ionization rated
    assert rates[:, 1].max() > 0          # first excitation rated
    assert rates[:, 2].max() > 0          # second excitation rated
    # distinct channels, not copies of one another (atol=0: the rates are
    # ~1e-17 m^3/s, far below allclose's default absolute tolerance)
    assert not np.allclose(rates[:, 1], rates[:, 2], rtol=1e-3, atol=0.0)
    assert not np.allclose(rates[:, 0], rates[:, 1], rtol=1e-3, atol=0.0)
    assert np.all(rates[:, 3] == 0.0)     # recombination left to chemistry

    # explicit reaction_map override (the reference's hand-set RR_IDX)
    bte2 = BoltzmannSolver0D3V(n_steps=300,
                               cross_sections=argon_cross_sections(),
                               reaction_map=("excitation", None))
    bus2 = Bus()
    bus2.setup(nspecies=3, nreactions=2, n_efield_comps=2, shape=(npts,))
    bus2.setField(bus2.ElectricField, jnp.full((npts, 2), 4.0e4))
    bus2.setField(bus2.SpeciesDensities, jnp.full((npts, 3), 1.0e24))
    bus2.setField(bus2.HeavyTemperature, jnp.full((npts, 1), 500.0))
    bte2.fetch(bus2)
    bte2.solve()
    bte2.push(bus2)
    r2 = np.asarray(bus2.host(bus2.ReactionRates))
    assert np.allclose(r2[:, 0], rates[:, 1], rtol=1e-12, atol=0.0)
    assert np.all(r2[:, 1] == 0.0)


def test_ee_collisions_landau_structure():
    """Electron-electron Coulomb collisions (reference: boltzmannSolver/
    ee_collisions, src/tps-bte_0d3v.py:96).  The antisymmetric discrete
    Landau form must conserve density exactly, approximately conserve
    energy through the Picard-lagged transient, and relax a bimodal EEDF
    to a Maxwellian (exactly stationary discrete exponential)."""
    import jax
    import jax.numpy as jnp

    from tps_tpu.interop.bte_0d3v import (
        BoltzmannSolver0D3V,
        argon_cross_sections,
    )

    bte = BoltzmannSolver0D3V(n_energy=128, eps_max=12.0,
                              cross_sections=argon_cross_sections(),
                              ee_collisions=True, ion_deg=1e-2)
    eps_c = np.asarray(bte.eps_c)
    de = bte.de
    epsf = np.asarray(bte.eps[1:-1])
    sqer = np.sqrt(eps_c)
    sqe_w = sqer * de
    F = np.exp(-eps_c / 0.5) + 0.3 * np.exp(-((eps_c - 6.0) / 0.8) ** 2)
    F /= np.sum(F * sqe_w)
    mean0 = np.sum(eps_c * F * sqe_w)
    aee = jnp.asarray(np.asarray(bte._ee_coeff(1e-2)))
    f = jnp.asarray(F[None, :])
    zero = jnp.zeros((1, 1))
    rs = 1.0 / jnp.asarray(sqer)[None, :]
    for _ in range(3000):
        W, D = bte._ee_face_coeffs(f, aee, jnp.asarray(eps_c),
                                   jnp.asarray(epsf), jnp.asarray(sqer),
                                   de)
        a2 = -0.5 * W + D / de
        b2 = -0.5 * W - D / de
        lo = jnp.concatenate([zero, a2], axis=1) / de
        up = jnp.concatenate([-b2, zero], axis=1) / de
        dg = (jnp.concatenate([zero, b2], axis=1)
              - jnp.concatenate([a2, zero], axis=1)) / de
        f = jax.lax.linalg.tridiagonal_solve(
            -rs * lo, 1.0 - rs * dg, -rs * up, f[..., None])[..., 0]
    Fn = np.asarray(f)[0]
    dens = np.sum(Fn * sqe_w)
    mean = np.sum(eps_c * Fn * sqe_w) / dens
    assert abs(dens - 1.0) < 1e-10           # exact density conservation
    assert abs(mean - mean0) / mean0 < 0.05  # near-conservative transient
    sel = Fn > 1e-10
    x, y = eps_c[sel], np.log(Fn[sel])
    A = np.vstack([x, np.ones_like(x)]).T
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    assert np.sqrt(np.mean((y - A @ coef) ** 2)) < 0.01  # Maxwellian
    assert coef[0] < 0


def test_ee_collisions_maxwellianize_under_field():
    """At high ionization degree the field-driven EEDF approaches a
    Maxwellian (the physical effect ee_collisions exists to capture);
    at ion_deg = 0 the operator is off and the non-Maxwellian inelastic
    cutoff shape is preserved."""
    import jax.numpy as jnp

    from tps_tpu.interop.bte_0d3v import (
        BoltzmannSolver0D3V,
        argon_cross_sections,
    )

    def lnf_rms(ion):
        b = BoltzmannSolver0D3V(n_energy=128, eps_max=40.0, n_steps=2500,
                                dtau=1.0,
                                cross_sections=argon_cross_sections(),
                                ee_collisions=ion > 0, ion_deg=ion)
        f = np.asarray(b.solve_eedf(jnp.asarray([30.0]),
                                    jnp.asarray([400.0])))[0]
        eps = np.asarray(b.eps_c)
        sel = (f > 1e-12) & (eps < 25.0)
        x, y = eps[sel], np.log(f[sel])
        A = np.vstack([x, np.ones_like(x)]).T
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        return float(np.sqrt(np.mean((y - A @ coef) ** 2)))

    r_off, r_on = lnf_rms(0.0), lnf_rms(1e-2)
    assert r_on < 0.3 * r_off, (r_off, r_on)


def test_ee_collisions_bus_driven():
    """Driver protocol with ee_collisions: ionization degree comes from
    the bus electron density (electron_index)."""
    import jax.numpy as jnp

    from tps_tpu.interop.boltzmann import Tps2Boltzmann
    from tps_tpu.interop.bte_0d3v import (
        BoltzmannSolver0D3V,
        argon_cross_sections,
    )

    npts = 3
    bus = Tps2Boltzmann()
    bus.setup(nspecies=3, nreactions=1, n_efield_comps=2, shape=(npts,))
    bus.setField(bus.ElectricField, jnp.full((npts, 2), 2.0e4))
    n_sp = np.full((npts, 3), 1.0e24)
    n_sp[:, 1] = 1.0e22  # electrons: ion_deg ~ 5e-3
    bus.setField(bus.SpeciesDensities, jnp.asarray(n_sp))
    bus.setField(bus.HeavyTemperature, jnp.full((npts, 1), 500.0))
    bte = BoltzmannSolver0D3V(n_steps=400,
                              cross_sections=argon_cross_sections(),
                              ee_collisions=True, electron_index=1)
    bte.fetch(bus)
    bte.solve()
    bte.push(bus)
    Te = np.asarray(bus.host(bus.ElectronTemperature))
    assert np.isfinite(Te).all() and (Te > 0).all()
    rates = np.asarray(bus.host(bus.ReactionRates))
    assert np.isfinite(rates).all() and (rates >= 0).all()


def test_electron_diffusion_einstein_relation():
    """The free-diffusion coefficient D*N fills the bus ElectronDiffusion
    slot (reference Index taxonomy, src/tps2Boltzmann.hpp:70-86); at the
    thermal limit the Einstein relation D/mu = kT holds."""
    import jax.numpy as jnp

    from tps_tpu.interop.boltzmann import Tps2Boltzmann

    import jax.numpy as jnp2

    bte = BoltzmannSolver0D3V(n_energy=96, eps_max=8.0)
    T = 1.0  # eV
    eps = np.asarray(bte.eps_c)
    F = np.exp(-eps / T)
    F /= np.sum(F * np.sqrt(eps) * bte.de)
    c = bte.coefficients(jnp2.asarray(F[None, :]))
    ratio = float(c["diffusionN"][0] / c["mobilityN"][0])  # [V]
    # exact for a Maxwellian up to the finite-domain truncation
    assert abs(ratio - T) / T < 0.05, ratio

    bus = Tps2Boltzmann()
    npts = 3
    bus.setup(nspecies=2, nreactions=1, n_efield_comps=2, shape=(npts,))
    bus.setField(bus.ElectricField, jnp.full((npts, 2), 2.0e4))
    bus.setField(bus.SpeciesDensities, jnp.full((npts, 2), 1.0e24))
    bus.setField(bus.HeavyTemperature, jnp.full((npts, 1), 400.0))
    b2 = BoltzmannSolver0D3V(n_steps=300)
    b2.fetch(bus)
    b2.solve()
    b2.push(bus)
    D = np.asarray(bus.host(bus.ElectronDiffusion))
    assert D.shape == (npts, 1) and np.isfinite(D).all() and (D > 0).all()


def test_multiterm_three_term_closure():
    """l_max = 2 three-term closure (reference: boltzmannSolver/l_max,
    src/tps-bte_0d3v.py:250): negligible correction where the two-term
    closure is accurate (low/moderate E/N), a bounded NEGATIVE correction
    to mean energy and ionization at high E/N (two-term overestimates
    when the anisotropy is strong), monotone E/N trends preserved, and
    the unsupported l_max >= 3 sweep refused."""
    import jax.numpy as jnp
    import pytest

    from tps_tpu.interop.bte_0d3v import (
        BoltzmannSolver0D3V,
        argon_cross_sections,
    )

    cs = argon_cross_sections()
    EoN = np.array([30.0, 100.0, 300.0, 500.0])
    out = {}
    for L in (1, 2):
        b = BoltzmannSolver0D3V(n_energy=160, eps_max=80.0, n_steps=2500,
                                dtau=1.0, cross_sections=cs, l_max=L)
        f = b.solve_eedf(jnp.asarray(EoN), jnp.full(len(EoN), 300.0))
        c = b.coefficients(f)
        out[L] = (np.asarray(c["mean_energy"]),
                  np.asarray(c["k_ionization"]))
    dm = (out[2][0] - out[1][0]) / out[1][0]
    dk = (out[2][1] - out[1][1]) / out[1][1]
    assert abs(dm[0]) < 0.05 and abs(dk[0]) < 0.10   # 30 Td: tiny
    assert -0.30 < dm[3] < -0.005                     # 500 Td: negative,
    assert -0.45 < dk[3] < -0.01                      # bounded
    assert (np.diff(out[2][0]) > 0).all()             # heating monotone
    assert (np.diff(out[2][1]) > 0).all()
    with pytest.raises(ValueError):  # Picard sweep refuses l >= 3
        BoltzmannSolver0D3V(l_max=3, multiterm_closure="picard")


def test_multiterm_coupled_block_solve():
    """Coupled block-tridiagonal closure of the full spherical-harmonic
    hierarchy (any l_max — the analog of the reference's multi-term
    B-spline machinery, src/tps-bte_0d3v.py l_max): (a) at l_max = 1 the
    implicit F_1 coupling must reproduce the two-term solution to
    discretization error; (b) l_max = 3 and 5 (even term counts, the
    well-posed truncations) stay finite and mutually consistent across
    E/N; (c) monotone E/N trends hold."""
    import jax.numpy as jnp

    from tps_tpu.interop.bte_0d3v import (
        BoltzmannSolver0D3V,
        argon_cross_sections,
    )

    cs = argon_cross_sections()
    EoN = np.array([30.0, 100.0, 300.0])
    out = {}
    for L, mode in [(1, "picard"), (1, "coupled"), (3, "coupled"),
                    (5, "coupled")]:
        b = BoltzmannSolver0D3V(n_energy=128, eps_max=90.0, n_steps=1500,
                                dtau=1.0, cross_sections=cs, l_max=L,
                                multiterm_closure=mode)
        f = b.solve_eedf(jnp.asarray(EoN), jnp.full(len(EoN), 300.0))
        c = b.coefficients(f)
        out[(L, mode)] = (np.asarray(c["mean_energy"]),
                          np.asarray(c["k_ionization"]))
    # (a) two-term recovery at L=1
    ref = out[(1, "picard")]
    got = out[(1, "coupled")]
    assert np.allclose(got[0], ref[0], rtol=2e-2)
    assert np.allclose(got[1], ref[1], rtol=5e-2)
    # (b) higher truncations: finite, bounded correction, L3 ~ L5
    for key in [(3, "coupled"), (5, "coupled")]:
        m, k = out[key]
        assert np.isfinite(m).all() and np.isfinite(k).all()
        assert (np.abs(m / ref[0] - 1.0) < 0.25).all()
    assert np.allclose(out[(3, "coupled")][0], out[(5, "coupled")][0],
                       rtol=0.10)
    # (c) monotone heating/ionization in E/N
    assert (np.diff(out[(3, "coupled")][0]) > 0).all()
    assert (np.diff(out[(3, "coupled")][1]) > 0).all()
    # (d) the transient (RF cycle-averaged) path runs the coupled
    # closure too: finite EEDF, converging cycle monitor
    b = BoltzmannSolver0D3V(n_energy=64, eps_max=60.0, cross_sections=cs,
                            l_max=3, multiterm_closure="coupled")
    f_avg, rel = b.solve_eedf_transient(
        jnp.asarray([200.0]), jnp.asarray([0.0]), jnp.asarray([300.0]),
        13.56e6, jnp.asarray([3e24]), n_cycles=3, steps_per_cycle=16)
    assert np.isfinite(np.asarray(f_avg)).all()
    assert float(rel[0]) < 0.5


def test_multiterm_coupled_constant_sigma_cooling():
    """Constant-cross-section limit: a plane-wave analysis of the
    hierarchy (F_l ~ e^{ik eps}, sigma~ const) shows every even-term
    truncation REDUCES the effective field diffusion relative to
    two-term — the multi-term mean energy must come out at or below the
    two-term value (and within a few % of it at these fields)."""
    import jax.numpy as jnp

    from tps_tpu.interop.bte_0d3v import (
        BoltzmannSolver0D3V,
        CrossSection,
        CrossSectionSet,
    )

    tab = np.array([[0.0, 1e-20], [1000.0, 1e-20]])
    mom = CrossSection(kind="ELASTIC", species="X", threshold=0.0,
                       mass_ratio=0.01, table=tab)
    cs = CrossSectionSet(momentum=mom, processes=())
    means = {}
    for L, mode in [(1, "picard"), (3, "coupled")]:
        b = BoltzmannSolver0D3V(n_energy=192, eps_max=40.0, n_steps=2500,
                                dtau=1.0, cross_sections=cs, l_max=L,
                                multiterm_closure=mode, reg_width=0.1)
        f = b.solve_eedf(jnp.asarray([10.0]), jnp.asarray([300.0]))
        means[L] = float(b.coefficients(f)["mean_energy"][0])
    assert means[3] <= means[1] * 1.001
    assert means[3] > means[1] * 0.93
