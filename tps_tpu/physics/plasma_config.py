"""Build plasma physics models from the ini input.

Parses the reference's input schema ([atoms/*], [species/*],
[plasma_models], [reactions/*] — exemplar test/inputs/argonMinimal.ini)
and constructs the framework's PerfectMixture / transport / Chemistry /
radiation objects with the reference's species-ordering conventions:
input species are reordered to [others..., electron, background].
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

from ..config.ini import IniInput
from .chemistry import Arrhenius, Chemistry, ExternalRate, HoffertLien, TabulatedRate
from .gas_transport import ArgonMinimalTransport
from .perfect_mixture import PerfectMixture
from .radiation import NetEmission
from .tables import LinearTable


@dataclass
class PlasmaSetup:
    mixture: object
    transport: object
    chemistry: object | None
    radiation: object | None
    species_names: list  # mixture-ordered
    input_to_mixture: np.ndarray  # input species index -> mixture index
    initial_mass_fractions: np.ndarray = None  # mixture-ordered
    # baseline chemistry for post-restart model ramping (reference:
    # loMach/reactingFlow/ramp-chem + [reactions_base],
    # src/reactingFlow.cpp:652-682)
    chemistry_base: object | None = None


def _parse_composition(s: str) -> dict:
    """'{Ar : 1, E : -1}' -> {'Ar': 1.0, 'E': -1.0}"""
    out = {}
    for m in re.finditer(r"([A-Za-z0-9_.+\-]+)\s*:\s*([-+0-9.eE]+)", s):
        out[m.group(1)] = float(m.group(2))
    return out


def read_table_input(inp: IniInput, prefix: str):
    """Read a table spec: either an HDF5 file or inline x/f lists."""
    if inp.has(f"{prefix}/filename"):
        fname = inp.get(f"{prefix}/filename")
        import h5py

        with h5py.File(fname, "r") as f:
            data = np.asarray(f["table"])
        x, fv = data[:, 0], data[:, 1]
    else:
        x = np.asarray(inp.get_vec(f"{prefix}/x"))
        fv = np.asarray(inp.get_vec(f"{prefix}/f"))
    return LinearTable(
        x=x,
        f=fv,
        x_log=bool(inp.get(f"{prefix}/x_log", 0)),
        f_log=bool(inp.get(f"{prefix}/f_log", 0)),
    )


def build_plasma(inp: IniInput, dim: int, nvel: int) -> PlasmaSetup:
    # ---- atoms ----
    atoms = {}
    n_atoms = inp.get("atoms/numAtoms", 0)
    for a in range(1, n_atoms + 1):
        name = inp.get_required(f"atoms/atom{a}/name")
        atoms[name] = inp.get_required(f"atoms/atom{a}/mass", float)

    # ---- species (input order) ----
    nsp = inp.get_required("species/numSpecies", int)
    bg_input = inp.get_required("species/background_index", int)  # 1-based
    names, mws, charges, hf, cv, imf, comps, degen = \
        [], [], [], [], [], [], [], []
    for s in range(1, nsp + 1):
        base = f"species/species{s}"
        name = inp.get_required(f"{base}/name")
        comp = _parse_composition(inp.get(f"{base}/composition", "{}"))
        comps.append(comp)
        mw = sum(atoms[a] * c for a, c in comp.items())
        charge = -comp.get("E", 0.0) if name != "E" else -1.0
        names.append(name)
        mws.append(mw)
        charges.append(charge)
        hf.append(inp.get(f"{base}/formation_energy", 0.0))
        cv.append(inp.get(f"{base}/perfect_mixture/constant_molar_cv", 1.5))
        imf.append(inp.get(f"{base}/initialMassFraction", 0.0))
        degen.append(inp.get(f"{base}/level_degeneracy", 1.0))

    # ---- reorder to mixture convention: [others..., E, background] ----
    e_input = names.index("E")
    order = [
        i for i in range(nsp) if i != e_input and i != bg_input - 1
    ] + [e_input, bg_input - 1]
    input_to_mixture = np.empty(nsp, dtype=np.int64)
    for mix_idx, inp_idx in enumerate(order):
        input_to_mixture[inp_idx] = mix_idx

    ambipolar = bool(inp.get("plasma_models/ambipolar", 0))
    two_temp = bool(inp.get("plasma_models/two_temperature", 0))

    mixture = PerfectMixture(
        dim=dim,
        nvel=nvel,
        mw=tuple(mws[i] for i in order),
        charges=tuple(charges[i] for i in order),
        formation_energy=tuple(hf[i] for i in order),
        molar_cv_over_R=tuple(cv[i] for i in order),
        degeneracy=tuple(degen[i] for i in order),
        ambipolar=ambipolar,
        two_temperature=two_temp,
        const_plasma_conductivity=inp.get(
            "plasma_models/const_plasma_conductivity", 0.0
        ),
    )

    # ---- transport ----
    tmodel = inp.get("plasma_models/transport_model", "argon_minimal")
    third_order = bool(
        inp.get(
            "plasma_models/transport_model/argon_minimal/"
            "third_order_thermal_conductivity",
            1,
        )
    )
    if tmodel == "argon_minimal":
        transport = ArgonMinimalTransport(
            mixture=mixture,
            third_order_electron_thermal_conductivity=third_order,
        )
    elif tmodel in ("argon_mixture", "gas_mixture", "mixture"):
        # general per-pair collision-integral transport
        # (reference: GasMixtureTransport, src/gas_transport.cpp:874-1660).
        # Collision types are identified from the atomic COMPOSITION, so
        # lumped excited states (Ar_m/Ar_r/Ar_p) use the ground-state data
        # (reference: identifySpeciesType, src/M2ulPhyS.cpp:3860-3923)
        from .gas_transport import GasMixtureTransport

        def canonical(i):
            c = comps[i]
            heavy = [a for a in c if a != "E"]
            if not heavy:
                return "E"
            atom = heavy[0]
            return f"{atom}.+1" if charges[i] > 0 else atom

        transport = GasMixtureTransport(
            mixture=mixture,
            species_names=tuple(canonical(i) for i in order),
            third_order_electron_thermal_conductivity=third_order,
        )
    elif tmodel == "constant":
        pre = "plasma_models/transport_model/constant"
        if inp.has(f"{pre}/diffusivity/species1"):
            # constant transport WITH species diffusion: per-species
            # diffusivities + momentum-transfer frequencies in INPUT
            # order, reordered to the mixture convention (reference:
            # ConstantTransport ctor, transport_properties.cpp:303-332)
            from .gas_transport import ConstantPlasmaTransport

            diff_in = [inp.get(f"{pre}/diffusivity/species{s + 1}", 0.0)
                       for s in range(nsp)]
            mtf_in = [
                inp.get(
                    f"{pre}/momentum_transfer_frequency/species{s + 1}", 0.0)
                for s in range(nsp)
            ]
            transport = ConstantPlasmaTransport(
                mixture=mixture,
                visc=inp.get(f"{pre}/viscosity", 0.0),
                bulk_visc=inp.get(f"{pre}/bulk_viscosity", 0.0),
                kappa=inp.get(f"{pre}/thermal_conductivity", 0.0),
                kappa_e=inp.get(f"{pre}/electron_thermal_conductivity", 0.0),
                diffusivity=tuple(diff_in[i] for i in order),
                mt_freq=tuple(mtf_in[i] for i in order),
            )
        else:
            from .transport import ConstantTransport

            transport = ConstantTransport(
                visc=inp.get(f"{pre}/viscosity", 0.0),
                bulk_visc=inp.get(f"{pre}/bulk_viscosity", 0.0),
                kappa=inp.get(f"{pre}/thermal_conductivity", 0.0),
                kappa_e=inp.get(f"{pre}/electron_thermal_conductivity", 0.0),
            )
    else:
        raise NotImplementedError(f"transport model '{tmodel}'")

    # ---- reactions ----
    chemistry = None
    chemistry_base = None
    n_react = inp.get("reactions/numberOfReactions",
                      inp.get("reactions/number_of_reactions", 0))
    if n_react > 0:
        r_stoich = np.zeros((n_react, nsp))
        p_stoich = np.zeros((n_react, nsp))

        def parse_model(base, r):
            model = inp.get(f"{base}/model", "arrhenius")
            if model == "arrhenius":
                return Arrhenius(
                    A=inp.get_required(f"{base}/arrhenius/A", float),
                    b=inp.get_required(f"{base}/arrhenius/b", float),
                    E=inp.get_required(f"{base}/arrhenius/E", float),
                )
            if model == "hoffert_lien":
                return HoffertLien(
                    A=inp.get_required(f"{base}/hoffert_lien/A", float),
                    b=inp.get_required(f"{base}/hoffert_lien/b", float),
                    E=inp.get_required(f"{base}/hoffert_lien/E", float),
                )
            if model == "tabulated":
                return TabulatedRate(read_table_input(inp, f"{base}/tabulated"))
            if model == "radiative_decay":
                # (reference: src/reactingFlow.cpp:562-566)
                from .radiative_decay import RadiativeDecay

                iu = int(np.argmax(r_stoich[r - 1]))
                il = int(np.argmax(p_stoich[r - 1]))
                names_mix = [names[i] for i in order]
                return RadiativeDecay(
                    upper=names_mix[iu], lower=names_mix[il],
                    i_upper=iu, i_lower=il,
                    radius=inp.get_required(f"{base}/radius", float),
                )
            if model == "bte":  # external rates via the Boltzmann bus
                return ExternalRate(comp=r - 1)
            raise NotImplementedError(f"reaction model '{model}'")

        models, energies, balances, eq_params = [], [], [], []
        for r in range(1, n_react + 1):
            base = f"reactions/reaction{r}"
            rs = inp.get_vec(f"{base}/reactant_stoichiometry", nsp)
            ps = inp.get_vec(f"{base}/product_stoichiometry", nsp)
            for i in range(nsp):
                r_stoich[r - 1, input_to_mixture[i]] = rs[i]
                p_stoich[r - 1, input_to_mixture[i]] = ps[i]
            energies.append(inp.get(f"{base}/reaction_energy", 0.0))
            models.append(parse_model(base, r))
            db = bool(inp.get(f"{base}/detailed_balance", 0))
            balances.append(db)
            if db:
                eq_params.append(
                    (
                        inp.get_required(f"{base}/equilibrium_constant/A", float),
                        inp.get_required(f"{base}/equilibrium_constant/b", float),
                        inp.get_required(f"{base}/equilibrium_constant/E", float),
                    )
                )
            else:
                eq_params.append((0.0, 0.0, 0.0))
        chemistry = Chemistry(
            mixture=mixture,
            reactant_stoich=r_stoich,
            product_stoich=p_stoich,
            models=tuple(models),
            reaction_energies=tuple(energies),
            detailed_balance=tuple(balances),
            equilibrium_params=tuple(eq_params),
            min_temperature=inp.get("reactions/minimumTemperature", 0.0),
        )

        # baseline chemistry for ramp-chem: SAME reactions/stoichiometry,
        # models (and optionally energies) from [reactions_base/reactionN]
        # (reference: src/reactingFlow.cpp:658-682; the reference supports
        # tabulated baselines only — any model is accepted here)
        if inp.get("loMach/reactingFlow/ramp-chem", 0):
            models_b, energies_b = [], []
            for r in range(1, n_react + 1):
                base_b = f"reactions_base/reaction{r}"
                models_b.append(parse_model(base_b, r))
                energies_b.append(
                    inp.get(f"{base_b}/reaction_energy", energies[r - 1]))
            chemistry_base = Chemistry(
                mixture=mixture,
                reactant_stoich=r_stoich,
                product_stoich=p_stoich,
                models=tuple(models_b),
                reaction_energies=tuple(energies_b),
                detailed_balance=tuple(balances),
                equilibrium_params=tuple(eq_params),
                min_temperature=inp.get("reactions/minimumTemperature", 0.0),
            )

    # ---- radiation ----
    radiation = None
    rmodel = inp.get("plasma_models/radiation_model", "none")
    if rmodel == "net_emission":
        radiation = NetEmission(
            read_table_input(
                inp, "plasma_models/radiation_model/net_emission/tabulated"
            )
        )
    elif rmodel not in ("none", "n/a"):
        raise NotImplementedError(f"radiation model '{rmodel}'")

    return PlasmaSetup(
        mixture=mixture,
        transport=transport,
        chemistry=chemistry,
        radiation=radiation,
        species_names=[names[i] for i in order],
        input_to_mixture=input_to_mixture,
        initial_mass_fractions=np.array([imf[i] for i in order]),
        chemistry_base=chemistry_base,
    )
