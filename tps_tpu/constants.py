"""Physical constants shared across the framework.

Values mirror the reference TPS constants (reference:
src/equation_of_state.hpp:55-67) so that physics results are directly
comparable.
"""

UNIVERSAL_GAS_CONSTANT = 8.3144598  # J mol^-1 K^-1
AVOGADRO_NUMBER = 6.0221409e23  # mol^-1
BOLTZMANN_CONSTANT = UNIVERSAL_GAS_CONSTANT / AVOGADRO_NUMBER
PLANCK_CONSTANT = 6.62607015e-34  # m^2 kg / s
VACUUM_PERMITTIVITY = 8.8541878128e-12
ELECTRON_CHARGE = 1.60218e-19
MOLAR_ELECTRON_CHARGE = ELECTRON_CHARGE * AVOGADRO_NUMBER
ELECTRON_MASS = 9.1093837015e-31  # kg
QE_OVER_KB = ELECTRON_CHARGE / BOLTZMANN_CONSTANT

IONIZATION_ENERGY_ARGON_EV = 15.7596119  # eV

PI = 3.14159265358979323846

# Dry air defaults (reference: src/equation_of_state.cpp:175-179)
DRY_AIR_GAS_CONSTANT = 287.058  # J kg^-1 K^-1
DRY_AIR_GAMMA = 1.4
