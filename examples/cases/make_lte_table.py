#!/usr/bin/env python3
"""Generate simple argon LTE property tables for the torch example:
lte_table.h5 (T_mu_kap_sig_R_Cp) and nec_table.h5 (net-emission
radiation coefficient). Replace with tabulated equilibrium data for
production."""
import h5py
import numpy as np

T = np.linspace(200.0, 30000.0, 600)
mu = 1.8e-5 * (T / 300.0) ** 0.7
kap = 0.016 * (T / 300.0) ** 0.8
sig = np.where(T > 6000.0, 8000.0 * (T - 6000.0) / 19000.0, 0.0)
R = np.full_like(T, 208.13)  # argon
Cp = np.full_like(T, 520.3)
with h5py.File("examples/cases/lte_table.h5", "w") as f:
    f["T_mu_kap_sig_R_Cp"] = np.stack([T, mu, kap, sig, R, Cp], axis=1)
print("wrote examples/cases/lte_table.h5")

# net-emission coefficient NEC(T) [W/m^3/sr]: optically-thin argon-like
# curve, zero below ~9 kK, steeply rising so radiation balances the coil
# input and caps the core temperature
nec = np.where(T > 9000.0, 1.6e8 * ((T - 9000.0) / 11000.0) ** 3, 0.0)
with h5py.File("examples/cases/nec_table.h5", "w") as f:
    f["table"] = np.stack([T, nec], axis=1)
print("wrote examples/cases/nec_table.h5")
