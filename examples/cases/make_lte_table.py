#!/usr/bin/env python3
"""Generate a simple argon LTE property table (T_mu_kap_sig_R_Cp) for the
torch example. Replace with tabulated equilibrium data for production."""
import h5py
import numpy as np

T = np.linspace(200.0, 25000.0, 500)
mu = 1.8e-5 * (T / 300.0) ** 0.7
kap = 0.016 * (T / 300.0) ** 0.8
sig = np.where(T > 6000.0, 8000.0 * (T - 6000.0) / 19000.0, 0.0)
R = np.full_like(T, 208.13)  # argon
Cp = np.full_like(T, 520.3)
with h5py.File("examples/cases/lte_table.h5", "w") as f:
    f["T_mu_kap_sig_R_Cp"] = np.stack([T, mu, kap, sig, R, Cp], axis=1)
print("wrote examples/cases/lte_table.h5")
