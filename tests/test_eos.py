"""DryAir EOS consistency (analog of reference test/test_perfect_mixture.cpp
for the dry-air subset)."""

import jax.numpy as jnp
import numpy as np

from tps_tpu.physics.gas import DryAir


def test_dryair_roundtrip():
    mix = DryAir(dim=3, nvel=3)
    rng = np.random.RandomState(0)
    Up = jnp.asarray(
        np.stack(
            [
                1.0 + rng.rand(100),  # rho
                10 * rng.randn(100),
                10 * rng.randn(100),
                10 * rng.randn(100),
                250.0 + 100 * rng.rand(100),  # T
            ],
            axis=-1,
        )
    )
    U = mix.conservatives(Up)
    Up2 = mix.primitives(U)
    assert float(jnp.abs(Up - Up2).max()) < 1e-10


def test_dryair_pressure_temperature():
    mix = DryAir(dim=2, nvel=2)
    rho, u, v, T = 1.2, 30.0, -10.0, 350.0
    Up = jnp.array([[rho, u, v, T]])
    U = mix.conservatives(Up)
    p = float(mix.pressure(U)[0])
    assert abs(p - rho * mix.gas_constant * T) < 1e-8
    assert abs(float(mix.temperature(U)[0]) - T) < 1e-10
    assert abs(float(mix.pressure_from_primitives(Up)[0]) - p) < 1e-8


def test_dryair_max_char_speed():
    mix = DryAir(dim=2, nvel=2)
    rho, u, v, T = 1.0, 100.0, 0.0, 300.0
    Up = jnp.array([[rho, u, v, T]])
    U = mix.conservatives(Up)
    c = np.sqrt(mix.specific_heat_ratio * mix.gas_constant * T)
    assert abs(float(mix.max_char_speed(U)[0]) - (100.0 + c)) < 1e-8


def test_total_energy_consistency():
    mix = DryAir(dim=3, nvel=3)
    rho, T = 0.8, 500.0
    vel = jnp.array([[10.0, 20.0, -5.0]])
    rhoE = mix.total_energy(jnp.array([rho]), vel, jnp.array([T]))
    U = jnp.concatenate([jnp.array([[rho]]), rho * vel, rhoE[:, None]], axis=-1)
    assert abs(float(mix.temperature(U)[0]) - T) < 1e-10
