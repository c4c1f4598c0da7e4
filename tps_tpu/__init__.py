"""tps_tpu: a TPU-native plasma & compressible-flow simulation framework.

From-scratch JAX/XLA/Pallas re-design of the capabilities of pecos/tps
(see SURVEY.md): nodal-DG compressible reacting Navier-Stokes, low-Mach
solver family, quasimagnetostatic EM + coupling, plasma physics models,
restart/statistics/interop services — on element-batched tensors with
shard_map domain decomposition.
"""

__version__ = "0.1.0"

from .harness import Tps, main  # noqa: F401
